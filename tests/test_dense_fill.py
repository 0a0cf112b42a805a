"""Dense fill engine tests.

Ports the semantics of the reference's test_datastructures/test_denseskop.cc:
moments, submatrix consistency, fill-order autotranspose, next_state
chaining — plus cross-checks against the serial numpy oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import (
    DenseDist, DenseDistName, DenseSkOp, MajorAxis, RNGState,
    fill_dense, fill_dense_submat,
)
from randblas_tpu.dense import compute_next_state, dist_to_layout
from randblas_tpu.base import Layout

from oracle import fill_rowmajor_oracle

KEYS = [0, 1, 42]


def _np_state(key):
    return [np.uint32(0)] * 4, [np.uint32(key), np.uint32(0)]


# ---------------------------------------------------------------------------
# oracle cross-checks of the raw row-major fill
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("family", ["gaussian", "uniform"])
@pytest.mark.parametrize("shape,ptr,parent_cols", [
    ((3, 7), 0, 7),      # aligned start, pad 1
    ((4, 8), 0, 8),      # fully aligned
    ((2, 5), 3, 11),     # misaligned ptr
    ((5, 3), 13, 9),     # misaligned, small cols
    ((1, 1), 6, 7),      # single element
    ((3, 2), 10, 5),     # ptr crossing rows of parent
])
def test_fill_rowmajor_vs_oracle(family, shape, ptr, parent_cols):
    from randblas_tpu.ops.dense_fill import fill_rowmajor
    n_srows, n_scols = shape
    state = RNGState.from_key(99)
    transform = "boxmul" if family == "gaussian" else "uneg11"
    got = np.asarray(
        fill_rowmajor(parent_cols, n_srows, n_scols, ptr, state, transform))
    ctr, key = _np_state(99)
    want = fill_rowmajor_oracle(parent_cols, n_srows, n_scols, ptr, ctr,
                                key, family)
    # uneg11 is exact uint32->float arithmetic; Box-Muller goes through
    # log/sin/cos whose f32 accuracy differs between XLA and libm (XLA CPU
    # f32 log is ~3e-4 rel). The uint32 stream is bit-exact (KAT-tested);
    # float tolerance documented in rng/transforms.py.
    tol = 1e-3 if family == "gaussian" else 1e-6
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


# ---------------------------------------------------------------------------
# submatrix fills equal blocks of the full fill (test_denseskop.cc:171-296)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("key", KEYS)
@pytest.mark.parametrize("n_rows,n_cols", [(10, 13), (13, 10), (8, 8)])
@pytest.mark.parametrize("major_axis", [MajorAxis.Long, MajorAxis.Short])
@pytest.mark.parametrize("family",
                         [DenseDistName.Gaussian, DenseDistName.Uniform])
def test_submatrix_equals_block(key, n_rows, n_cols, major_axis, family):
    dist = DenseDist(n_rows, n_cols, family, major_axis)
    state = RNGState.from_key(key)
    full = np.asarray(fill_dense_submat(dist, state, n_rows, n_cols))
    for ro in (0, 1, 3):
        for co in (0, 2, 5):
            nr, nc = n_rows - ro - 1, n_cols - co - 1
            if nr <= 0 or nc <= 0:
                continue
            block = np.asarray(
                fill_dense_submat(dist, state, nr, nc, ro, co))
            np.testing.assert_array_equal(block,
                                          full[ro:ro + nr, co:co + nc])


# ---------------------------------------------------------------------------
# fill-order autotranspose (test_denseskop.cc:349-403): wide vs tall with
# identical seed are exact transposes when major axes agree
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("key", KEYS)
@pytest.mark.parametrize("family",
                         [DenseDistName.Gaussian, DenseDistName.Uniform])
def test_autotranspose(key, family):
    state = RNGState.from_key(key)
    wide = DenseDist(7, 19, family, MajorAxis.Long)
    tall = DenseDist(19, 7, family, MajorAxis.Long)
    a = np.asarray(fill_dense_submat(wide, state, 7, 19))
    b = np.asarray(fill_dense_submat(tall, state, 19, 7))
    np.testing.assert_array_equal(a, b.T)


# ---------------------------------------------------------------------------
# next_state: computed == actually consumed (test_denseskop.cc:442-465)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_rows,n_cols", [(5, 12), (12, 5), (8, 8), (1, 9)])
@pytest.mark.parametrize("major_axis", [MajorAxis.Long, MajorAxis.Short])
def test_next_state_matches_consumption(n_rows, n_cols, major_axis):
    dist = DenseDist(n_rows, n_cols, DenseDistName.Gaussian, major_axis)
    state = RNGState.from_key(5)
    _, consumed = fill_dense(dist, state)
    computed = compute_next_state(dist, state)
    np.testing.assert_array_equal(np.asarray(consumed.counter),
                                  np.asarray(computed.counter))
    np.testing.assert_array_equal(np.asarray(consumed.key),
                                  np.asarray(computed.key))


# ---------------------------------------------------------------------------
# seed-chained concatenation (test_denseskop.cc:409-440, updates.rst):
# [S1; S2] from chained states equals one taller operator, when grown along
# the non-major dimension.
# ---------------------------------------------------------------------------

def test_seed_chained_concatenation_rows():
    # Wide + Long => RowMajor fill; growing d (rows) appends whole rows.
    m = 12
    d1, d2 = 3, 4
    state = RNGState.from_key(7)
    dist1 = DenseDist(d1, m, DenseDistName.Gaussian, MajorAxis.Long)
    s1, next1 = fill_dense(dist1, state)
    dist2 = DenseDist(d2, m, DenseDistName.Gaussian, MajorAxis.Long)
    s2, _ = fill_dense(dist2, next1)
    dist_full = DenseDist(d1 + d2, m, DenseDistName.Gaussian, MajorAxis.Long)
    full, _ = fill_dense(dist_full, state)
    np.testing.assert_array_equal(np.vstack([np.asarray(s1),
                                             np.asarray(s2)]),
                                  np.asarray(full))


def test_seed_chained_concatenation_cols():
    # Tall + Long => ColMajor fill; growing n (cols) appends whole columns.
    d = 9
    n1, n2 = 4, 3
    state = RNGState.from_key(11)
    dist1 = DenseDist(d, n1, DenseDistName.Gaussian, MajorAxis.Long)
    s1, next1 = fill_dense(dist1, state)
    dist2 = DenseDist(d, n2, DenseDistName.Gaussian, MajorAxis.Long)
    s2, _ = fill_dense(dist2, next1)
    dist_full = DenseDist(d, n1 + n2, DenseDistName.Gaussian, MajorAxis.Long)
    full, _ = fill_dense(dist_full, state)
    np.testing.assert_array_equal(np.hstack([np.asarray(s1),
                                             np.asarray(s2)]),
                                  np.asarray(full))


# ---------------------------------------------------------------------------
# moments (test_denseskop.cc:104-159)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("family,expected_std",
                         [(DenseDistName.Gaussian, 1.0),
                          (DenseDistName.Uniform, 1.0)])
def test_moments(family, expected_std):
    dist = DenseDist(200, 500, family)
    arr = np.asarray(fill_dense_submat(dist, RNGState.from_key(3),
                                       200, 500))
    assert abs(arr.mean()) < 0.01
    assert abs(arr.std() - expected_std) < 0.01


def test_uniform_range():
    dist = DenseDist(50, 50, DenseDistName.Uniform)
    arr = np.asarray(fill_dense_submat(dist, RNGState.from_key(1), 50, 50))
    r = np.sqrt(3.0)
    assert (np.abs(arr) <= r).all()


# ---------------------------------------------------------------------------
# layout metadata
# ---------------------------------------------------------------------------

def test_dist_to_layout():
    g = DenseDistName.Gaussian
    assert dist_to_layout(DenseDist(3, 9, g, MajorAxis.Long)) == Layout.RowMajor
    assert dist_to_layout(DenseDist(3, 9, g, MajorAxis.Short)) == Layout.ColMajor
    assert dist_to_layout(DenseDist(9, 3, g, MajorAxis.Long)) == Layout.ColMajor
    assert dist_to_layout(DenseDist(9, 3, g, MajorAxis.Short)) == Layout.RowMajor


# ---------------------------------------------------------------------------
# operator object + pytree round trip + jit
# ---------------------------------------------------------------------------

def test_skop_pytree_and_jit():
    dist = DenseDist(4, 16, DenseDistName.Gaussian)
    S = DenseSkOp(dist, RNGState.from_key(0))
    leaves, treedef = jax.tree_util.tree_flatten(S)
    S2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert S2.dist == dist

    @jax.jit
    def mat(S):
        return S.submat(4, 16, 0, 0)

    np.testing.assert_array_equal(np.asarray(mat(S)),
                                  np.asarray(S.materialize()))


def test_dtype_promotion_f64():
    # Values are computed in f32 then promoted (copy_promote semantics).
    dist = DenseDist(6, 6, DenseDistName.Gaussian)
    a32 = np.asarray(fill_dense_submat(dist, RNGState.from_key(2), 6, 6,
                                       dtype=jnp.float32))
    a64 = np.asarray(fill_dense_submat(dist, RNGState.from_key(2), 6, 6,
                                       dtype=jnp.float64))
    np.testing.assert_array_equal(a32.astype(np.float64), a64)


def test_submat_bounds_checked_both_branches():
    # Out-of-range offsets must raise on BOTH the lazy (fill) and the
    # materialized (slice) branch — lax.slice silently clamps, so an
    # unchecked materialized branch returned wrong values (round-3 fix).
    dist = DenseDist(8, 12, DenseDistName.Gaussian)
    S = DenseSkOp(dist, RNGState.from_key(0))
    with pytest.raises(ValueError):
        S.submat(8, 12, 1, 0)
    S.materialize()
    with pytest.raises(ValueError):
        S.submat(8, 12, 1, 0)
    with pytest.raises(ValueError):
        S.submat(8, 12, 0, 1)
    with pytest.raises(ValueError):
        S.submat(4, 4, -1, 0)


def test_blackbox_requires_array():
    with pytest.raises(ValueError):
        DenseSkOp(DenseDist(3, 3, DenseDistName.BlackBox,
                            MajorAxis.Undefined), RNGState.from_key(0))
