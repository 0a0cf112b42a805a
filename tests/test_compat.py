"""BLAS-compat API tests: reference-style flat-buffer calls, both layouts.

These mirror how the reference's test_matmul_cores call the entry points:
flat buffers, leading dimensions, in-place B updates.
"""

import numpy as np
import pytest

from randblas_tpu import (
    DenseDist, DenseSkOp, RNGState, SparseDist, SparseSkOp,
)
from randblas_tpu import compat
from randblas_tpu.compat import ColMajor, RowMajor, NoTrans, Trans

RNG = np.random.default_rng(2024)


def _flat(mat, layout, ld=None):
    """Flatten a 2-D matrix into layout order with given ld."""
    n_rows, n_cols = mat.shape
    if layout == ColMajor:
        ld = ld or n_rows
        buf = np.zeros((n_cols, ld), dtype=mat.dtype)
        buf[:, :n_rows] = mat.T
    else:
        ld = ld or n_cols
        buf = np.zeros((n_rows, ld), dtype=mat.dtype)
        buf[:, :n_cols] = mat
    return buf.reshape(-1)


@pytest.mark.parametrize("layout", [ColMajor, RowMajor])
@pytest.mark.parametrize("opS", [NoTrans, Trans])
def test_left_sketch_inplace(layout, opS):
    d, m, n = 6, 20, 5
    S = DenseSkOp(DenseDist(d, m) if opS == NoTrans else DenseDist(m, d),
                  RNGState.from_key(0))
    A = RNG.normal(size=(m, n)).astype(np.float32)
    B0 = RNG.normal(size=(d, n)).astype(np.float32)
    ld_a = m if layout == ColMajor else n
    ld_b = d if layout == ColMajor else n
    a_buf = _flat(A, layout)
    b_buf = _flat(B0, layout)
    compat.sketch_general(layout, opS, NoTrans, d, n, m, 2.0, S, 0, 0,
                          a_buf, ld_a, 0.5, b_buf, ld_b)
    got = compat.read_mat(layout, b_buf, d, n, ld_b)
    s = np.asarray(S.materialize())
    s = s.T if opS == Trans else s
    want = 2.0 * s @ A + 0.5 * B0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("layout", [ColMajor, RowMajor])
def test_right_sketch_inplace(layout):
    n, m, d = 5, 20, 6  # A is n x m (rows_a x cols_a under NoTrans)
    S = DenseSkOp(DenseDist(m, d), RNGState.from_key(1))
    A = RNG.normal(size=(n, m)).astype(np.float32)
    B0 = RNG.normal(size=(n, d)).astype(np.float32)
    ld_a = n if layout == ColMajor else m
    ld_b = n if layout == ColMajor else d
    a_buf = _flat(A, layout)
    b_buf = _flat(B0, layout)
    # right form: (layout, opA, opS, m_out_rows, d, n_inner, alpha, A, lda,
    #              S, beta, B, ldb) with reference naming m=B rows, n=inner
    compat.sketch_general(layout, NoTrans, NoTrans, n, d, m, 1.0, a_buf,
                          ld_a, S, 1.0, b_buf, ld_b)
    got = compat.read_mat(layout, b_buf, n, d, ld_b)
    want = A @ np.asarray(S.materialize()) + B0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_left_full_overload_checks_dims():
    d, m, n = 6, 20, 5
    S = DenseSkOp(DenseDist(d, m), RNGState.from_key(0))
    A = RNG.normal(size=(m, n)).astype(np.float32)
    B = np.zeros((d, n), dtype=np.float32)
    a_buf = _flat(A, ColMajor)
    b_buf = _flat(B, ColMajor)
    compat.sketch_general(ColMajor, NoTrans, NoTrans, d, n, m, 1.0, S,
                          a_buf, m, 0.0, b_buf, d)
    got = compat.read_mat(ColMajor, b_buf, d, n, d)
    np.testing.assert_allclose(got, np.asarray(S.materialize()) @ A,
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError):
        compat.sketch_general(ColMajor, NoTrans, NoTrans, d + 1, n, m,
                              1.0, S, a_buf, m, 0.0, b_buf, d + 1)


def test_sparse_operator_through_compat():
    d, m, n = 6, 20, 5
    S = SparseSkOp(SparseDist(d, m, vec_nnz=3), RNGState.from_key(2))
    A = RNG.normal(size=(m, n)).astype(np.float32)
    B = np.zeros((d, n), dtype=np.float32)
    a_buf = _flat(A, RowMajor)
    b_buf = _flat(B, RowMajor)
    compat.sketch_general(RowMajor, NoTrans, NoTrans, d, n, m, 1.0, S,
                          0, 0, a_buf, n, 0.0, b_buf, n)
    got = compat.read_mat(RowMajor, b_buf, d, n, n)
    np.testing.assert_allclose(got, np.asarray(S.materialize()) @ A,
                               rtol=1e-5, atol=1e-5)


def test_sketch_vector_inplace_with_inc():
    d, m = 6, 15
    S = DenseSkOp(DenseDist(d, m), RNGState.from_key(3))
    x = RNG.normal(size=(2 * m,)).astype(np.float32)  # incx=2
    y = RNG.normal(size=(3 * d,)).astype(np.float32)  # incy=3
    y0 = y.copy()
    compat.sketch_vector(NoTrans, 1.5, S, x, 2, 0.5, y, 3)
    want = 1.5 * np.asarray(S.materialize()) @ x[::2] + 0.5 * y0[::3]
    np.testing.assert_allclose(y[::3], want, rtol=1e-5)
    # untouched strided gaps
    mask = np.ones(len(y), bool)
    mask[::3] = False
    np.testing.assert_array_equal(y[mask], y0[mask])


@pytest.mark.parametrize("layout", [ColMajor, RowMajor])
def test_sketch_symmetric_left_full(layout):
    n, d = 10, 4
    A = RNG.normal(size=(n, n)).astype(np.float32)
    A = A + A.T
    S = DenseSkOp(DenseDist(d, n), RNGState.from_key(4))
    B = np.zeros((d, n), dtype=np.float32)
    a_buf = _flat(A, layout)
    b_buf = _flat(B, layout)
    ld = n if layout == ColMajor else n
    ld_b = d if layout == ColMajor else n
    compat.sketch_symmetric(layout, 1.0, S, a_buf, ld, 0.0, b_buf, ld_b)
    got = compat.read_mat(layout, b_buf, d, n, ld_b)
    np.testing.assert_allclose(got, np.asarray(S.materialize()) @ A,
                               rtol=1e-5)


@pytest.mark.parametrize("layout", [ColMajor, RowMajor])
def test_lda_window_views(layout):
    """A stored inside a larger buffer with ld > its extent — the
    reference's lda-window semantics (base.hh:65-114)."""
    d, m, n = 5, 14, 4
    S = DenseSkOp(DenseDist(d, m), RNGState.from_key(9))
    A = RNG.normal(size=(m, n)).astype(np.float32)
    # embed A into a buffer with padded leading dimension
    if layout == ColMajor:
        ld_a = m + 3
        big = RNG.normal(size=(n, ld_a)).astype(np.float32)  # col-major flat
        big[:, :m] = A.T
        a_buf = big.reshape(-1)
    else:
        ld_a = n + 2
        big = RNG.normal(size=(m, ld_a)).astype(np.float32)
        big[:, :n] = A
        a_buf = big.reshape(-1)
    ld_b = (d + 1) if layout == ColMajor else (n + 5)
    if layout == ColMajor:
        bbig = np.zeros((n, ld_b), dtype=np.float32)
        b_buf = bbig.reshape(-1)
    else:
        bbig = np.zeros((d, ld_b), dtype=np.float32)
        b_buf = bbig.reshape(-1)
    compat.sketch_general(layout, NoTrans, NoTrans, d, n, m, 1.0, S, 0, 0,
                          a_buf, ld_a, 0.0, b_buf, ld_b)
    got = compat.read_mat(layout, b_buf, d, n, ld_b)
    want = np.asarray(S.materialize()) @ A
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # padding region of the B buffer untouched beyond written window
    if layout == RowMajor:
        np.testing.assert_array_equal(
            b_buf.reshape(d, ld_b)[:, n:], np.zeros((d, ld_b - n),
                                                    np.float32))


def test_fill_dense_layouts():
    from randblas_tpu import fill_dense_submat
    dist = DenseDist(5, 8)
    state = RNGState.from_key(6)
    want = np.asarray(fill_dense_submat(dist, state, 4, 6, 1, 2))
    for layout in (ColMajor, RowMajor):
        buf = np.zeros(4 * 6, dtype=np.float32)
        nxt = compat.fill_dense(layout, dist, 4, 6, 1, 2, buf, state)
        got = compat.read_mat(layout, buf, 4, 6,
                              4 if layout == ColMajor else 6)
        np.testing.assert_array_equal(got, want)
    assert nxt.counter_as_int() > 0
