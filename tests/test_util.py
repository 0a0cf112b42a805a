"""Utility tests: CDF sampling streams, symmetry helpers, wrappers."""

import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import (
    DenseDist, DenseSkOp, RNGState, isometry_scale_factor, sketch_vector,
    sketch_symmetric, weights_to_cdf, sample_indices_iid,
    sample_indices_iid_uniform, symmetrize, overwrite_triangle,
    SparseDist, MajorAxis,
)

from oracle import philox4x32_once, ctr_incr, uneg11_f32


def test_weights_to_cdf():
    w = jnp.asarray([1.0, 3.0, 0.0, 4.0])
    cdf = np.asarray(weights_to_cdf(w))
    np.testing.assert_allclose(cdf, [0.125, 0.5, 0.5, 1.0], rtol=1e-6)
    with pytest.raises(ValueError):
        weights_to_cdf(jnp.asarray([1.0, -2.0, 3.0]))


def _oracle_uniform_stream(key, k):
    """Serial counter walk of util.hh:285-306 (block 0 is discarded)."""
    ctr = [np.uint32(0)] * 4
    kk = [np.uint32(key), np.uint32(0)]
    vals = []
    n_blocks = -(-k // 4)
    for b in range(1, n_blocks + 1):
        rv = philox4x32_once(ctr_incr(ctr, b), kk)
        vals.extend(uneg11_f32(v) for v in rv)
    return np.array(vals[:k], dtype=np.float32), n_blocks


def test_sample_indices_iid_stream_semantics():
    """Counter consumption matches the reference loop exactly."""
    n, k = 10, 11
    cdf = weights_to_cdf(jnp.ones((n,), dtype=jnp.float32))
    state = RNGState.from_key(123)
    samples, next_state = sample_indices_iid(cdf, k, state)
    u, n_blocks = _oracle_uniform_stream(123, k)
    u01 = (u.astype(np.float32) + 1.0) / 2.0
    want = np.searchsorted(np.asarray(cdf), u01, side="left")
    np.testing.assert_array_equal(np.asarray(samples), want)
    assert next_state.counter_as_int() == n_blocks
    assert (np.asarray(samples) >= 0).all()
    assert (np.asarray(samples) < n).all()


def test_sample_indices_iid_distribution():
    n = 4
    w = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    cdf = weights_to_cdf(w)
    samples, _ = sample_indices_iid(cdf, 20000, RNGState.from_key(7))
    hist = np.bincount(np.asarray(samples), minlength=n) / 20000
    np.testing.assert_allclose(hist, np.asarray(w), atol=0.02)


def test_sample_indices_iid_degenerate():
    """Degenerate distribution: all weight on one index
    (test_discrete.cc edge cases)."""
    cdf = weights_to_cdf(jnp.asarray([0.0, 0.0, 1.0, 0.0]))
    samples, _ = sample_indices_iid(cdf, 100, RNGState.from_key(0))
    assert (np.asarray(samples) == 2).all()


def test_sample_indices_iid_uniform():
    n, k = 7, 5000
    samples, next_state = sample_indices_iid_uniform(
        n, k, RNGState.from_key(5))
    s = np.asarray(samples)
    assert (s >= 0).all() and (s < n).all()
    hist = np.bincount(s, minlength=n) / k
    np.testing.assert_allclose(hist, np.full(n, 1 / n), atol=0.03)
    assert next_state.counter_as_int() == -(-k // 4)


def test_symmetrize():
    a = np.triu(np.arange(16, dtype=np.float32).reshape(4, 4))
    s = np.asarray(symmetrize(a, "upper"))
    np.testing.assert_array_equal(s, s.T)
    np.testing.assert_array_equal(np.triu(s), np.triu(a))


def test_overwrite_triangle():
    a = np.ones((4, 4), dtype=np.float32)
    z = np.asarray(overwrite_triangle(a, "lower", strict_offset=1, val=0.0))
    np.testing.assert_array_equal(z, np.triu(np.ones((4, 4))))


def test_isometry_scale_factors():
    assert np.isclose(isometry_scale_factor(DenseDist(10, 40)), 10 ** -0.5)
    assert np.isclose(
        isometry_scale_factor(SparseDist(10, 40, 4, MajorAxis.Short)),
        0.5)
    assert np.isclose(
        isometry_scale_factor(SparseDist(10, 40, 4, MajorAxis.Long)),
        np.sqrt(40 / (4 * 10)))


def test_sketch_vector_with_submatrix():
    big = DenseSkOp(DenseDist(8, 12), RNGState.from_key(2))
    x = np.random.default_rng(0).normal(size=(9,)).astype(np.float32)
    y = np.asarray(sketch_vector(big, x, d=5, m=9, ro_s=2, co_s=3))
    s = np.asarray(big.materialize())[2:7, 3:12]
    np.testing.assert_allclose(y, s @ x, rtol=1e-5)


def test_sketch_vector_trans():
    S = DenseSkOp(DenseDist(8, 12), RNGState.from_key(2))
    x = np.random.default_rng(0).normal(size=(8,)).astype(np.float32)
    y = np.asarray(sketch_vector(S, x, op_s="T"))
    np.testing.assert_allclose(y, np.asarray(S.materialize()).T @ x,
                               rtol=1e-5)


def test_sketch_symmetric_right():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(10, 10)).astype(np.float32)
    A = A + A.T
    S = DenseSkOp(DenseDist(10, 4), RNGState.from_key(1))
    B = np.asarray(sketch_symmetric(S, A, side="right"))
    np.testing.assert_allclose(B, A @ np.asarray(S.materialize()),
                               rtol=1e-5)
