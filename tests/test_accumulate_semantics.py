"""safe_scal semantics: beta == 0 must overwrite, never multiply.

The reference's util.hh:52-59 safe_scal exists precisely so that
B = alpha*S*A + 0*B yields a clean result even when B holds NaN/Inf
garbage (e.g. uninitialized workspace). These tests pin that behavior
across every entry point that takes (beta, out).
"""

import jax.numpy as jnp
import numpy as np

from randblas_tpu import (
    DenseDist, DenseSkOp, RNGState, SparseDist, SparseSkOp, sketch_general,
    sketch_sparse, left_spmm, right_spmm, COOMatrix,
)

RNG = np.random.default_rng(11)


def _nan_out(shape):
    return jnp.full(shape, jnp.nan, dtype=jnp.float32)


def test_sketch_general_beta_zero_overwrites():
    d, m, n = 4, 12, 3
    S = DenseSkOp(DenseDist(d, m), RNGState.from_key(0))
    A = RNG.normal(size=(m, n)).astype(np.float32)
    got = np.asarray(sketch_general(S, A, beta=0.0, out=_nan_out((d, n))))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, np.asarray(S.materialize()) @ A,
                               rtol=1e-5)


def test_sparse_op_beta_zero_overwrites():
    d, m, n = 4, 12, 3
    S = SparseSkOp(SparseDist(d, m, 2), RNGState.from_key(1))
    A = RNG.normal(size=(m, n)).astype(np.float32)
    got = np.asarray(sketch_general(S, A, beta=0.0, out=_nan_out((d, n))))
    assert np.isfinite(got).all()


def test_spmm_beta_zero_overwrites():
    D = RNG.normal(size=(5, 7)).astype(np.float32)
    D[D < 0.5] = 0.0
    sp = COOMatrix.from_dense(D)
    B = RNG.normal(size=(7, 3)).astype(np.float32)
    got = np.asarray(left_spmm(sp, B, beta=0.0, out=_nan_out((5, 3))))
    assert np.isfinite(got).all()
    A = RNG.normal(size=(4, 5)).astype(np.float32)
    got = np.asarray(right_spmm(A, sp, beta=0.0, out=_nan_out((4, 7))))
    assert np.isfinite(got).all()


def test_sketch_sparse_beta_zero_overwrites():
    D = RNG.normal(size=(12, 6)).astype(np.float32)
    D[np.abs(D) < 1.0] = 0.0
    sp = COOMatrix.from_dense(D)
    S = DenseSkOp(DenseDist(4, 12), RNGState.from_key(2))
    got = np.asarray(sketch_sparse(S, sp, beta=0.0, out=_nan_out((4, 6))))
    assert np.isfinite(got).all()
