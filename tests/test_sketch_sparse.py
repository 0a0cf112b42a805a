"""sketch_sparse tests: dense operators applied to sparse data.

The reference's wrapper-level test file for sketch_sparse is empty
(test_sketch_sparse.cc is 0 lines — SURVEY.md §4); here the wrapper is
tested directly against densify oracles, covering both sides, ops,
operator submatrices, and data submatrices.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from oracle import assert_componentwise_close

from randblas_tpu import (
    DenseDist, DenseDistName, DenseSkOp, RNGState, sketch_sparse,
)
from randblas_tpu.sparse_data import COOMatrix, CSRMatrix, CSCMatrix

RNG = np.random.default_rng(31)


def _sparse_data(n_rows, n_cols, seed=0, density=0.25):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n_rows, n_cols)).astype(np.float32)
    return mat * (rng.random(size=mat.shape) < density)


def _op(d, m, key=0):
    return DenseSkOp(DenseDist(d, m), RNGState.from_key(key))


@pytest.mark.parametrize("cls", [COOMatrix, CSRMatrix, CSCMatrix])
def test_left_basic(cls):
    d, m, n = 6, 15, 7
    D = _sparse_data(m, n, seed=1)
    S = _op(d, m)
    got = np.asarray(sketch_sparse(S, cls.from_dense(D), side="left"))
    assert_componentwise_close(got, np.asarray(S.materialize()), D)


@pytest.mark.parametrize("op_s", ["N", "T"])
@pytest.mark.parametrize("op_a", ["N", "T"])
def test_left_transposes(op_s, op_a):
    d, m, n = 6, 15, 7
    D = _sparse_data(m, n, seed=2) if op_a == "N" else \
        _sparse_data(n, m, seed=2)
    S = _op(d, m) if op_s == "N" else _op(m, d)
    got = np.asarray(sketch_sparse(S, COOMatrix.from_dense(D), side="left",
                                   op_s=op_s, op_a=op_a, d=d))
    s = np.asarray(S.materialize())
    s = s.T if op_s == "T" else s
    a = D.T if op_a == "T" else D
    assert_componentwise_close(got, s, a)


@pytest.mark.parametrize("op_s", ["N", "T"])
def test_right_basic(op_s):
    m, n, d = 8, 15, 6
    D = _sparse_data(m, n, seed=3)
    S = _op(n, d) if op_s == "N" else _op(d, n)
    got = np.asarray(sketch_sparse(S, COOMatrix.from_dense(D), side="right",
                                   op_s=op_s, d=d))
    s = np.asarray(S.materialize())
    s = s.T if op_s == "T" else s
    assert_componentwise_close(got, D, s)


def test_operator_submatrix():
    d, m, n = 5, 12, 6
    D = _sparse_data(m, n, seed=4)
    big = _op(d + 3, m + 2)
    got = np.asarray(sketch_sparse(big, COOMatrix.from_dense(D),
                                   side="left", d=d, ro_s=2, co_s=1))
    s = np.asarray(big.materialize())[2:2 + d, 1:1 + m]
    assert_componentwise_close(got, s, D)


def test_data_submatrix():
    d = 5
    Dfull = _sparse_data(16, 9, seed=5)
    m, n = 10, 6
    ro_a, co_a = 3, 2
    S = _op(d, m)
    got = np.asarray(sketch_sparse(
        S, COOMatrix.from_dense(Dfull), side="left", d=d,
        ro_a=ro_a, co_a=co_a))
    want = np.asarray(S.materialize()) @ Dfull[ro_a:ro_a + m,
                                               co_a:co_a + n]
    # available data block is (16-3) x (9-2) = 13 x 7; contraction uses the
    # operator's m=10 rows starting at ro_a... the wrapper slices to the
    # remainder, so compare on the full remainder with matching m
    want_full = np.asarray(S.materialize()) @ Dfull[ro_a:, co_a:][:m]
    assert got.shape == (d, Dfull.shape[1] - co_a)
    np.testing.assert_allclose(got[:, :n], want[:, :n], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(got, want_full, rtol=1e-5, atol=1e-5)


def test_alpha_beta():
    d, m, n = 6, 15, 7
    D = _sparse_data(m, n, seed=6)
    S = _op(d, m)
    B0 = RNG.normal(size=(d, n)).astype(np.float32)
    got = np.asarray(sketch_sparse(S, COOMatrix.from_dense(D), side="left",
                                   alpha=-0.5, beta=2.0,
                                   out=jnp.asarray(B0)))
    assert_componentwise_close(got, np.asarray(S.materialize()), D,
                               alpha=-0.5, beta=2.0, b0=B0)
