"""sketch_general correctness vs densified-operator oracle.

Ports the scenario matrix of the reference's test_matmul_cores suites
(test_lskge3/rskge3/lskges/rskges): identity & random data, sketching and
lifting (d > m), submatrices of S, transposed S and A, alpha/beta scaling —
against the oracle B = alpha * op(densify(S)) @ op(A) + beta * B.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import (
    DenseDist, DenseDistName, DenseSkOp, MajorAxis, RNGState, SparseDist,
    SparseSkOp, sketch_general,
)

RNG = np.random.default_rng(1234)


def _dense_op(d, m, key=0, family=DenseDistName.Gaussian,
              major_axis=MajorAxis.Long):
    return DenseSkOp(DenseDist(d, m, family, major_axis),
                     RNGState.from_key(key))


def _sparse_op(d, m, key=0, vec_nnz=3, major_axis=MajorAxis.Short):
    return SparseSkOp(SparseDist(d, m, vec_nnz, major_axis),
                      RNGState.from_key(key))


def _check(S, A, *, side="left", op_s="N", op_a="N", alpha=1.0, beta=0.0,
           out=None, d=None, ro_s=0, co_s=0, sub_shape=None, tol=None):
    """Check against the densified oracle with the reference's
    componentwise error-bound matrix (linop_common.hh:194-265) — never a
    scalar tolerance. `tol` is accepted for call-site compatibility but
    the bound is always the componentwise one."""
    from oracle import assert_componentwise_close

    got = np.asarray(sketch_general(
        S, A, side=side, op_s=op_s, op_a=op_a, alpha=alpha, beta=beta,
        out=out, d=d, ro_s=ro_s, co_s=co_s))
    full = np.asarray(S.materialize())
    if sub_shape is not None:
        r, c = sub_shape
        full = full[ro_s:ro_s + r, co_s:co_s + c]
    s = full.T if op_s == "T" else full
    a = np.asarray(A).T if op_a == "T" else np.asarray(A)
    b0 = None if out is None else np.asarray(out)
    lhs, rhs = (s, a) if side == "left" else (a, s)
    assert_componentwise_close(got, lhs, rhs, alpha=alpha,
                               beta=beta if out is not None else 0.0,
                               b0=b0)


DENSE_FAMS = [(DenseDistName.Gaussian, MajorAxis.Long),
              (DenseDistName.Uniform, MajorAxis.Short)]


@pytest.mark.parametrize("family,ma", DENSE_FAMS)
@pytest.mark.parametrize("d,m,n", [(6, 20, 5), (30, 10, 4)])  # sketch & lift
def test_dense_left_basic(family, ma, d, m, n):
    S = _dense_op(d, m, family=family, major_axis=ma)
    A = RNG.normal(size=(m, n)).astype(np.float32)
    _check(S, A, side="left")


@pytest.mark.parametrize("op_s", ["N", "T"])
@pytest.mark.parametrize("op_a", ["N", "T"])
def test_dense_left_transposes(op_s, op_a):
    d, m, n = 6, 20, 5
    # op_s(S) must be d x m
    S = _dense_op(d, m) if op_s == "N" else _dense_op(m, d)
    A = (RNG.normal(size=(m, n)) if op_a == "N"
         else RNG.normal(size=(n, m))).astype(np.float32)
    _check(S, A, side="left", op_s=op_s, op_a=op_a, d=d)


@pytest.mark.parametrize("op_s", ["N", "T"])
def test_dense_right(op_s):
    n, m, d = 5, 20, 6  # A (n x m), op_s(S) (m x d)
    S = _dense_op(m, d) if op_s == "N" else _dense_op(d, m)
    A = RNG.normal(size=(n, m)).astype(np.float32)
    _check(S, A, side="right", op_s=op_s, d=d)


def test_dense_alpha_beta():
    d, m, n = 6, 20, 5
    S = _dense_op(d, m)
    A = RNG.normal(size=(m, n)).astype(np.float32)
    B0 = RNG.normal(size=(d, n)).astype(np.float32)
    for alpha, beta in [(1.0, 1.0), (-1.0, 0.5), (0.5, -0.25), (0.0, 1.0)]:
        _check(S, A, side="left", alpha=alpha, beta=beta,
               out=jnp.asarray(B0))


def test_dense_submatrix():
    # operator is a submatrix of a larger implicit S
    d, m, n = 5, 12, 4
    big = _dense_op(d + 3, m + 7)
    A = RNG.normal(size=(m, n)).astype(np.float32)
    _check(big, A, side="left", d=d, ro_s=2, co_s=5, sub_shape=(d, m))


def test_dense_submatrix_transposed():
    d, m, n = 5, 12, 4
    big = _dense_op(m + 4, d + 2)  # stored (m x d) block, transposed
    A = RNG.normal(size=(m, n)).astype(np.float32)
    _check(big, A, side="left", op_s="T", d=d, ro_s=3, co_s=1,
           sub_shape=(m, d))


def test_identity_data_recovers_operator():
    d, m = 6, 20
    S = _dense_op(d, m)
    eye = np.eye(m, dtype=np.float32)
    got = np.asarray(sketch_general(S, eye))
    np.testing.assert_allclose(got, np.asarray(S.materialize()), rtol=1e-6)


# ---------------------------------------------------------------------------
# sparse operators (lskges/rskges semantics)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("major_axis", [MajorAxis.Short, MajorAxis.Long])
@pytest.mark.parametrize("d,m,n", [(6, 20, 5), (30, 10, 4)])
def test_sparse_left_basic(major_axis, d, m, n):
    S = _sparse_op(d, m, major_axis=major_axis)
    A = RNG.normal(size=(m, n)).astype(np.float32)
    _check(S, A, side="left", tol=1e-5)


@pytest.mark.parametrize("op_s", ["N", "T"])
@pytest.mark.parametrize("op_a", ["N", "T"])
def test_sparse_left_transposes(op_s, op_a):
    d, m, n = 6, 20, 5
    S = _sparse_op(d, m) if op_s == "N" else _sparse_op(m, d)
    A = (RNG.normal(size=(m, n)) if op_a == "N"
         else RNG.normal(size=(n, m))).astype(np.float32)
    _check(S, A, side="left", op_s=op_s, op_a=op_a, d=d, tol=1e-5)


@pytest.mark.parametrize("op_s", ["N", "T"])
def test_sparse_right(op_s):
    n, m, d = 5, 20, 6
    S = _sparse_op(m, d) if op_s == "N" else _sparse_op(d, m)
    A = RNG.normal(size=(n, m)).astype(np.float32)
    _check(S, A, side="right", op_s=op_s, d=d, tol=1e-5)


def test_sparse_submatrix():
    d, m, n = 5, 12, 4
    big = _sparse_op(d + 3, m + 7, vec_nnz=2)
    A = RNG.normal(size=(m, n)).astype(np.float32)
    _check(big, A, side="left", d=d, ro_s=2, co_s=5, sub_shape=(d, m),
           tol=1e-5)


def test_sparse_alpha_beta():
    d, m, n = 6, 20, 5
    S = _sparse_op(d, m)
    A = RNG.normal(size=(m, n)).astype(np.float32)
    B0 = RNG.normal(size=(d, n)).astype(np.float32)
    _check(S, A, side="left", alpha=-0.5, beta=2.0, out=jnp.asarray(B0),
           tol=1e-5)


def test_f64_path():
    d, m, n = 6, 20, 5
    S = _dense_op(d, m)
    A = RNG.normal(size=(m, n))  # float64
    got = np.asarray(sketch_general(S, A))
    assert got.dtype == np.float64
    want = np.asarray(S.materialize()).astype(np.float64) @ A
    np.testing.assert_allclose(got, want, rtol=1e-12)
