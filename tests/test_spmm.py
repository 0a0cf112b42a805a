"""SpMM tests: COO/CSR/CSC containers, conversions, left/right products.

Ports the semantics of the reference's test_datastructures/test_spmats and
test_matmul_cores/test_spmm_* suites against densify+matmul oracles.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from oracle import assert_componentwise_close

from randblas_tpu.sparse_data import (
    COOMatrix, CSRMatrix, CSCMatrix, NonzeroSort,
    coo_to_csr, coo_to_csc, csr_to_coo, csc_to_coo,
    transpose_as_csr, transpose_as_csc,
    left_spmm, right_spmm, spmm,
)

RNG = np.random.default_rng(77)


def _random_sparse(n_rows, n_cols, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n_rows, n_cols)).astype(np.float32)
    mask = rng.random(size=mat.shape) < density
    return mat * mask


# ---------------------------------------------------------------------------
# containers & conversions
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cls", [COOMatrix, CSRMatrix, CSCMatrix])
def test_dense_roundtrip(cls):
    dense = _random_sparse(7, 11)
    sp = cls.from_dense(dense)
    np.testing.assert_array_equal(np.asarray(sp.to_dense()), dense)
    assert sp.nnz == (dense != 0).sum()


def test_conversions_roundtrip():
    dense = _random_sparse(9, 6, seed=3)
    coo = COOMatrix.from_dense(dense)
    for sp in (coo_to_csr(coo), coo_to_csc(coo),
               csr_to_coo(coo_to_csr(coo)), csc_to_coo(coo_to_csc(coo))):
        np.testing.assert_array_equal(np.asarray(sp.to_dense()), dense)


def test_transpose_views():
    dense = _random_sparse(5, 8, seed=4)
    csr = CSRMatrix.from_dense(dense)
    np.testing.assert_array_equal(
        np.asarray(transpose_as_csc(csr).to_dense()), dense.T)
    csc = CSCMatrix.from_dense(dense)
    np.testing.assert_array_equal(
        np.asarray(transpose_as_csr(csc).to_dense()), dense.T)


def test_coo_sort_tracking():
    dense = _random_sparse(6, 6, seed=5)
    coo = COOMatrix.from_dense(dense)
    assert coo.sort == NonzeroSort.CSR
    coo_csc = coo.sorted(NonzeroSort.CSC)
    assert coo_csc.sort == NonzeroSort.CSC
    np.testing.assert_array_equal(np.asarray(coo_csc.to_dense()), dense)
    # a scrambled COO is detected as unsorted
    perm = np.random.default_rng(0).permutation(coo.nnz)
    scrambled = COOMatrix.from_arrays(
        6, 6, np.asarray(coo.rows)[perm], np.asarray(coo.cols)[perm],
        np.asarray(coo.vals)[perm])
    assert scrambled.sort == NonzeroSort.NONE
    np.testing.assert_array_equal(np.asarray(scrambled.to_dense()), dense)


def test_index_base_one():
    rows = np.array([1, 2, 3])
    cols = np.array([1, 1, 2])
    vals = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    from randblas_tpu.sparse_data import IndexBase
    coo = COOMatrix.from_arrays(3, 2, rows, cols, vals,
                                index_base=IndexBase.One)
    want = np.array([[1, 0], [2, 0], [0, 3]], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(coo.to_dense()), want)


# ---------------------------------------------------------------------------
# left_spmm / right_spmm over formats, ops, scalars, submatrices
# ---------------------------------------------------------------------------

FORMATS = [COOMatrix, CSRMatrix, CSCMatrix]


@pytest.mark.parametrize("cls", FORMATS)
@pytest.mark.parametrize("op_a", ["N", "T"])
@pytest.mark.parametrize("op_b", ["N", "T"])
def test_left_spmm(cls, op_a, op_b):
    d, m, n = 7, 9, 4
    dense = _random_sparse(d, m, seed=6) if op_a == "N" else \
        _random_sparse(m, d, seed=6)
    sp = cls.from_dense(dense)
    B = (RNG.normal(size=(m, n)) if op_b == "N"
         else RNG.normal(size=(n, m))).astype(np.float32)
    got = np.asarray(left_spmm(sp, B, op_a=op_a, op_b=op_b, d=d))
    a = dense if op_a == "N" else dense.T
    b = B if op_b == "N" else B.T
    assert_componentwise_close(got, a, b)


@pytest.mark.parametrize("cls", FORMATS)
@pytest.mark.parametrize("op_b", ["N", "T"])
def test_right_spmm(cls, op_b):
    m, k, d = 5, 8, 6
    dense = _random_sparse(k, d, seed=8) if op_b == "N" else \
        _random_sparse(d, k, seed=8)
    sp = cls.from_dense(dense)
    A = RNG.normal(size=(m, k)).astype(np.float32)
    got = np.asarray(right_spmm(A, sp, op_b=op_b, d=d))
    b = dense if op_b == "N" else dense.T
    assert_componentwise_close(got, A, b)


def test_left_spmm_alpha_beta():
    d, m, n = 7, 9, 4
    sp = COOMatrix.from_dense(_random_sparse(d, m, seed=9))
    B = RNG.normal(size=(m, n)).astype(np.float32)
    C0 = RNG.normal(size=(d, n)).astype(np.float32)
    got = np.asarray(left_spmm(sp, B, alpha=-0.5, beta=2.0,
                               out=jnp.asarray(C0)))
    assert_componentwise_close(got, np.asarray(sp.to_dense()), B,
                               alpha=-0.5, beta=2.0, b0=C0)


def test_left_spmm_submatrix():
    D = _random_sparse(10, 14, seed=10)
    sp = COOMatrix.from_dense(D)
    d, m, n = 6, 9, 3
    ro, co = 2, 4
    B = RNG.normal(size=(m, n)).astype(np.float32)
    got = np.asarray(left_spmm(sp, B, d=d, ro_a=ro, co_a=co))
    assert_componentwise_close(got, D[ro:ro + d, co:co + m], B)


def test_right_spmm_submatrix():
    D = _random_sparse(12, 10, seed=11)
    sp = COOMatrix.from_dense(D)
    m, k, d = 4, 7, 5
    ro, co = 3, 2
    A = RNG.normal(size=(m, k)).astype(np.float32)
    got = np.asarray(right_spmm(A, sp, d=d, ro_b=ro, co_b=co))
    assert_componentwise_close(got, A, D[ro:ro + k, co:co + d])


def test_spmm_wrapper_sides():
    D = _random_sparse(6, 8, seed=12)
    sp = CSRMatrix.from_dense(D)
    B = RNG.normal(size=(8, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(spmm(sp, B, side="left")),
                               D @ B, rtol=1e-5)
    A = RNG.normal(size=(4, 6)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(spmm(A, sp, side="right")),
                               A @ D, rtol=1e-5)


def test_spmm_jit():
    import jax

    D = _random_sparse(6, 8, seed=13)
    sp = COOMatrix.from_dense(D)
    B = RNG.normal(size=(8, 3)).astype(np.float32)

    @jax.jit
    def f(sp, B):
        return left_spmm(sp, B)

    np.testing.assert_allclose(np.asarray(f(sp, B)), D @ B, rtol=1e-5)
