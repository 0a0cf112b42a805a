"""ELL container tests: conversions, gather-based SpMM, dispatch."""

import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu.sparse_data import (
    COOMatrix, ELLMatrix, coo_to_ell, ell_to_coo, left_spmm, right_spmm,
)

RNG = np.random.default_rng(5)


def _sparse(n_rows, n_cols, density=0.2, seed=0):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n_rows, n_cols)).astype(np.float32)
    return mat * (rng.random(size=mat.shape) < density)


def test_roundtrips():
    D = _sparse(9, 13, seed=1)
    ell = ELLMatrix.from_dense(D)
    np.testing.assert_array_equal(np.asarray(ell.to_dense()), D)
    np.testing.assert_array_equal(
        np.asarray(ell_to_coo(ell).to_dense()), D)
    ell2 = coo_to_ell(COOMatrix.from_dense(D))
    np.testing.assert_array_equal(np.asarray(ell2.to_dense()), D)


def test_width_padding():
    D = _sparse(6, 8, seed=2)
    max_row = int((D != 0).sum(axis=1).max())
    ell = ELLMatrix.from_dense(D)
    assert ell.width == max_row
    wide = coo_to_ell(COOMatrix.from_dense(D), width=max_row + 3)
    assert wide.width == max_row + 3
    np.testing.assert_array_equal(np.asarray(wide.to_dense()), D)
    with pytest.raises(ValueError):
        coo_to_ell(COOMatrix.from_dense(D), width=max_row - 1)


def test_matmul_gather_path():
    D = _sparse(10, 14, seed=3)
    ell = ELLMatrix.from_dense(D)
    B = RNG.normal(size=(14, 5)).astype(np.float32)
    got = np.asarray(left_spmm(ell, B, alpha=2.0))
    np.testing.assert_allclose(got, 2.0 * D @ B, rtol=1e-5, atol=1e-5)


def test_transposed_falls_back_to_coo():
    D = _sparse(10, 14, seed=4)
    ell = ELLMatrix.from_dense(D)
    B = RNG.normal(size=(10, 5)).astype(np.float32)
    got = np.asarray(left_spmm(ell, B, op_a="T"))
    np.testing.assert_allclose(got, D.T @ B, rtol=1e-5, atol=1e-5)


def test_right_spmm_with_ell():
    D = _sparse(8, 12, seed=6)
    ell = ELLMatrix.from_dense(D)
    A = RNG.normal(size=(5, 8)).astype(np.float32)
    got = np.asarray(right_spmm(A, ell))
    np.testing.assert_allclose(got, A @ D, rtol=1e-5, atol=1e-5)


def test_jit_and_beta():
    import jax

    D = _sparse(7, 9, seed=7)
    ell = ELLMatrix.from_dense(D)
    B = RNG.normal(size=(9, 4)).astype(np.float32)
    C0 = RNG.normal(size=(7, 4)).astype(np.float32)

    @jax.jit
    def f(ell, B, C0):
        return left_spmm(ell, B, beta=0.5, out=C0)

    got = np.asarray(f(ell, B, C0))
    np.testing.assert_allclose(got, D @ B + 0.5 * C0, rtol=1e-5, atol=1e-5)


def test_duplicate_entries_sum():
    coo = COOMatrix.from_arrays(3, 3, [0, 0, 1], [1, 1, 2],
                                np.array([2.0, 3.0, 1.0], np.float32))
    ell = coo_to_ell(coo)
    dense = np.asarray(ell.to_dense())
    assert dense[0, 1] == 5.0 and dense[1, 2] == 1.0
