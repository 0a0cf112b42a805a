"""MatrixMarket IO round trips."""

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")

from randblas_tpu.io import load_matrix_market, save_matrix_market
from randblas_tpu.sparse_data import COOMatrix


def test_roundtrip_all_formats(tmp_path):
    rng = np.random.default_rng(0)
    D = rng.normal(size=(12, 9)).astype(np.float32)
    D *= rng.random(size=D.shape) < 0.4
    path = str(tmp_path / "m.mtx")
    save_matrix_market(path, COOMatrix.from_dense(D))
    for fmt in ("coo", "csr", "csc", "ell"):
        sp = load_matrix_market(path, fmt)
        np.testing.assert_allclose(np.asarray(sp.to_dense()), D,
                                   rtol=1e-6, atol=1e-6)
    dense = load_matrix_market(path, "dense")
    np.testing.assert_allclose(np.asarray(dense), D, rtol=1e-6, atol=1e-6)


def test_dense_roundtrip(tmp_path):
    D = np.random.default_rng(1).normal(size=(5, 7)).astype(np.float32)
    path = str(tmp_path / "d.mtx")
    save_matrix_market(path, D)
    got = load_matrix_market(path, "dense")
    np.testing.assert_allclose(np.asarray(got), D, rtol=1e-6)
