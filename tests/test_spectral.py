"""Tests for linalg/spectral.py: power method, extremal eigenvalues,
spectral norm.

Model: the reference's handrolled_lapack power-method machinery
(handrolled_lapack.hh:214-303) and its meta-tests
(test_handrolled_lapack.cc) — controlled spectra, iteration bounds,
reproducibility.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import randblas_tpu as rbt
from randblas_tpu.linalg import (extremal_eigs, power_method,
                                 required_power_iters, spectral_norm)
from randblas_tpu.sparse_data.coo import COOMatrix


def _psd(n, lam, seed):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    return jnp.asarray((q * lam) @ q.T, jnp.float32), np.asarray(lam)


class TestRequiredIters:
    def test_monotone_in_tol(self):
        a = required_power_iters(1000, 1e-6, 1e-1)
        b = required_power_iters(1000, 1e-6, 1e-2)
        assert b > a > 0

    def test_validates(self):
        with pytest.raises(ValueError):
            required_power_iters(100, 0.0, 1e-2)


class TestPowerMethod:
    def test_dominant_eig_gap(self):
        lam = np.linspace(1.0, 0.1, 50)
        a, _ = _psd(50, lam, seed=1)
        l_hat, v, nxt = power_method(
            lambda x: (a @ x[:, None])[:, 0], 50, rbt.default_state(2),
            tol=1e-3)
        assert abs(float(l_hat) - 1.0) < 1e-3
        # eigvec residual
        r = np.asarray(a @ v - l_hat * v)
        assert np.linalg.norm(r) < 1e-2
        assert nxt.to_dict() != rbt.default_state(2).to_dict()

    def test_reproducible(self):
        a, _ = _psd(40, np.linspace(2.0, 0.5, 40), seed=3)
        f = lambda x: (a @ x[:, None])[:, 0]
        l1, _, _ = power_method(f, 40, rbt.default_state(4), iters=50)
        l2, _, _ = power_method(f, 40, rbt.default_state(4), iters=50)
        assert float(l1) == float(l2)


class TestExtremalEigs:
    def test_matches_spectrum(self):
        lam = np.linspace(5.0, 0.5, 60)
        a, _ = _psd(60, lam, seed=5)
        lmin, lmax, _ = extremal_eigs(a, rbt.default_state(6), tol=1e-3)
        assert abs(float(lmax) - 5.0) / 5.0 < 1e-2
        assert abs(float(lmin) - 0.5) / 0.5 < 5e-2

    def test_callable_operator(self):
        lam = np.linspace(3.0, 1.0, 30)
        a, _ = _psd(30, lam, seed=7)
        lmin, lmax, _ = extremal_eigs(
            lambda v: (a @ v[:, None])[:, 0], rbt.default_state(8),
            n=30, tol=1e-3)
        assert abs(float(lmax) - 3.0) < 0.05
        assert abs(float(lmin) - 1.0) < 0.1

    def test_callable_needs_n(self):
        with pytest.raises(ValueError):
            extremal_eigs(lambda v: v, rbt.default_state(9))

    def test_ill_conditioned_dense_relative_accuracy(self):
        # review regression: the shifted-complement lambda_min estimate
        # only has ABSOLUTE accuracy ~tol*lambda_max (1529% relative
        # error at cond 1e5); dense inputs now take the reference's
        # inverse-powering path (relative ~tol on lambda_min itself)
        rng = np.random.default_rng(14)
        n = 60
        q, _ = np.linalg.qr(rng.normal(size=(n, n)))
        lam = np.geomspace(1000.0, 0.01, n)
        a = jnp.asarray((q * lam) @ q.T, jnp.float64)
        lmin, lmax, _ = extremal_eigs(a, rbt.default_state(15), tol=1e-2,
                                      dtype=jnp.float64)
        assert abs(float(lmax) - 1000.0) / 1000.0 < 5e-2
        assert abs(float(lmin) - 0.01) / 0.01 < 5e-2


class TestSpectralNorm:
    def test_rectangular_dense(self):
        rng = np.random.default_rng(10)
        u, _ = np.linalg.qr(rng.normal(size=(200, 12)))
        v, _ = np.linalg.qr(rng.normal(size=(80, 12)))
        s = np.linspace(7.0, 1.0, 12)
        a = jnp.asarray((u * s) @ v.T, jnp.float32)
        sig, _ = spectral_norm(a, rbt.default_state(11), tol=1e-3)
        assert abs(float(sig) - 7.0) / 7.0 < 1e-2

    def test_sparse_container(self):
        rng = np.random.default_rng(12)
        dense = np.zeros((150, 60), np.float32)
        nnz = 900
        ii = rng.integers(0, 150, nnz)
        jj = rng.integers(0, 60, nnz)
        vv = rng.normal(size=nnz).astype(np.float32)
        np.add.at(dense, (ii, jj), vv)
        coo = COOMatrix.from_dense(jnp.asarray(dense))
        sig, _ = spectral_norm(coo, rbt.default_state(13), tol=1e-3)
        ref = np.linalg.svd(dense, compute_uv=False)[0]
        assert abs(float(sig) - ref) / ref < 1e-2


def test_extremal_eigs_singular_psd_falls_back_finite():
    """Review regression: a rank-deficient PSD A (valid per the PSD
    contract) made the dense inverse-powering path return lam_min = NaN
    silently; it now falls back to the complement path (finite, ~0)."""
    rng = np.random.default_rng(16)
    x = rng.normal(size=(40, 20)).astype(np.float32)
    a = jnp.asarray(x @ x.T)                      # exact rank 20 in 40
    lmin, lmax, _ = extremal_eigs(a, rbt.default_state(17), tol=1e-2)
    assert np.isfinite(float(lmin)) and np.isfinite(float(lmax))
    ref_max = float(np.linalg.eigvalsh(np.asarray(a))[-1])
    assert abs(float(lmax) - ref_max) / ref_max < 0.05
    # complement-path accuracy: absolute ~tol*lam_max around 0
    assert 0.0 <= float(lmin) < 0.05 * ref_max
