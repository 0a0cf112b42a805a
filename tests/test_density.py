"""Spectral density estimation (linalg/density.py): SLQ DOS, KPM DOS,
interval eigenvalue counting — against exact eigendecompositions of
controlled spectra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import RNGState
from randblas_tpu.linalg import eig_count, kpm_density, spectral_density


def _sym_with_spectrum(lam, seed=0):
    n = len(lam)
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return jnp.asarray(((u * lam) @ u.T).astype(np.float32)), np.asarray(lam)


def _cdf_from_density(grid, dens):
    """Cumulative integral by trapezoid (counts below each grid pt)."""
    g = np.asarray(grid, np.float64)
    d = np.asarray(dens, np.float64)
    mid = 0.5 * (d[1:] + d[:-1]) * np.diff(g)
    return np.concatenate([[0.0], np.cumsum(mid)])


def _cdf_exact(grid, lam):
    return np.searchsorted(np.sort(lam), np.asarray(grid), side="right")


class TestSLQDensity:
    def test_cdf_matches_exact_spectrum(self):
        n = 384
        lam = np.linspace(0.5, 4.0, n)
        a, lam = _sym_with_spectrum(lam, seed=1)
        grid, dens, _ = spectral_density(a, RNGState.from_key(2),
                                         probes=24, steps=80)
        cdf = _cdf_from_density(grid, dens)
        exact = _cdf_exact(grid, lam)
        # counting CDF within a few % of n uniformly
        assert np.max(np.abs(cdf - exact)) < 0.05 * n
        # total mass ~ n
        assert abs(cdf[-1] - n) < 0.04 * n

    def test_resolves_two_clusters(self):
        n = 256
        lam = np.concatenate([np.full(192, 1.0), np.full(64, 5.0)])
        lam = lam + np.linspace(-0.02, 0.02, n)
        a, lam = _sym_with_spectrum(lam, seed=3)
        grid, dens, _ = spectral_density(a, RNGState.from_key(4),
                                         probes=16, steps=40,
                                         sigma=0.1)
        g = np.asarray(grid)
        d = np.asarray(dens)
        # mass below/above the midpoint splits ~192 / ~64
        cdf = _cdf_from_density(grid, dens)
        mid = np.searchsorted(g, 3.0)
        assert abs(cdf[mid] - 192) < 0.08 * n
        assert abs(cdf[-1] - cdf[mid] - 64) < 0.08 * n
        # density is ~zero in the spectral gap
        gap = (g > 2.0) & (g < 4.0)
        assert d[gap].max() < 0.02 * d.max()

    def test_callable_and_seed_chain(self):
        n = 192
        lam = np.linspace(1.0, 2.0, n)
        a, _ = _sym_with_spectrum(lam, seed=5)
        st = RNGState.from_key(6)
        g1, d1, nxt1 = spectral_density(a, st, probes=8, steps=30)
        g2, d2, nxt2 = spectral_density(lambda x: a @ x, st, probes=8,
                                        steps=30, n=n)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=2e-4, atol=2e-4)
        # next_state = f(distribution): same consumption both ways
        assert nxt1.to_dict() == nxt2.to_dict()
        assert nxt1.to_dict() != st.to_dict()

    def test_custom_grid_and_sigma(self):
        n = 128
        lam = np.linspace(0.0, 1.0, n)
        a, lam = _sym_with_spectrum(lam, seed=7)
        grid = jnp.linspace(-0.5, 1.5, 201)
        g, dens, _ = spectral_density(a, RNGState.from_key(8), probes=8,
                                      steps=40, grid=grid, sigma=0.05)
        assert g.shape == (201,)
        cdf = _cdf_from_density(g, dens)
        assert abs(cdf[-1] - n) < 0.06 * n


class TestEigCount:
    def test_counts_cluster_sizes(self):
        n = 256
        lam = np.concatenate([np.full(64, -2.0), np.full(128, 1.0),
                              np.full(64, 6.0)])
        lam = lam + np.linspace(-0.05, 0.05, n)
        a, lam = _sym_with_spectrum(lam, seed=9)
        st = RNGState.from_key(10)
        c1, st = eig_count(a, -3.0, -1.0, st, probes=24, steps=40)
        c2, st = eig_count(a, 0.0, 2.0, st, probes=24, steps=40)
        c3, _ = eig_count(a, 5.0, 7.0, st, probes=24, steps=40)
        assert abs(float(c1) - 64) < 0.12 * 64 + 4
        assert abs(float(c2) - 128) < 0.12 * 128 + 4
        assert abs(float(c3) - 64) < 0.12 * 64 + 4

    def test_empty_interval(self):
        n = 128
        lam = np.linspace(1.0, 2.0, n)
        a, _ = _sym_with_spectrum(lam, seed=11)
        c, _ = eig_count(a, 5.0, 6.0, RNGState.from_key(12), probes=8,
                         steps=30)
        assert float(c) < 0.02 * n

    def test_validates_interval(self):
        a, _ = _sym_with_spectrum(np.ones(16), seed=13)
        with pytest.raises(ValueError):
            eig_count(a, 2.0, 1.0, RNGState.from_key(1))


class TestKPMDensity:
    def test_cdf_matches_exact_spectrum(self):
        n = 384
        lam = np.linspace(-1.0, 3.0, n)
        a, lam = _sym_with_spectrum(lam, seed=14)
        grid, dens, _ = kpm_density(a, RNGState.from_key(15),
                                    degree=160, probes=24)
        cdf = _cdf_from_density(grid, dens)
        exact = _cdf_exact(grid, lam)
        assert np.max(np.abs(cdf - exact)) < 0.06 * n
        assert abs(cdf[-1] - n) < 0.05 * n

    def test_explicit_bounds_callable(self):
        n = 192
        lam = np.linspace(0.5, 1.5, n)
        a, lam = _sym_with_spectrum(lam, seed=16)
        grid, dens, _ = kpm_density(lambda x: a @ x,
                                    RNGState.from_key(17), degree=128,
                                    probes=16, bounds=(0.0, 2.0), n=n)
        cdf = _cdf_from_density(grid, dens)
        assert abs(cdf[-1] - n) < 0.06 * n

    def test_callable_without_bounds_rejected(self):
        with pytest.raises(ValueError):
            kpm_density(lambda x: x, RNGState.from_key(1), n=32)

    def test_agrees_with_slq(self):
        n = 256
        lam = np.linspace(0.0, 2.0, n) ** 2
        a, lam = _sym_with_spectrum(lam, seed=18)
        st = RNGState.from_key(19)
        g1, d1, _ = spectral_density(a, st, probes=16, steps=60)
        g2, d2, _ = kpm_density(a, st, degree=160, probes=16)
        c1 = _cdf_from_density(g1, d1)
        c2 = _cdf_from_density(g2, d2)
        # compare CDFs on the overlapping range via interpolation
        lo = max(float(g1[0]), float(g2[0]))
        hi = min(float(g1[-1]), float(g2[-1]))
        xs = np.linspace(lo, hi, 101)
        f1 = np.interp(xs, np.asarray(g1), c1)
        f2 = np.interp(xs, np.asarray(g2), c2)
        assert np.max(np.abs(f1 - f2)) < 0.08 * n


class TestJit:
    def test_slq_density_jits(self):
        n = 128
        lam = np.linspace(1.0, 2.0, n)
        a, _ = _sym_with_spectrum(lam, seed=20)
        grid = jnp.linspace(0.5, 2.5, 101)

        @jax.jit
        def run(mat):
            _, dens, _ = spectral_density(mat, RNGState.from_key(21),
                                          probes=4, steps=20,
                                          grid=grid, sigma=0.05)
            return dens

        d = run(a)
        assert np.isfinite(np.asarray(d)).all()

    def test_kpm_density_jits(self):
        n = 128
        lam = np.linspace(1.0, 2.0, n)
        a, _ = _sym_with_spectrum(lam, seed=22)
        grid = jnp.linspace(0.5, 2.5, 101)

        @jax.jit
        def run(mat):
            _, dens, _ = kpm_density(mat, RNGState.from_key(23),
                                     degree=64, probes=4,
                                     bounds=(0.5, 2.5), grid=grid)
            return dens

        d = run(a)
        assert np.isfinite(np.asarray(d)).all()
