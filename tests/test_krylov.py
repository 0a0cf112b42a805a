"""Tests for linalg/krylov.py (block Krylov rangefinder / rsvd_krylov)
and qb.range_error_estimate.

Model: the reference's QB example assertions (svd_rank1_plus_noise.cc)
on planted spectra, plus the Musco-Musco 2015 claim the tier exists
for — better tail accuracy per pass than power iteration on slowly
decaying spectra.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import randblas_tpu as rbt
from randblas_tpu import RNGState
from randblas_tpu import linalg as rla
from randblas_tpu.sparse_data.coo import COOMatrix


def _spectrum_matrix(m, n, sv, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.normal(size=(m, len(sv))))
    v, _ = np.linalg.qr(rng.normal(size=(n, len(sv))))
    return jnp.asarray((u * sv) @ v.T, jnp.float32)


@pytest.mark.slow
class TestKrylovRangefinder:
    def test_basis_orthonormal_and_captures_range(self):
        sv = np.linspace(8.0, 1.0, 6)
        a = _spectrum_matrix(400, 64, sv, seed=1)
        q = rla.krylov_rangefinder(a, 6, RNGState.from_key(1), depth=2)
        # exact rank 6: the rank cutoff stops the basis at the range —
        # later Krylov blocks carry no new content
        assert q.shape == (400, 6)
        np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(6),
                                   atol=5e-5)
        # rank-6 A: the Krylov basis must contain its range
        res = np.asarray(a) - np.asarray(q) @ (np.asarray(q).T @ np.asarray(a))
        assert np.abs(res).max() < 1e-4

    def test_depth_zero_is_single_pass(self):
        # block 8 > rank 5: the cutoff keeps only the 5 real directions
        a = _spectrum_matrix(200, 40, np.linspace(4, 1, 5), seed=2)
        q = rla.krylov_rangefinder(a, 8, RNGState.from_key(2), depth=0)
        assert q.shape == (200, 5)

    def test_validates(self):
        a = jnp.zeros((20, 10), jnp.float32)
        with pytest.raises(ValueError):
            rla.krylov_rangefinder(a, 4, RNGState.from_key(3), depth=3)

    def test_sparse_data(self):
        rng = np.random.default_rng(4)
        dense = np.zeros((300, 50), np.float32)
        ii = rng.integers(0, 300, 2500)
        jj = rng.integers(0, 50, 2500)
        np.add.at(dense, (ii, jj), rng.normal(size=2500).astype(np.float32))
        coo = COOMatrix.from_dense(jnp.asarray(dense))
        q = rla.krylov_rangefinder(coo, 5, RNGState.from_key(5), depth=1)
        np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(10),
                                   atol=5e-5)


@pytest.mark.slow
class TestRsvdKrylov:
    def test_recovers_planted_spectrum(self):
        sv = np.linspace(10.0, 2.0, 8)
        a = _spectrum_matrix(500, 80, sv, seed=6)
        u, s, vt = rla.rsvd_krylov(a, 8, RNGState.from_key(6), depth=2)
        np.testing.assert_allclose(np.asarray(s), sv, rtol=1e-3)
        approx = np.asarray(u) * np.asarray(s) @ np.asarray(vt)
        np.testing.assert_allclose(approx, np.asarray(a), atol=2e-3)

    def test_beats_power_iteration_on_slow_decay(self):
        # the Musco-Musco regime: slowly decaying spectrum (sv_i =
        # i^-1/2). At EQUAL passes over A (depth == power_iters) the
        # Krylov basis keeps every intermediate block, so its top-k
        # values converge far faster; measured across seeds 1-3 the
        # advantage is 5-100x (0.0002-0.012 vs 0.010-0.031 at depths
        # 2-3), so the 1.0x assertion below is seed-robust.
        rng = np.random.default_rng(7)
        m, n, k = 600, 300, 10
        sv = np.arange(1, n + 1) ** -0.5
        u0, _ = np.linalg.qr(rng.normal(size=(m, n)))
        v0, _ = np.linalg.qr(rng.normal(size=(n, n)))
        a = jnp.asarray((u0 * sv) @ v0.T, jnp.float32)
        ref = sv[:k]
        _, s_kry, _ = rla.rsvd_krylov(a, k, RNGState.from_key(7),
                                      block=k + 2, depth=3)
        _, s_pow, _ = rla.rsvd(a, k, RNGState.from_key(7), oversample=2,
                               power_iters=3)
        err_kry = np.abs(np.asarray(s_kry) - ref).max()
        err_pow = np.abs(np.asarray(s_pow) - ref).max()
        assert err_kry <= err_pow
        assert err_kry < 5e-3

    def test_reproducible(self):
        a = _spectrum_matrix(200, 60, np.linspace(5, 1, 6), seed=8)
        _, s1, _ = rla.rsvd_krylov(a, 6, RNGState.from_key(9))
        _, s2, _ = rla.rsvd_krylov(a, 6, RNGState.from_key(9))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


@pytest.mark.slow
class TestRangeErrorEstimate:
    def test_certifies_captured_range(self):
        sv = np.linspace(6.0, 1.0, 5)
        a = _spectrum_matrix(300, 50, sv, seed=10)
        q = rla.rangefinder(a, 5, RNGState.from_key(10))
        bound, nxt = rla.range_error_estimate(a, q, RNGState.from_key(11))
        # exact rank 5 captured: the certificate must be ~rounding level
        assert float(bound) < 1e-2
        assert nxt.to_dict() != RNGState.from_key(11).to_dict()

    def test_bound_holds_for_truncated_basis(self):
        # basis captures only 3 of 6 directions: the true residual norm
        # is sv[3]; the probabilistic bound must sit above it
        sv = np.linspace(6.0, 1.0, 6)
        a = _spectrum_matrix(300, 50, sv, seed=12)
        q = rla.rangefinder(a, 3, RNGState.from_key(12))
        bound, _ = rla.range_error_estimate(a, q, RNGState.from_key(13))
        an, qn = np.asarray(a, np.float64), np.asarray(q, np.float64)
        true_err = np.linalg.norm(an - qn @ (qn.T @ an), 2)
        assert float(bound) >= true_err
        # and it is not vacuous: within the alpha*sqrt(2/pi)*sqrt(n)
        # worst-case inflation of the truth
        assert float(bound) < 50.0 * true_err

    def test_chains_like_other_estimators(self):
        a = _spectrum_matrix(100, 30, np.linspace(3, 1, 4), seed=14)
        q = rla.rangefinder(a, 4, RNGState.from_key(14))
        b1, n1 = rla.range_error_estimate(a, q, RNGState.from_key(15))
        b2, n2 = rla.range_error_estimate(a, q, RNGState.from_key(15))
        assert float(b1) == float(b2)
        assert n1.to_dict() == n2.to_dict()


@pytest.mark.slow
class TestAdaptiveRangefinder:
    def test_finds_planted_rank(self):
        # rank-12 signal at scale >= 1, noise at 1e-4. The certificate
        # floor sits at ~alpha*sqrt(2/pi)*||E w|| ~ 0.18 for this noise
        # (probe norms concentrate at the FROBENIUS scale — HMT's
        # estimator overestimates by ~||E||_F/||E||_2); a tol above that
        # floor but below the smallest signal value (1.0) must stop
        # within a couple of blocks of the true rank.
        rng = np.random.default_rng(20)
        m, n, r = 400, 120, 12
        u0, _ = np.linalg.qr(rng.normal(size=(m, r)))
        v0, _ = np.linalg.qr(rng.normal(size=(n, r)))
        a = jnp.asarray((u0 * np.linspace(9, 1, r)) @ v0.T
                        + 1e-4 * rng.normal(size=(m, n)), jnp.float32)
        q, bound, nxt = rla.adaptive_rangefinder(a, 0.3,
                                                 RNGState.from_key(20),
                                                 block=8)
        assert float(bound) <= 0.3
        assert r <= q.shape[1] <= r + 16       # within two blocks of rank
        res = np.asarray(a) - np.asarray(q) @ (np.asarray(q).T
                                               @ np.asarray(a))
        assert np.linalg.norm(res, 2) <= 0.3   # certificate is honest
        np.testing.assert_allclose(np.asarray(q.T @ q),
                                   np.eye(q.shape[1]), atol=5e-5)

    def test_max_rank_cap(self):
        rng = np.random.default_rng(21)
        a = jnp.asarray(rng.normal(size=(100, 80)), jnp.float32)
        q, bound, _ = rla.adaptive_rangefinder(a, 1e-6,
                                               RNGState.from_key(21),
                                               block=16, max_rank=32)
        assert q.shape[1] <= 32
        assert float(bound) > 1e-6             # honestly reports failure

    def test_zero_matrix_stops_immediately(self):
        a = jnp.zeros((50, 40), jnp.float32)
        q, bound, _ = rla.adaptive_rangefinder(a, 1e-3,
                                               RNGState.from_key(22))
        assert q.shape[1] == 0
        assert float(bound) <= 1e-3

    def test_chains_state(self):
        rng = np.random.default_rng(23)
        a = jnp.asarray(rng.normal(size=(60, 40)), jnp.float32)
        _, _, n1 = rla.adaptive_rangefinder(a, 1e-2, RNGState.from_key(23),
                                            block=8, max_rank=16)
        _, _, n2 = rla.adaptive_rangefinder(a, 1e-2, RNGState.from_key(23),
                                            block=8, max_rank=16)
        assert n1.to_dict() == n2.to_dict()
        assert n1.to_dict() != RNGState.from_key(23).to_dict()

    def test_unreachable_tol_on_exact_low_rank(self):
        # drive regression: exact rank-10 A with tol below the rounding
        # floor used to QR numerically-zero residual blocks into junk
        # directions — basis grew to the cap, orthonormality collapsed,
        # and the "bound" exploded to ~700. The eps-floor cutoff now
        # stops right after the range is captured.
        rng = np.random.default_rng(24)
        u0, _ = np.linalg.qr(rng.normal(size=(300, 10)))
        v0, _ = np.linalg.qr(rng.normal(size=(80, 10)))
        a = jnp.asarray((u0 * np.linspace(5, 1, 10)) @ v0.T, jnp.float32)
        q, bound, _ = rla.adaptive_rangefinder(a, 1e-12,
                                               RNGState.from_key(24),
                                               block=6)
        assert 10 <= q.shape[1] <= 18
        np.testing.assert_allclose(np.asarray(q.T @ q),
                                   np.eye(q.shape[1]), atol=5e-5)
        res = np.asarray(a) - np.asarray(q) @ (np.asarray(q).T
                                               @ np.asarray(a))
        assert np.linalg.norm(res, 2) < 1e-4


@pytest.mark.slow
def test_rsvd_krylov_rank_above_numerical_rank_pads_with_zeros():
    """Asking for more rank than A has: the basis stops at the numerical
    rank and the extra singular triples come back as exact zeros, never
    junk directions."""
    a = _spectrum_matrix(200, 60, np.linspace(5, 1, 4), seed=30)
    u, s, vt = rla.rsvd_krylov(a, 8, RNGState.from_key(30), block=8,
                               depth=1)
    assert u.shape == (200, 8) and s.shape == (8,) and vt.shape == (8, 60)
    np.testing.assert_allclose(np.asarray(s[:4]), np.linspace(5, 1, 4),
                               rtol=1e-3)
    assert np.all(np.asarray(s[4:]) == 0.0)
    assert np.all(np.asarray(u[:, 4:]) == 0.0)


def test_krylov_scale_invariance():
    """Review regression: the rank cutoff compared sigma^2-scaled loop
    blocks against a sigma^1-scaled absolute cut, so scaling A by 1e-3
    collapsed the basis (48 -> 13 columns) and blew the top-k error up
    430x. Cutoffs are now per-block relative — the basis and its
    accuracy must be scale-invariant."""
    rng = np.random.default_rng(31)
    m, n, k = 400, 200, 8
    sv = np.arange(1, n + 1) ** -0.5
    u0, _ = np.linalg.qr(rng.normal(size=(m, n)))
    v0, _ = np.linalg.qr(rng.normal(size=(n, n)))
    a = jnp.asarray((u0 * sv) @ v0.T, jnp.float32)

    def err(mat, scale):
        _, s, _ = rla.rsvd_krylov(mat, k, RNGState.from_key(31),
                                  block=k + 2, depth=3)
        return np.abs(np.asarray(s) / scale - sv[:k]).max()

    e1 = err(a, 1.0)
    e2 = err(1e-3 * a, 1e-3)
    assert e2 < 10 * max(e1, 1e-4)
    assert e2 < 5e-3


def test_rsvd_adaptive_error_target():
    """rsvd_adaptive finds the rank needed for a certified residual:
    planted rank-9 signal over 1e-4 noise, Frobenius-scale tol."""
    rng = np.random.default_rng(50)
    m, n, r = 300, 100, 9
    u0, _ = np.linalg.qr(rng.normal(size=(m, r)))
    v0, _ = np.linalg.qr(rng.normal(size=(n, r)))
    a = jnp.asarray((u0 * np.linspace(7, 1, r)) @ v0.T
                    + 1e-4 * rng.normal(size=(m, n)), jnp.float32)
    u, s, vt, bound, _ = rla.rsvd_adaptive(a, 0.3, rbt.default_state(51),
                                           block=6)
    assert r <= len(np.asarray(s)) <= r + 12
    assert float(bound) <= 0.3
    np.testing.assert_allclose(np.asarray(s)[:r], np.linspace(7, 1, r),
                               rtol=1e-2)
    approx = np.asarray(u) * np.asarray(s) @ np.asarray(vt)
    assert np.linalg.norm(approx - np.asarray(a), 2) <= 0.3
