"""Tests for the linalg extensions: trace estimation (Hutchinson /
Hutch++), Nyström PSD approximation, randomized SVD, and sketched
leverage scores.

These are downstream consumers of the sketching core, so the tests pin
(a) statistical accuracy against exact dense answers on controlled
spectra and (b) the library's reproducibility contract (same state ->
same estimate; next_state chains).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import randblas_tpu as rbt
from randblas_tpu import linalg as rla
from randblas_tpu.sparse_data import COOMatrix


def _psd(n, rank, seed, decay=0.5):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, rank)))
    lam = decay ** np.arange(rank)
    a = (q * lam) @ q.T
    return a.astype(np.float32), lam


# ---------------------------------------------------------------- trace

def test_hutchinson_converges():
    a, lam = _psd(96, 96, seed=0, decay=0.97)
    want = lam.sum()
    est, nxt = rla.hutchinson(jnp.asarray(a), 96, 400, rbt.default_state(1))
    assert abs(float(est) - want) / want < 0.08
    assert nxt.to_dict() != rbt.default_state(1).to_dict()


def test_hutchinson_matvec_and_reproducible():
    a, lam = _psd(64, 64, seed=1, decay=0.9)
    aj = jnp.asarray(a)
    st = rbt.default_state(7)
    e1, _ = rla.hutchinson(aj, 64, 64, st)
    e2, _ = rla.hutchinson(lambda x: aj @ x, 64, 64, st)
    assert float(e1) == float(e2)  # same probes, same arithmetic


def test_hutchpp_beats_hutchinson_on_decaying_spectrum():
    # fast spectral decay: Hutch++ captures the top space exactly
    a, lam = _psd(128, 128, seed=2, decay=0.6)
    want = lam.sum()
    errs_h, errs_hpp = [], []
    for s in range(5):
        eh, _ = rla.hutchinson(jnp.asarray(a), 128, 48,
                               rbt.default_state(10 + s))
        ehpp, _ = rla.hutchpp(jnp.asarray(a), 128, 48,
                              rbt.default_state(10 + s))
        errs_h.append(abs(float(eh) - want))
        errs_hpp.append(abs(float(ehpp) - want))
    assert np.mean(errs_hpp) < np.mean(errs_h)
    assert np.mean(errs_hpp) / want < 0.02


def test_exact_trace_sparse():
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 50, 300).astype(np.int32)
    cols = rng.integers(0, 50, 300).astype(np.int32)
    vals = rng.normal(size=300).astype(np.float32)
    coo = COOMatrix(jnp.asarray(rows), jnp.asarray(cols),
                    jnp.asarray(vals), 50, 50)
    dense = np.zeros((50, 50), np.float32)
    np.add.at(dense, (rows, cols), vals)
    np.testing.assert_allclose(float(rla.exact_trace(coo)),
                               np.trace(dense), rtol=1e-5)


def test_hutchinson_on_sparse_container():
    rng = np.random.default_rng(4)
    n = 80
    rows = rng.integers(0, n, 600).astype(np.int32)
    cols = rng.integers(0, n, 600).astype(np.int32)
    vals = rng.normal(size=600).astype(np.float32)
    coo = COOMatrix(jnp.asarray(rows), jnp.asarray(cols),
                    jnp.asarray(vals), n, n)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), vals)
    est, _ = rla.hutchinson(coo, n, 600, rbt.default_state(5))
    want = np.trace(dense)
    scale = np.abs(dense).sum() / n  # offdiag-dominated: loose check
    assert abs(float(est) - want) < 6 * scale


# -------------------------------------------------------------- nystrom

def test_nystrom_exact_on_low_rank():
    a, lam = _psd(120, 12, seed=5)
    u, lam_hat, nxt = rla.nystrom(jnp.asarray(a), 24, rbt.default_state(6))
    approx = np.asarray(rla.nystrom_apply(u, lam_hat, jnp.eye(120)))
    err = np.abs(approx - a).max() / np.abs(a).max()
    assert err < 1e-3, err
    # orthonormal factor
    gram = np.asarray(u.T @ u)
    np.testing.assert_allclose(gram, np.eye(24), atol=1e-3)
    assert nxt.to_dict() != rbt.default_state(6).to_dict()


def test_nystrom_truncates_spectrum():
    a, lam = _psd(100, 40, seed=7, decay=0.8)
    u, lam_hat, _ = rla.nystrom(jnp.asarray(a), 20, rbt.default_state(8))
    # top eigenvalues recovered within the tail energy
    tail = lam[20:].sum()
    np.testing.assert_allclose(np.sort(np.asarray(lam_hat))[::-1][:5],
                               lam[:5], atol=2 * tail)


def test_nystrom_jits():
    a, _ = _psd(64, 8, seed=9)
    aj = jnp.asarray(a)
    st = rbt.default_state(10)
    u1, l1, _ = rla.nystrom(aj, 16, st)
    u2, l2 = jax.jit(lambda x: rla.nystrom(x, 16, st)[:2])(aj)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


# ----------------------------------------------------------------- rsvd

@pytest.mark.parametrize("operator", ["gaussian", "saso", "srht"])
@pytest.mark.slow
def test_rsvd_recovers_low_rank(operator):
    rng = np.random.default_rng(11)
    m, n, r = 200, 90, 10
    u0, _ = np.linalg.qr(rng.normal(size=(m, r)))
    v0, _ = np.linalg.qr(rng.normal(size=(n, r)))
    s0 = np.linspace(5.0, 1.0, r)
    a = (u0 * s0) @ v0.T
    a = a.astype(np.float32)
    u, s, vt = rla.rsvd(jnp.asarray(a), r, rbt.default_state(12),
                        oversample=6, power_iters=2, operator=operator)
    np.testing.assert_allclose(np.asarray(s), s0, rtol=1e-3)
    approx = np.asarray(u) * np.asarray(s) @ np.asarray(vt)
    assert np.abs(approx - a).max() < 1e-3


def test_rangefinder_rejects_non_gaussian_sparse():
    from randblas_tpu.sparse_data.coo import COOMatrix
    a = COOMatrix.from_dense(jnp.eye(20, dtype=jnp.float32))
    with pytest.raises(ValueError, match="gaussian"):
        rla.rangefinder(a, 4, rbt.default_state(1), operator="srht")


def test_rsvd_sparse_data():
    rng = np.random.default_rng(13)
    m, n = 150, 60
    # rank-5 sparse-ish matrix: outer products with sparse supports
    dense = np.zeros((m, n), np.float32)
    for j in range(5):
        ridx = rng.choice(m, 30, replace=False)
        cidx = rng.choice(n, 12, replace=False)
        dense[np.ix_(ridx, cidx)] += rng.normal() * np.outer(
            rng.normal(size=30), rng.normal(size=12)).astype(np.float32)
    rr, cc = np.nonzero(dense)
    coo = COOMatrix(jnp.asarray(rr.astype(np.int32)),
                    jnp.asarray(cc.astype(np.int32)),
                    jnp.asarray(dense[rr, cc]), m, n)
    u, s, vt = rla.rsvd(coo, 5, rbt.default_state(14), oversample=5)
    want = np.linalg.svd(dense, compute_uv=False)[:5]
    np.testing.assert_allclose(np.asarray(s), want, rtol=1e-2)


def test_rsvd_validates():
    a = jnp.zeros((20, 10))
    with pytest.raises(ValueError):
        rla.rsvd(a, 8, rbt.default_state(0), oversample=8)  # k > min dim


# ------------------------------------------------------------- leverage

@pytest.mark.parametrize("operator", ["saso", "gaussian", "srht"])
@pytest.mark.slow
def test_leverage_scores_close_to_exact(operator):
    rng = np.random.default_rng(15)
    m, n = 400, 20
    a = rng.normal(size=(m, n)).astype(np.float32)
    a[:5] *= 20.0  # a few high-leverage rows
    want = np.asarray(rla.exact_leverage_scores(jnp.asarray(a)))
    got, nxt = rla.leverage_scores(jnp.asarray(a), rbt.default_state(16),
                                   embed_factor=6, operator=operator)
    got = np.asarray(got)
    # relative error on the meaningful (large) scores
    big = want > np.median(want)
    rel = np.abs(got[big] - want[big]) / want[big]
    assert np.quantile(rel, 0.9) < 0.6, rel.max()
    # ranking preserved: top-5 high-leverage rows identified
    assert set(np.argsort(got)[-5:]) == set(np.argsort(want)[-5:])
    assert nxt.to_dict() != rbt.default_state(16).to_dict()


@pytest.mark.slow
def test_leverage_scores_jl_estimates_norms():
    rng = np.random.default_rng(17)
    m, n = 300, 32
    a = rng.normal(size=(m, n)).astype(np.float32)
    a[:3] *= 15.0
    want = np.asarray(rla.exact_leverage_scores(jnp.asarray(a)))
    got, _ = rla.leverage_scores(jnp.asarray(a), rbt.default_state(18),
                                 embed_factor=6, jl_dim=16)
    got = np.asarray(got)
    assert set(np.argsort(got)[-3:]) == set(np.argsort(want)[-3:])


def test_leverage_scores_validates():
    with pytest.raises(ValueError):
        rla.leverage_scores(jnp.zeros((10, 20)), rbt.default_state(0))


# ---------------------------------------------------------- nystrom_pcg

def _regularized_system(n, rank, mu, seed):
    """Ill-conditioned PSD A (fast-decaying spectrum) + mu ridge."""
    a, lam = _psd(n, rank, seed=seed, decay=0.45)
    rng = np.random.default_rng(seed + 1)
    x_true = rng.normal(size=(n,)).astype(np.float32)
    b = (a + mu * np.eye(n, dtype=np.float32)) @ x_true
    return jnp.asarray(a), jnp.asarray(b), x_true


@pytest.mark.slow
def test_nystrom_pcg_solves_regularized_system():
    mu = 1e-4
    a, b, x_true = _regularized_system(200, 30, mu, seed=11)
    x, iters, nxt = rla.nystrom_pcg(a, b, rbt.default_state(12), d=40,
                                    mu=mu, tol=1e-6)
    res = np.asarray(a @ x + mu * x - b)
    assert np.linalg.norm(res) / np.linalg.norm(np.asarray(b)) < 1e-5
    assert nxt.to_dict() != rbt.default_state(12).to_dict()


@pytest.mark.slow
def test_nystrom_pcg_beats_plain_cg_iterations():
    # spectrum decays over ~13 orders: plain CG on (A + mu I) crawls,
    # the Nystrom-preconditioned system converges spectrum-independently
    mu = 1e-6
    a, b, _ = _regularized_system(240, 60, mu, seed=13)

    # plain CG = nystrom_pcg with an identity preconditioner is not
    # exposed; run the same while_loop via d=1 (near-useless sketch)
    _, iters_bad, _ = rla.nystrom_pcg(a, b, rbt.default_state(14), d=1,
                                      mu=mu, tol=1e-6, maxiter=400)
    x, iters_good, _ = rla.nystrom_pcg(a, b, rbt.default_state(14), d=60,
                                       mu=mu, tol=1e-6, maxiter=400)
    assert int(iters_good) < int(iters_bad) / 2, (iters_good, iters_bad)
    res = np.asarray(a @ x + mu * x - b)
    assert np.linalg.norm(res) / np.linalg.norm(np.asarray(b)) < 1e-4


@pytest.mark.slow
def test_nystrom_pcg_block_rhs_and_callable():
    mu = 1e-3
    a, b, _ = _regularized_system(160, 24, mu, seed=15)
    bb = jnp.stack([b, 2.0 * b], axis=1)
    x_blk, _, _ = rla.nystrom_pcg(lambda x: a @ x, bb,
                                  rbt.default_state(16), d=32, mu=mu,
                                  tol=1e-6)
    assert x_blk.shape == (160, 2)
    res = np.asarray(a @ x_blk + mu * x_blk - bb)
    assert np.abs(res).max() / np.abs(np.asarray(bb)).max() < 1e-4
    # column 2 of the solution is exactly 2x column 1's system
    np.testing.assert_allclose(np.asarray(x_blk[:, 1]),
                               2 * np.asarray(x_blk[:, 0]), rtol=1e-3,
                               atol=1e-5)


def test_nystrom_callable_needs_n():
    with pytest.raises(ValueError):
        rla.nystrom(lambda x: x, 4, rbt.default_state(17))


# ------------------------------------------------------------- rand_eigh

def _symmetric_indefinite(n, lam, seed):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, len(lam))))
    a = (q * lam) @ q.T
    return a.astype(np.float32), q, np.asarray(lam, np.float32)


@pytest.mark.slow
def test_rand_eigh_signed_spectrum_exact_rank():
    lam = np.array([6.0, -5.0, 3.5, -2.0, 1.0])
    a, _, _ = _symmetric_indefinite(180, lam, seed=21)
    w, u = rla.rand_eigh(jnp.asarray(a), 5, rbt.default_state(22))
    np.testing.assert_allclose(np.sort(np.asarray(w)), np.sort(lam),
                               atol=1e-3)
    # reconstruction and orthonormality
    approx = np.asarray(u) * np.asarray(w) @ np.asarray(u).T
    np.testing.assert_allclose(approx, a, atol=2e-3)
    np.testing.assert_allclose(np.asarray(u.T @ u), np.eye(5), atol=1e-4)


def test_rand_eigh_dominant_modes_under_noise():
    lam = np.array([10.0, -9.0, 4.0, -3.0])
    a, _, _ = _symmetric_indefinite(150, lam, seed=23)
    a = a + 1e-3 * _symmetric_indefinite(
        150, np.ones(150) * 0.5, seed=24)[0]
    w, _ = rla.rand_eigh(jnp.asarray(a), 4, rbt.default_state(25),
                         power_iters=3)
    np.testing.assert_allclose(np.sort(np.asarray(w)), np.sort(lam),
                               atol=0.05)


@pytest.mark.slow
def test_rand_eigh_sparse_container():
    lam = np.array([4.0, -3.0, 2.0])
    a, _, _ = _symmetric_indefinite(120, lam, seed=26)
    coo = COOMatrix.from_dense(jnp.asarray(a))
    w, u = rla.rand_eigh(coo, 3, rbt.default_state(27))
    np.testing.assert_allclose(np.sort(np.asarray(w)), np.sort(lam),
                               atol=1e-3)


def test_rand_eigh_validates():
    with pytest.raises(ValueError):
        rla.rand_eigh(jnp.zeros((4, 5), jnp.float32), 2,
                      rbt.default_state(1))


@pytest.mark.slow
def test_nystrom_pcg_rank_deficient_mu_zero():
    """Review regression: mu=0 with a Nystrom tail that clamps to exactly
    zero used to produce a 0/0 = NaN preconditioner and silently return
    x = 0 after zero iterations. Now the head-solve warm start lands the
    exact solution (possibly with zero CG iterations) and nothing is NaN.
    """
    # exact rank 10 < d=20: lam[-1] clamps to 0
    a, _ = _psd(120, 10, seed=31)
    rng = np.random.default_rng(32)
    x_true = np.asarray(a @ rng.normal(size=120).astype(np.float32))
    b = jnp.asarray(a @ x_true)        # b in range(A): consistent system
    x, iters, _ = rla.nystrom_pcg(jnp.asarray(a), b,
                                  rbt.default_state(33), d=20, mu=0.0)
    assert np.all(np.isfinite(np.asarray(x)))
    assert float(jnp.linalg.norm(x)) > 0.0
    res = np.linalg.norm(np.asarray(a @ x) - np.asarray(b))
    assert res / np.linalg.norm(np.asarray(b)) < 1e-4


class TestRandGeigh:
    """rand_geigh: randomized symmetric-definite generalized
    eigensolver (round 4). Oracle: scipy.linalg.eigh(a, b)."""

    def _pencil(self, n=120, k=6, seed=0):
        rng = np.random.default_rng(seed)
        g = rng.normal(size=(n, n)).astype(np.float32)
        b = g @ g.T / n + np.eye(n, dtype=np.float32)
        # plant: whitened form has exact rank k with known spectrum
        ell = np.linalg.cholesky(b.astype(np.float64))
        u, _ = np.linalg.qr(rng.normal(size=(n, k)))
        theta = np.linspace(5.0, -3.0, k)
        c = (u * theta) @ u.T
        a = (ell @ c @ ell.T).astype(np.float32)
        return jnp.asarray(a), jnp.asarray(b), theta

    @pytest.mark.slow
    def test_recovers_planted_pencil(self):
        from randblas_tpu.linalg import rand_geigh
        a, b, theta = self._pencil()
        w, x = rand_geigh(a, b, 6, rbt.default_state(21))
        np.testing.assert_allclose(np.sort(np.asarray(w)),
                                   np.sort(theta), atol=2e-3)
        # B-orthonormal eigenvectors, and A x = theta B x holds
        xn = np.asarray(x, np.float64)
        bn = np.asarray(b, np.float64)
        np.testing.assert_allclose(xn.T @ bn @ xn, np.eye(6), atol=1e-3)
        resid = np.asarray(a, np.float64) @ xn - bn @ xn * np.asarray(w)
        assert np.abs(resid).max() < 2e-3

    def test_matches_scipy_dense_oracle(self):
        import scipy.linalg
        from randblas_tpu.linalg import rand_geigh
        a, b, _ = self._pencil(n=80, k=4, seed=3)
        w, x = rand_geigh(a, b, 4, rbt.default_state(22))
        w_all = scipy.linalg.eigh(np.asarray(a, np.float64),
                                  np.asarray(b, np.float64),
                                  eigvals_only=True)
        dominant = w_all[np.argsort(-np.abs(w_all))[:4]]
        np.testing.assert_allclose(np.sort(np.asarray(w)),
                                   np.sort(dominant), atol=2e-3)

    @pytest.mark.slow
    def test_identity_b_reduces_to_rand_eigh(self):
        from randblas_tpu.linalg import rand_eigh, rand_geigh
        rng = np.random.default_rng(5)
        g = rng.normal(size=(60, 5)).astype(np.float32)
        a = jnp.asarray(g @ np.diag([4, 3, -2, 1, -1]).astype(
            np.float32) @ g.T / 60)
        w1, u1 = rand_eigh(a, 5, rbt.default_state(23))
        w2, x2 = rand_geigh(a, jnp.eye(60), 5, rbt.default_state(23))
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                   atol=1e-4)

    def test_jits_end_to_end(self):
        from randblas_tpu.linalg import rand_geigh
        a, b, theta = self._pencil(n=64, k=3, seed=7)
        f = jax.jit(lambda aa, bb: rand_geigh(
            aa, bb, 3, rbt.default_state(24))[0])
        hlo = jax.jit(lambda aa, bb: rand_geigh(
            aa, bb, 3, rbt.default_state(24))[0]).lower(a, b).as_text()
        assert "custom_call" not in hlo or "callback" not in hlo
        np.testing.assert_allclose(np.sort(np.asarray(f(a, b))),
                                   np.sort(theta), atol=2e-3)

    def test_validates(self):
        from randblas_tpu.linalg import rand_geigh
        a, b, _ = self._pencil(n=40, k=2)
        with pytest.raises(ValueError):
            rand_geigh(a[:, :20], b, 2, rbt.default_state(1))
        with pytest.raises(ValueError):
            rand_geigh(a, b[:20, :20], 2, rbt.default_state(1))
        with pytest.raises(ValueError):
            rand_geigh(a, b, 0, rbt.default_state(1))


# ------------------------------------------------- xtrace / diag / xdiag

class TestXTrace:
    """Leave-one-out trace estimation (trace.py::xtrace)."""

    def test_beats_hutchinson_on_decaying_spectrum(self):
        a, lam = _psd(200, 200, seed=5, decay=0.8)
        want = lam.sum()
        errs_h, errs_x, sders = [], [], []
        for s in range(5):
            eh, _ = rla.hutchinson(jnp.asarray(a), 200, 48,
                                   rbt.default_state(20 + s))
            ex, se, _ = rla.xtrace(jnp.asarray(a), 200, 48,
                                   rbt.default_state(20 + s))
            errs_h.append(abs(float(eh) - want))
            errs_x.append(abs(float(ex) - want))
            sders.append(float(se))
        assert np.mean(errs_x) < 0.2 * np.mean(errs_h)
        assert np.mean(errs_x) / want < 0.01
        # the built-in stderr is an honest error bar
        assert np.mean(errs_x) < 5 * np.mean(sders)

    def test_matches_across_input_kinds_and_chains_state(self):
        a, _ = _psd(96, 96, seed=6, decay=0.9)
        aj = jnp.asarray(a)
        st = rbt.default_state(30)
        e1, s1, nxt1 = rla.xtrace(aj, 96, 32, st)
        e2, s2, nxt2 = rla.xtrace(lambda x: aj @ x, 96, 32, st)
        assert float(e1) == float(e2) and float(s1) == float(s2)
        assert nxt1.to_dict() == nxt2.to_dict()
        assert nxt1.to_dict() != st.to_dict()

    def test_sparse_container(self):
        rng = np.random.default_rng(7)
        n = 120
        rows = rng.integers(0, n, 900).astype(np.int32)
        cols = rng.integers(0, n, 900).astype(np.int32)
        vals = rng.normal(size=900).astype(np.float32) / n
        coo = COOMatrix(jnp.asarray(rows), jnp.asarray(cols),
                        jnp.asarray(vals), n, n)
        dense = np.zeros((n, n), np.float32)
        np.add.at(dense, (rows, cols), vals)
        dense += 2.0 * np.eye(n, dtype=np.float32)
        coo_shift = lambda x: rla.qb._apply(coo, x) + 2.0 * x  # noqa: E731
        want = np.trace(dense)
        ex, se, _ = rla.xtrace(coo_shift, n, 64, rbt.default_state(40))
        assert abs(float(ex) - want) < max(5 * float(se), 0.05 * abs(want))

    def test_nonsymmetric_general_a(self):
        rng = np.random.default_rng(8)
        n = 150
        b = (rng.standard_normal((n, n)).astype(np.float32) / n
             + np.diag(np.linspace(1.0, 3.0, n)).astype(np.float32))
        want = float(np.trace(b))
        ex, se, _ = rla.xtrace(jnp.asarray(b), n, 80, rbt.default_state(50))
        assert abs(float(ex) - want) < max(6 * float(se), 0.02 * abs(want))

    def test_rank_deficient_stays_finite(self):
        # rank(A) << m makes trailing diag(R) ~ 0: the _loo_directions
        # floor must keep the solve finite (and the estimate exact-ish,
        # since the range is fully captured).
        a, lam = _psd(100, 5, seed=9, decay=0.5)
        ex, se, _ = rla.xtrace(jnp.asarray(a), 100, 40,
                               rbt.default_state(60))
        assert np.isfinite(float(ex)) and np.isfinite(float(se))
        assert abs(float(ex) - lam.sum()) / lam.sum() < 1e-3

    def test_matvec_budget(self):
        """xtrace must spend exactly num_matvecs//2 * 2 applications."""
        n, budget = 64, 24
        a, _ = _psd(n, n, seed=10, decay=0.9)
        aj = jnp.asarray(a)
        cols = []
        def counting(x):
            cols.append(x.shape[1])
            return aj @ x
        rla.xtrace(counting, n, budget, rbt.default_state(70))
        assert sum(cols) == (budget // 2) * 2


class TestDiagEstimation:
    """BKS diag_hutchinson and leave-one-out xdiag (trace.py)."""

    def test_bks_converges_and_reproducible(self):
        a, _ = _psd(96, 96, seed=11, decay=0.95)
        aj = jnp.asarray(a)
        st = rbt.default_state(80)
        d1, nxt = rla.diag_hutchinson(aj, 96, 400, st)
        d2, _ = rla.diag_hutchinson(lambda x: aj @ x, 96, 400, st)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        assert nxt.to_dict() != st.to_dict()
        err = np.linalg.norm(np.asarray(d1) - np.diag(a))
        assert err / np.linalg.norm(np.diag(a)) < 0.2

    def test_xdiag_beats_bks_on_decaying_spectrum(self):
        a, _ = _psd(200, 200, seed=12, decay=0.8)
        aj = jnp.asarray(a)
        dtrue = np.diag(a)
        errs_b, errs_x = [], []
        for s in range(5):
            db, _ = rla.diag_hutchinson(aj, 200, 48,
                                        rbt.default_state(90 + s))
            dx, _ = rla.xdiag(aj, 200, 48, rbt.default_state(90 + s))
            errs_b.append(np.linalg.norm(np.asarray(db) - dtrue))
            errs_x.append(np.linalg.norm(np.asarray(dx) - dtrue))
        assert np.mean(errs_x) < 0.25 * np.mean(errs_b)

    def test_xdiag_nonsymmetric_rmatvec(self):
        rng = np.random.default_rng(13)
        n = 100
        b = (rng.standard_normal((n, n)).astype(np.float32) * 0.05
             + np.diag(np.linspace(1.0, 2.0, n)).astype(np.float32))
        bj = jnp.asarray(b)
        st = rbt.default_state(100)
        # array path (transpose derived) == callable path (explicit rmatvec)
        d1, _ = rla.xdiag(bj, n, 40, st)
        d2, _ = rla.xdiag(lambda x: bj @ x, n, 40, st,
                          rmatvec=lambda x: bj.T @ x)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   atol=2e-5)

    def test_xdiag_rank_deficient_exact(self):
        a, _ = _psd(100, 4, seed=14, decay=0.5)
        d, _ = rla.xdiag(jnp.asarray(a), 100, 40, rbt.default_state(110))
        assert np.all(np.isfinite(np.asarray(d)))
        np.testing.assert_allclose(np.asarray(d), np.diag(a), atol=1e-4)

    def test_xdiag_unbiased_on_flat_spectrum(self):
        # the docstring's caveat case: higher variance than BKS, but
        # unbiased — 60-seed average must tighten vs a single run
        rng = np.random.default_rng(15)
        n = 60
        b = (rng.standard_normal((n, n)).astype(np.float32) / n
             + np.diag(np.linspace(1.0, 3.0, n)).astype(np.float32))
        bj = jnp.asarray(b)
        dtrue = np.diag(b)
        acc = np.zeros(n)
        singles = []
        for s in range(60):
            d, _ = rla.xdiag(bj, n, 24, rbt.default_state(200 + s))
            acc += np.asarray(d)
            singles.append(np.linalg.norm(np.asarray(d) - dtrue))
        bias = np.linalg.norm(acc / 60 - dtrue)
        assert bias < 0.4 * np.mean(singles)
