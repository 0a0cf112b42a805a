"""Tests for linalg/quadrature.py (stochastic Lanczos quadrature).

Model: controlled spectra with exact tr(f(A)) references, like the rest
of the estimator tier (test_linalg_extras.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import randblas_tpu as rbt
from randblas_tpu import RNGState
from randblas_tpu import linalg as rla
from randblas_tpu.sparse_data.coo import COOMatrix


def _psd(n, lam, seed):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    return jnp.asarray((q * lam) @ q.T, jnp.float32), np.asarray(lam)


class TestLogdet:
    @pytest.mark.slow
    def test_matches_slogdet(self):
        lam = np.linspace(4.0, 0.5, 80)
        a, _ = _psd(80, lam, seed=1)
        est, nxt = rla.logdet(a, rbt.default_state(2), probes=20, steps=25)
        ref = float(np.sum(np.log(lam)))
        assert abs(float(est) - ref) / abs(ref) < 0.05
        assert nxt.to_dict() != rbt.default_state(2).to_dict()

    @pytest.mark.slow
    def test_more_probes_tightens(self):
        # variance-reduction sanity on a fixed matrix: average absolute
        # error over several independent seeds must shrink with probes
        lam = np.linspace(3.0, 0.3, 60)
        a, _ = _psd(60, lam, seed=3)
        ref = float(np.sum(np.log(lam)))

        def mean_err(probes):
            errs = []
            for s in range(5):
                est, _ = rla.logdet(a, rbt.default_state(100 + s),
                                    probes=probes, steps=25)
                errs.append(abs(float(est) - ref))
            return np.mean(errs)

        assert mean_err(32) <= mean_err(2)

    @pytest.mark.slow
    def test_breakdown_is_finite(self):
        # A with only 3 distinct eigenvalues: Lanczos breaks down after
        # 3 steps; spurious zero-weight nodes at theta=0 must not turn
        # log into nan/-inf
        lam = np.repeat([4.0, 2.0, 1.0], 20)
        a, _ = _psd(60, lam, seed=4)
        est, _ = rla.logdet(a, rbt.default_state(5), probes=32, steps=15)
        assert np.isfinite(float(est))
        ref = float(np.sum(np.log(lam)))
        # the quadrature is EXACT here (3 nodes); the residual error is
        # pure Hutchinson variance, ~1/sqrt(probes)
        assert abs(float(est) - ref) / abs(ref) < 0.08


class TestSlqGeneral:
    @pytest.mark.slow
    def test_trace_of_exp(self):
        lam = np.linspace(1.0, -1.0, 50)      # indefinite is fine
        a, _ = _psd(50, lam, seed=6)
        est, _ = rla.slq(a, jnp.exp, rbt.default_state(7), probes=24,
                         steps=20)
        ref = float(np.sum(np.exp(lam)))
        assert abs(float(est) - ref) / ref < 0.08

    @pytest.mark.slow
    def test_identity_recovers_plain_trace(self):
        lam = np.linspace(5.0, 1.0, 40)
        a, _ = _psd(40, lam, seed=8)
        est, _ = rla.slq(a, lambda x: x, rbt.default_state(9), probes=30,
                         steps=12)
        ref = float(np.sum(lam))
        assert abs(float(est) - ref) / ref < 0.1

    @pytest.mark.slow
    def test_callable_and_sparse(self):
        rng = np.random.default_rng(10)
        g = rng.normal(size=(80, 80)).astype(np.float32) / np.sqrt(80)
        spd = g @ g.T + 0.5 * np.eye(80, dtype=np.float32)
        ref = float(np.sum(np.log(np.linalg.eigvalsh(spd))))
        # callable form
        aj = jnp.asarray(spd)
        est_c, _ = rla.logdet(lambda x: aj @ x, rbt.default_state(11),
                              probes=24, steps=30, n=80)
        assert abs(float(est_c) - ref) / abs(ref) < 0.3
        # sparse container form (same matrix, sparsified structure kept
        # dense here — exercising the dispatch path, not sparsity)
        coo = COOMatrix.from_dense(aj)
        est_s, _ = rla.logdet(coo, rbt.default_state(11), probes=24,
                              steps=30)
        np.testing.assert_allclose(float(est_s), float(est_c), rtol=1e-4)

    @pytest.mark.slow
    def test_reproducible_and_validates(self):
        a, _ = _psd(30, np.linspace(2, 1, 30), seed=12)
        e1, n1 = rla.slq(a, jnp.sqrt, rbt.default_state(13), probes=4,
                         steps=8)
        e2, n2 = rla.slq(a, jnp.sqrt, rbt.default_state(13), probes=4,
                         steps=8)
        assert float(e1) == float(e2)
        assert n1.to_dict() == n2.to_dict()
        with pytest.raises(ValueError):
            rla.slq(lambda x: x, jnp.log, rbt.default_state(14))
        with pytest.raises(ValueError):
            rla.slq(a, jnp.log, rbt.default_state(14), steps=0)


class TestLanczosFnApply:
    @pytest.mark.slow
    def test_expm_times_vector(self):
        lam = np.linspace(1.0, -1.0, 40)
        a, _ = _psd(40, lam, seed=20)
        an = np.asarray(a, np.float64)
        w, v = np.linalg.eigh(an)
        rng = np.random.default_rng(21)
        b = jnp.asarray(rng.normal(size=40), jnp.float32)
        x = rla.lanczos_fn_apply(a, jnp.exp, b, steps=25)
        ref = v @ (np.exp(w) * (v.T @ np.asarray(b, np.float64)))
        np.testing.assert_allclose(np.asarray(x), ref, rtol=0, atol=2e-4)

    @pytest.mark.slow
    def test_inverse_sqrt_block(self):
        lam = np.linspace(4.0, 0.5, 50)
        a, _ = _psd(50, lam, seed=22)
        an = np.asarray(a, np.float64)
        w, v = np.linalg.eigh(an)
        rng = np.random.default_rng(23)
        b = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
        x = rla.lanczos_fn_apply(a, lambda t: 1.0 / jnp.sqrt(t), b,
                                 steps=30)
        ref = v @ ((w ** -0.5)[:, None] * (v.T @ np.asarray(b, np.float64)))
        np.testing.assert_allclose(np.asarray(x), ref, rtol=0, atol=5e-4)

    def test_identity_function_reproduces_matvec(self):
        lam = np.linspace(3.0, 1.0, 30)
        a, _ = _psd(30, lam, seed=24)
        rng = np.random.default_rng(25)
        b = jnp.asarray(rng.normal(size=30), jnp.float32)
        x = rla.lanczos_fn_apply(a, lambda t: t, b, steps=15)
        np.testing.assert_allclose(np.asarray(x), np.asarray(a @ b),
                                   rtol=0, atol=2e-4)

    def test_breakdown_finite_log(self):
        # 3 distinct eigenvalues: Lanczos exhausts after 3 steps; log on
        # the spurious zero-weight nodes must not poison the result
        lam = np.repeat([4.0, 2.0, 1.0], 10)
        a, _ = _psd(30, lam, seed=26)
        rng = np.random.default_rng(27)
        b = jnp.asarray(rng.normal(size=30), jnp.float32)
        x = rla.lanczos_fn_apply(a, jnp.log, b, steps=12)
        assert np.all(np.isfinite(np.asarray(x)))
        an = np.asarray(a, np.float64)
        w, v = np.linalg.eigh(an)
        ref = v @ (np.log(w) * (v.T @ np.asarray(b, np.float64)))
        np.testing.assert_allclose(np.asarray(x), ref, rtol=0, atol=2e-4)

    def test_validates(self):
        with pytest.raises(ValueError):
            rla.lanczos_fn_apply(lambda x: x, jnp.exp,
                                 jnp.zeros(4, jnp.float32))
