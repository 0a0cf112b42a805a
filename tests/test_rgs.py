"""Randomized Gram-Schmidt QR (linalg/rgs.py): factorization contract,
stability at condition numbers where CholQR's Gram is f32-singular,
panel/remainder handling, embedding families, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import RNGState
from randblas_tpu.linalg.rgs import rgs_qr


def _tall(m, k, cond=10.0, seed=0):
    """(m, k) matrix with geometric spectrum of condition `cond`."""
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, k)))
    v, _ = np.linalg.qr(rng.standard_normal((k, k)))
    s = cond ** (-np.arange(k) / (k - 1))
    return jnp.asarray((u * s) @ v.T, jnp.float32)


def _checks(a, q, r, *, orth_tol, rec_tol):
    an = np.asarray(a, np.float64)
    qn = np.asarray(q, np.float64)
    rn = np.asarray(r, np.float64)
    k = rn.shape[0]
    assert np.linalg.norm(qn @ rn - an) / np.linalg.norm(an) < rec_tol
    assert np.linalg.norm(qn.T @ qn - np.eye(k), 2) < orth_tol
    assert np.allclose(rn, np.triu(rn)), "R not upper triangular"


class TestBasic:
    def test_well_conditioned(self):
        a = _tall(512, 96, cond=100.0, seed=1)
        q, r, _ = rgs_qr(a, RNGState.from_key(2))
        _checks(a, q, r, orth_tol=1e-5, rec_tol=1e-5)

    def test_remainder_panel(self):
        # k = 100 with block 64: one full panel + a 36-column remainder
        a = _tall(384, 100, cond=50.0, seed=3)
        q, r, _ = rgs_qr(a, RNGState.from_key(4), block=64)
        _checks(a, q, r, orth_tol=1e-5, rec_tol=1e-5)

    def test_single_panel(self):
        a = _tall(256, 32, cond=10.0, seed=5)
        q, r, _ = rgs_qr(a, RNGState.from_key(6), block=64)
        _checks(a, q, r, orth_tol=1e-5, rec_tol=1e-5)

    def test_final_sketch_mode(self):
        a = _tall(512, 64, cond=100.0, seed=7)
        # d = 8k: subspace distortion eps ~ sqrt(k/d) ~ 0.35, so
        # sigma(Q) in [1/sqrt(1+eps), 1/sqrt(1-eps)] -> cond(Q) < ~2.2
        q, r, _ = rgs_qr(a, RNGState.from_key(8), final="sketch",
                         d=512)
        an = np.asarray(a, np.float64)
        qn = np.asarray(q, np.float64)
        rn = np.asarray(r, np.float64)
        assert np.linalg.norm(qn @ rn - an) / np.linalg.norm(an) < 1e-5
        # Q only sketch-orthonormal: well-conditioned (vs cond(A)=100),
        # not orthonormal
        s = np.linalg.svd(qn, compute_uv=False)
        assert s[0] / s[-1] < 3.0

    def test_embedding_families(self):
        a = _tall(512, 64, cond=100.0, seed=9)
        for op in ("gaussian", "saso", "srht"):
            q, r, _ = rgs_qr(a, RNGState.from_key(10), operator=op)
            _checks(a, q, r, orth_tol=2e-5, rec_tol=2e-5)


class TestIllConditioned:
    def test_survives_cholqr_killing_cond(self):
        """cond(A) ~ 3e7 in f32: Gram cond ~ 1e15 — CholQR's Cholesky
        sees a numerically singular (indefinite-after-rounding) matrix,
        while RGS orthogonalizes in sketch space and stays stable."""
        a = _tall(768, 64, cond=3e7, seed=11)
        g = jnp.matmul(a.T, a, precision=jax.lax.Precision.HIGHEST)
        c = np.asarray(jnp.linalg.cholesky(g))
        assert np.isnan(c).any(), "premise: plain CholQR Gram breaks"

        q, r, _ = rgs_qr(a, RNGState.from_key(12))
        an = np.asarray(a, np.float64)
        qn = np.asarray(q, np.float64)
        rn = np.asarray(r, np.float64)
        assert np.linalg.norm(qn @ rn - an) / np.linalg.norm(an) < 1e-4
        assert np.linalg.norm(qn.T @ qn - np.eye(64), 2) < 1e-3

    def test_cond_1e6_tight(self):
        a = _tall(512, 96, cond=1e6, seed=13)
        q, r, _ = rgs_qr(a, RNGState.from_key(14))
        _checks(a, q, r, orth_tol=1e-4, rec_tol=1e-4)


class TestContract:
    def test_seed_chaining(self):
        a = _tall(256, 32, seed=15)
        st = RNGState.from_key(16)
        q1, r1, nxt = rgs_qr(a, st)
        assert nxt.to_dict() != st.to_dict()
        # same state -> bitwise same factors
        q2, r2, _ = rgs_qr(a, st)
        assert np.array_equal(np.asarray(q1), np.asarray(q2))
        assert np.array_equal(np.asarray(r1), np.asarray(r2))

    def test_validates(self):
        st = RNGState.from_key(0)
        with pytest.raises(ValueError):
            rgs_qr(jnp.ones((8, 16)), st)          # wide
        with pytest.raises(ValueError):
            rgs_qr(jnp.ones((16,)), st)            # 1-D
        with pytest.raises(ValueError):
            rgs_qr(jnp.ones((16, 8)), st, final="bogus")
        with pytest.raises(ValueError):
            rgs_qr(jnp.ones((16, 8)), st, d=4)     # d < k

    def test_jits(self):
        a = _tall(256, 32, seed=17)

        @jax.jit
        def run(mat):
            q, r, _ = rgs_qr(mat, RNGState.from_key(18), block=16)
            return q, r

        q, r = run(a)
        _checks(a, q, r, orth_tol=1e-5, rec_tol=1e-5)


class TestPreciseSketchStructured:
    """_precise_sketch keeps structured families structured (advisor r5):
    SRHT via HIGHEST-precision Hadamard stages, SASO beyond the dense
    footprint cap via the exact segment-sum apply — neither materializes
    the (d, m) operator."""

    def test_saso_beyond_cap_matches_dense_branch(self, monkeypatch):
        import randblas_tpu.linalg.rgs as rgs_mod
        from randblas_tpu.linalg.embed import make_embedding
        m, n, d = 512, 17, 40
        S = make_embedding("saso", d, m, RNGState.from_key(5))
        a = jnp.asarray(np.random.default_rng(0).normal(
            size=(m, n)).astype(np.float32))
        want = np.asarray(rgs_mod._precise_sketch(S, a, 0.5))
        monkeypatch.setattr(rgs_mod, "_FOOTPRINT_CAP", 100)
        got = np.asarray(rgs_mod._precise_sketch(S, a, 0.5))
        # segment-sum adds of +-1-weighted rows vs HIGHEST GEMM: both
        # f32 products, but the summation ORDER differs, so allow a few
        # k*eps rounding steps (measured max ~3e-6 abs / 8e-5 rel)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_srht_structured_apply(self):
        import randblas_tpu.linalg.rgs as rgs_mod
        from randblas_tpu.linalg.embed import make_embedding
        m, n, d = 96, 9, 24
        S = make_embedding("srht", d, m, RNGState.from_key(8))
        a = jnp.asarray(np.random.default_rng(1).normal(
            size=(m, n)).astype(np.float32))
        got = np.asarray(rgs_mod._precise_sketch(S, a, 0.25))
        want = 0.25 * (np.asarray(S.materialize(), np.float64)
                       @ np.asarray(a, np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_rgs_qr_saso_runs_the_capped_branch(self, monkeypatch):
        import randblas_tpu.linalg.rgs as rgs_mod
        monkeypatch.setattr(rgs_mod, "_FOOTPRINT_CAP", 10)
        a = _tall(256, 48, cond=1e3, seed=4)
        q, r, _ = rgs_qr(a, RNGState.from_key(6), operator="saso")
        _checks(a, q, r, orth_tol=1e-5, rec_tol=1e-5)
