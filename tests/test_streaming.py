"""Tests for linalg/streaming.py (TYUC17 single-pass / streaming SVD).

Model: the reference's updates.rst streaming scenarios (exactness under
chunking via counter addressing) + planted-spectrum recovery like the
rest of the estimator tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import randblas_tpu as rbt
from randblas_tpu import RNGState
from randblas_tpu import linalg as rla
from randblas_tpu.sparse_data.coo import COOMatrix


def _low_rank(m, n, r, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.normal(size=(m, r)))
    v, _ = np.linalg.qr(rng.normal(size=(n, r)))
    s = np.linspace(10.0, 2.0, r)
    a = (u * s) @ v.T
    if noise:
        a = a + noise * rng.normal(size=(m, n))
    return jnp.asarray(a, jnp.float32), s


class TestSinglePass:
    @pytest.mark.slow
    def test_recovers_planted_spectrum(self):
        a, s_true = _low_rank(500, 120, r=6, noise=1e-4, seed=1)
        u, s, vt, nxt = rla.single_pass_svd(a, 6, RNGState.from_key(1))
        np.testing.assert_allclose(np.asarray(s), s_true, rtol=2e-2)
        approx = np.asarray(u) * np.asarray(s) @ np.asarray(vt)
        # single-pass accuracy ~ (1 + k/(l-k-1)) * tail, not machine eps
        assert np.linalg.norm(approx - np.asarray(a), 2) < 0.05
        assert nxt.to_dict() != RNGState.from_key(1).to_dict()

    @pytest.mark.slow
    def test_sparse_data(self):
        # planted low-rank spike in sparse noise (the low_rank_svd
        # example's matrix family) — single-pass accuracy needs a
        # decaying tail; on a structureless matrix the (Psi Q)^+ noise
        # amplification dominates by design (TYUC17 thm 4.3's tail term)
        rng = np.random.default_rng(2)
        m, n, r = 400, 80, 3
        u0, _ = np.linalg.qr(rng.normal(size=(m, r)))
        v0, _ = np.linalg.qr(rng.normal(size=(n, r)))
        spike = (u0 * np.array([40.0, 30.0, 20.0])) @ v0.T
        mask = rng.random((m, n)) < 0.02
        dense = (spike + np.where(mask, rng.normal(size=(m, n)), 0.0)
                 ).astype(np.float32)
        coo = COOMatrix.from_dense(jnp.asarray(dense))
        # TYUC error is ABSOLUTE at the tail scale, ~(1 + k/(l-k-1)) *
        # ||tail||: the sparse-noise tail here has ||.||_2 ~ 5.6, so
        # assert each value within ~1.2x of that, and the top value
        # (far above the tail) tightly
        u, s, vt, _ = rla.single_pass_svd(coo, r, RNGState.from_key(3),
                                          corange_factor=4.0)
        svals = np.linalg.svd(dense, compute_uv=False)
        ref, tail = svals[:r], svals[r]
        assert np.abs(np.asarray(s) - ref).max() < 1.2 * tail
        assert abs(float(s[0]) - ref[0]) / ref[0] < 0.05

    def test_validates(self):
        with pytest.raises(ValueError):
            rla.single_pass_svd(jnp.zeros((10, 4), jnp.float32), 5,
                                RNGState.from_key(4))


class TestStreamingSketch:
    @pytest.mark.slow
    def test_chunking_invariance(self):
        # counter addressing: the operator slices and the row-partitioned
        # Y buffer are BITWISE identical under any chunking; the W
        # accumulator contracts over the chunked axis, so it is
        # reassociation-equal (f32 rounding), like any split reduction
        a, _ = _low_rank(240, 60, r=5, noise=1e-3, seed=5)
        an = np.asarray(a)

        def run(chunks):
            sk = rla.StreamingSketch(240, 60, 5, RNGState.from_key(6))
            for start, stop in chunks:
                sk.update(start, jnp.asarray(an[start:stop]))
            return sk

        sk1 = run([(0, 240)])
        sk2 = run([(0, 100), (100, 103), (103, 240)])
        sk3 = run([(103, 240), (0, 100), (100, 103)])    # out of order
        np.testing.assert_array_equal(np.asarray(sk1._y),
                                      np.asarray(sk2._y))
        np.testing.assert_array_equal(np.asarray(sk2._y),
                                      np.asarray(sk3._y))
        np.testing.assert_allclose(np.asarray(sk1._w), np.asarray(sk2._w),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sk2._w), np.asarray(sk3._w),
                                   rtol=1e-4, atol=1e-5)
        _, s1, _ = sk1.finalize()
        _, s2, _ = sk2.finalize()
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-4)

    @pytest.mark.slow
    def test_matches_single_pass_svd(self):
        # the streaming accumulator IS single_pass_svd, computed in
        # pieces: same seed, same operators, same answer (f32 matmul
        # chunk-reassociation only)
        a, _ = _low_rank(300, 70, r=6, noise=1e-4, seed=7)
        an = np.asarray(a)
        u0, s0, vt0, _ = rla.single_pass_svd(a, 6, RNGState.from_key(8))
        sk = rla.StreamingSketch(300, 70, 6, RNGState.from_key(8))
        for start in range(0, 300, 64):
            stop = min(start + 64, 300)
            sk.update(start, jnp.asarray(an[start:stop]))
        u1, s1, vt1 = sk.finalize()
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                                   rtol=1e-4)
        np.testing.assert_allclose(
            np.abs(np.asarray(u1.T @ u0).diagonal()), np.ones(6),
            atol=1e-3)

    def test_finalize_guards_unseen_rows(self):
        sk = rla.StreamingSketch(100, 20, 3, RNGState.from_key(9))
        sk.update(0, jnp.zeros((50, 20), jnp.float32))
        with pytest.raises(ValueError):
            sk.finalize()

    def test_next_state_matches_one_shot(self):
        a, _ = _low_rank(128, 32, r=3, seed=10)
        _, _, _, nxt = rla.single_pass_svd(a, 3, RNGState.from_key(11))
        sk = rla.StreamingSketch(128, 32, 3, RNGState.from_key(11))
        assert sk.next_state.to_dict() == nxt.to_dict()

    def test_update_rejects_resubmitted_rows(self):
        # review regression: a re-submitted chunk (retried stream read)
        # silently double-counted W while Y overwrote — now an error
        sk = rla.StreamingSketch(100, 20, 3, RNGState.from_key(12))
        sk.update(0, jnp.ones((60, 20), jnp.float32))
        with pytest.raises(ValueError):
            sk.update(30, jnp.ones((10, 20), jnp.float32))

    def test_corange_must_exceed_range(self):
        # review regression: corange_factor < ~1 made the recovery
        # lstsq underdetermined and silently garbage
        with pytest.raises(ValueError):
            rla.single_pass_svd(jnp.zeros((120, 40), jnp.float32), 4,
                                RNGState.from_key(13), corange_factor=0.3)
        with pytest.raises(ValueError):
            rla.StreamingSketch(120, 40, 4, RNGState.from_key(13),
                                corange_factor=0.3)


# ------------------------------------------------ FrequentDirections

class TestFrequentDirections:
    """Deterministic streaming sketch (streaming.py::FrequentDirections)."""

    def _data(self, m=3000, n=100, seed=0, noise=0.05):
        rng = np.random.default_rng(seed)
        u = rng.standard_normal((m, 10))
        v = rng.standard_normal((10, n))
        return u @ v + noise * rng.standard_normal((m, n))

    def test_guarantee_exact_in_f64(self):
        # the FD theorem is deterministic: A^T A - B^T B is PSD with
        # norm <= shrink_mass <= ||A||_F^2 / ell. In f64 it holds to
        # roundoff (measured: TIGHT — max eig == shrink_mass to 1e-6).
        from randblas_tpu.linalg import FrequentDirections
        a = self._data()
        n, ell = a.shape[1], 20
        with jax.enable_x64():
            fd = FrequentDirections(n, ell, dtype=jnp.float64)
            for i in range(0, a.shape[0], 37):     # ragged chunks
                fd.update(jnp.asarray(a[i:i + 37]))
            b = np.asarray(fd.sketch())
        diff = a.T @ a - b.T @ b
        w = np.linalg.eigvalsh(diff)
        assert w.min() > -1e-6                     # PSD
        assert w.max() <= fd.shrink_mass * (1 + 1e-9) + 1e-9
        assert fd.shrink_mass <= np.linalg.norm(a, "fro") ** 2 / ell

    def test_guarantee_f32_with_roundoff_allowance(self):
        # f32 accumulates ~eps * sigma1^2 per shrink SVD; the classic
        # F^2/ell bound still holds with orders-of-magnitude headroom
        from randblas_tpu.linalg import FrequentDirections
        a = self._data(seed=1).astype(np.float32)
        n, ell = a.shape[1], 20
        fd = FrequentDirections(n, ell)
        fd.update(jnp.asarray(a))
        b = np.asarray(fd.sketch(), np.float64)
        a64 = a.astype(np.float64)
        err = np.linalg.norm(a64.T @ a64 - b.T @ b, 2)
        assert err <= np.linalg.norm(a64, "fro") ** 2 / ell * 0.05

    def test_exact_for_low_rank_streams(self):
        # rank(A) < ell: every shrink sees sigma_ell == 0, so B^T B
        # reproduces A^T A exactly (no information was ever discarded)
        from randblas_tpu.linalg import FrequentDirections
        a = self._data(m=800, n=64, seed=2, noise=0.0).astype(np.float32)
        fd = FrequentDirections(64, 20)
        for i in range(0, 800, 100):
            fd.update(jnp.asarray(a[i:i + 100]))
        b = np.asarray(fd.sketch(), np.float64)
        a64 = a.astype(np.float64)
        gram_norm = np.linalg.norm(a64.T @ a64, 2)
        # the f32 Gram-eigh shrink reports sigma_ell^2 as ~eps*sigma1^2
        # noise instead of exact 0 — negligible relative to the Gram
        assert fd.shrink_mass < 1e-5 * gram_norm
        rel = np.linalg.norm(a64.T @ a64 - b.T @ b, 2) / gram_norm
        assert rel < 1e-4

    def test_chunking_any_shape(self):
        # single rows, ragged blocks, blocks larger than the buffer —
        # all orders of the same rows satisfy the same guarantee
        from randblas_tpu.linalg import FrequentDirections
        a = self._data(m=500, n=40, seed=3).astype(np.float32)
        bound = np.linalg.norm(a, "fro") ** 2 / 10
        for chunks in ([1] * 64 + [436], [499, 1], [500], [63] * 7 + [59]):
            fd = FrequentDirections(40, 10)
            off = 0
            for c in chunks:
                fd.update(jnp.asarray(a[off:off + c]))
                off += c
            assert off == 500
            b = np.asarray(fd.sketch())
            err = np.linalg.norm(a.T @ a - b.T @ b, 2)
            assert err <= bound, (chunks[:3], err, bound)

    def test_sketch_shape_and_single_row(self):
        from randblas_tpu.linalg import FrequentDirections
        fd = FrequentDirections(32, 8)
        fd.update(jnp.ones((32,), jnp.float32))    # 1-D row promotes
        b = fd.sketch()
        assert b.shape == (8, 32)
        assert float(jnp.linalg.norm(b)) > 0

    def test_validates(self):
        from randblas_tpu.linalg import FrequentDirections
        with pytest.raises(ValueError):
            FrequentDirections(16, 0)
        with pytest.raises(ValueError):
            FrequentDirections(16, 17)
        fd = FrequentDirections(16, 4)
        with pytest.raises(ValueError):
            fd.update(jnp.ones((3, 15), jnp.float32))


class TestFDIngest:
    """ingest(a) = one jitted scan; must be BIT-identical to the
    host-driven update(a) loop (same chunk boundaries -> same shrink
    sequence), from any starting phase."""

    def test_matches_update_bitwise(self):
        import jax.numpy as jnp
        from randblas_tpu.linalg import FrequentDirections
        rng = np.random.default_rng(0)
        n, ell = 96, 16
        a = jnp.asarray(rng.standard_normal((7 * ell + 5, n))
                        .astype(np.float32))
        fd_u = FrequentDirections(n, ell)
        fd_u.update(a)
        fd_i = FrequentDirections(n, ell)
        fd_i.ingest(a)
        assert np.array_equal(np.asarray(fd_u._buf), np.asarray(fd_i._buf))
        assert float(fd_u.shrink_mass) == float(fd_i.shrink_mass)
        assert fd_u._fill == fd_i._fill

    def test_matches_update_from_partial_fill(self):
        import jax.numpy as jnp
        from randblas_tpu.linalg import FrequentDirections
        rng = np.random.default_rng(1)
        n, ell = 64, 8
        pre = jnp.asarray(rng.standard_normal((11, n)).astype(np.float32))
        a = jnp.asarray(rng.standard_normal((5 * ell + 3, n))
                        .astype(np.float32))
        fd_u = FrequentDirections(n, ell)
        fd_u.update(pre)
        fd_u.update(a)
        fd_i = FrequentDirections(n, ell)
        fd_i.update(pre)
        fd_i.ingest(a)
        assert np.array_equal(np.asarray(fd_u._buf), np.asarray(fd_i._buf))
        assert float(fd_u.shrink_mass) == float(fd_i.shrink_mass)

    def test_small_ingest_no_shrink(self):
        import jax.numpy as jnp
        from randblas_tpu.linalg import FrequentDirections
        rng = np.random.default_rng(2)
        n, ell = 32, 8
        a = jnp.asarray(rng.standard_normal((9, n)).astype(np.float32))
        fd = FrequentDirections(n, ell)
        fd.ingest(a)
        assert fd._fill == 9 and float(fd.shrink_mass) == 0.0
        fd2 = FrequentDirections(n, ell)
        fd2.update(a)
        assert np.array_equal(np.asarray(fd._buf), np.asarray(fd2._buf))

    def test_certificate_after_ingest(self):
        import jax.numpy as jnp
        from randblas_tpu.linalg import FrequentDirections
        rng = np.random.default_rng(3)
        m, n, ell = 600, 48, 12
        a64 = rng.standard_normal((m, n)) * 2.0 ** (-np.arange(n) / 8.0)
        fd = FrequentDirections(n, ell, dtype=jnp.float64)
        fd.ingest(jnp.asarray(a64))
        b = np.asarray(fd.sketch())
        err = np.linalg.norm(a64.T @ a64 - b.T @ b, 2)
        assert err <= float(fd.shrink_mass) * (1 + 1e-10) + 1e-9


class TestFDMergeability:
    """FD is a mergeable summary (GLPW16 thm 1.2): merge() and the
    shard-mapped distributed_fd keep the deterministic guarantee —
    total shrink mass stays <= ||A||_F^2 / ell under ANY merge tree."""

    def _check(self, a, fd, slack=1e-3):
        b = np.asarray(fd.sketch(), np.float64)
        a64 = np.asarray(a, np.float64)
        gram = a64.T @ a64
        err = np.linalg.norm(gram - b.T @ b, 2)
        mass = float(fd.shrink_mass)
        scale = np.linalg.norm(gram, 2)
        assert err <= mass * 1.01 + slack * scale, (err, mass)
        assert mass <= np.linalg.norm(a64, "fro") ** 2 / fd.ell * 1.01

    def test_fd_pass_matches_class(self):
        from randblas_tpu.linalg import FrequentDirections, fd_pass
        rng = np.random.default_rng(4)
        n, ell = 48, 8
        for m in (3, ell, 5 * ell + 3, 2 * ell):
            a = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
            b, mass = fd_pass(a, ell)
            fd = FrequentDirections(n, ell)
            fd.ingest(a)
            bs = fd.sketch()
            np.testing.assert_allclose(np.asarray(b), np.asarray(bs),
                                       rtol=3e-4, atol=3e-5)
            assert abs(float(mass) - float(fd.shrink_mass)) <= \
                3e-5 * max(1.0, float(fd.shrink_mass))

    def test_merge_guarantee(self):
        from randblas_tpu.linalg import FrequentDirections
        rng = np.random.default_rng(5)
        a = rng.standard_normal((600, 40)).astype(np.float32)
        fd1 = FrequentDirections(40, 10)
        fd2 = FrequentDirections(40, 10)
        fd1.update(jnp.asarray(a[:380]))
        fd2.update(jnp.asarray(a[380:]))
        fd1.merge(fd2)
        self._check(a, fd1)

    def test_merge_tree_and_mixed_ell(self):
        from randblas_tpu.linalg import FrequentDirections
        rng = np.random.default_rng(6)
        a = rng.standard_normal((512, 32)).astype(np.float32)
        parts = [FrequentDirections(32, 8) for _ in range(4)]
        # the mixed-budget merge: one summarizer ran with a larger ell
        parts[2] = FrequentDirections(32, 16)
        for i, fd in enumerate(parts):
            fd.update(jnp.asarray(a[128 * i:128 * (i + 1)]))
        parts[0].merge(parts[1])
        parts[2].merge(parts[3])
        parts[0].merge(parts[2])
        b = np.asarray(parts[0].sketch(), np.float64)
        a64 = a.astype(np.float64)
        err = np.linalg.norm(a64.T @ a64 - b.T @ b, 2)
        mass = float(parts[0].shrink_mass)
        assert err <= mass * 1.01 + 1e-3 * np.linalg.norm(a64.T @ a64, 2)

    def test_merge_validates(self):
        from randblas_tpu.linalg import FrequentDirections
        fd = FrequentDirections(16, 4)
        with pytest.raises(ValueError):
            fd.merge(FrequentDirections(17, 4))
        with pytest.raises(ValueError):
            fd.merge("not a sketch")

    def test_distributed_fd_guarantee_and_padding(self):
        from randblas_tpu.linalg import distributed_fd
        from randblas_tpu.parallel import make_sketch_mesh
        rng = np.random.default_rng(7)
        a = rng.standard_normal((333, 40)).astype(np.float32)  # ragged m
        for model, data in ((2, 4), (1, 8)):
            fd = distributed_fd(jnp.asarray(a), 10,
                                make_sketch_mesh(model, data))
            self._check(a, fd)

    def test_distributed_fd_low_rank_exact(self):
        # rank < ell: zero information discarded on every shard AND in
        # the merge -> near-zero certificate end to end
        from randblas_tpu.linalg import distributed_fd
        from randblas_tpu.parallel import make_sketch_mesh
        rng = np.random.default_rng(8)
        a = (rng.standard_normal((400, 6)).astype(np.float32)
             @ rng.standard_normal((6, 48)).astype(np.float32))
        fd = distributed_fd(jnp.asarray(a), 16, make_sketch_mesh(2, 4))
        a64 = a.astype(np.float64)
        gram_norm = np.linalg.norm(a64.T @ a64, 2)
        assert float(fd.shrink_mass) < 1e-4 * gram_norm
        b = np.asarray(fd.sketch(), np.float64)
        rel = np.linalg.norm(a64.T @ a64 - b.T @ b, 2) / gram_norm
        assert rel < 1e-3
