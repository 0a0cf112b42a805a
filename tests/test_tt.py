"""Tensor-train tier (linalg/tt.py): container algebra vs dense
oracles, randomized TT-SVD recovery, Randomize-then-Orthogonalize
rounding vs the deterministic TT-SVD baseline, stream contracts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from randblas_tpu import RNGState
from randblas_tpu.linalg import (TTTensor, tt_add, tt_dot, tt_from_dense,
                                 tt_gaussian, tt_norm, tt_round, tt_scale)


def tt_svd_oracle(x, ranks):
    """Deterministic TT-SVD (Oseledets 2011) in f64 numpy: the
    quasi-optimality baseline for the randomized paths."""
    x = np.asarray(x, np.float64)
    shape = x.shape
    p = len(shape)
    ranks = (ranks,) * (p - 1) if isinstance(ranks, int) else tuple(ranks)
    cores = []
    carry = x.reshape(1, -1)
    r_prev = 1
    for k in range(p - 1):
        mat = carry.reshape(r_prev * shape[k], -1)
        u, s, vt = np.linalg.svd(mat, full_matrices=False)
        r = min(ranks[k], len(s))
        cores.append(u[:, :r].reshape(r_prev, shape[k], r))
        carry = s[:r, None] * vt[:r, :]
        r_prev = r
    cores.append(carry.reshape(r_prev, shape[-1], 1))
    out = cores[0]
    for g in cores[1:]:
        out = np.einsum("a...b,bic->a...ic", out, g)
    return out[0, ..., 0]


class TestContainer:
    def test_full_matches_explicit_contraction(self):
        x, _ = tt_gaussian((4, 5, 6), (2, 3), RNGState.from_key(0))
        g1, g2, g3 = [np.asarray(g) for g in x.cores]
        want = np.einsum("aib,bjc,ckd->ijk", g1, g2, g3)
        np.testing.assert_allclose(np.asarray(x.full()), want, rtol=1e-6)

    def test_dot_norm_add_scale_vs_dense(self):
        x, _ = tt_gaussian((5, 4, 3, 6), (2, 3, 2), RNGState.from_key(1))
        y, _ = tt_gaussian((5, 4, 3, 6), 2, RNGState.from_key(2))
        xd, yd = np.asarray(x.full(), np.float64), np.asarray(
            y.full(), np.float64)
        np.testing.assert_allclose(float(tt_dot(x, y)), np.vdot(xd, yd),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(tt_norm(x)), np.linalg.norm(xd),
                                   rtol=1e-5)
        s = tt_add(x, tt_scale(y, -2.5))
        assert s.ranks == tuple(a + b for a, b in zip(
            (1, 2, 3, 2, 1), (1, 2, 2, 2, 1))) or s.ranks == \
            (1, 4, 5, 4, 1)
        np.testing.assert_allclose(np.asarray(s.full()), xd - 2.5 * yd,
                                   rtol=1e-4, atol=1e-4)

    def test_pytree_jit(self):
        x, _ = tt_gaussian((4, 4, 4), 2, RNGState.from_key(3))
        f = jax.jit(lambda t: tt_norm(tt_scale(t, 2.0)))
        np.testing.assert_allclose(float(f(x)), 2 * float(tt_norm(x)),
                                   rtol=1e-6)

    def test_validates(self):
        with pytest.raises(ValueError):
            TTTensor([jnp.zeros((2, 3, 1))])          # r_0 != 1
        with pytest.raises(ValueError):
            TTTensor([jnp.zeros((1, 3, 2)), jnp.zeros((3, 3, 1))])
        with pytest.raises(ValueError):
            tt_gaussian((4, 4), (2, 2), RNGState.from_key(0))  # len
        with pytest.raises(ValueError):
            tt_add(*[tt_gaussian((3, 3), 1, RNGState.from_key(i))[0]
                     for i in range(2)] if False else (
                tt_gaussian((3, 3), 1, RNGState.from_key(0))[0],
                tt_gaussian((3, 4), 1, RNGState.from_key(1))[0]))


class TestStreams:
    def test_gaussian_next_state_is_f_of_dist(self):
        """next_state must equal the seed-chained advance over the
        per-core DenseDists — independent of values/devices."""
        from randblas_tpu.dense import DenseDist, compute_next_state
        st = RNGState.from_key(7)
        shape, ranks = (6, 5, 4), (3, 2)
        _, nxt = tt_gaussian(shape, ranks, st)
        rr = (1, 3, 2, 1)
        cur = st
        for k, n in enumerate(shape):
            cur = compute_next_state(
                DenseDist(rr[k], n * rr[k + 1]), cur)
        assert nxt.to_dict() == cur.to_dict()

    def test_deterministic_replay(self):
        a, n1 = tt_gaussian((4, 5), 2, RNGState.from_key(9))
        b, n2 = tt_gaussian((4, 5), 2, RNGState.from_key(9))
        for ga, gb in zip(a.cores, b.cores):
            np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
        assert n1.to_dict() == n2.to_dict()

    def test_round_next_state_matches_gaussian_advance(self):
        x, _ = tt_gaussian((5, 6, 4), (4, 3), RNGState.from_key(10))
        s = tt_add(x, x)
        st = RNGState.from_key(11)
        _, nxt = tt_round(s, (4, 3), st, oversample=2)
        # the only stream consumer is the Gaussian sketch TT at the
        # clipped ell ranks
        ell = (min(4 + 2, 8), min(3 + 2, 6))
        _, want = tt_gaussian((5, 6, 4), ell, st)
        assert nxt.to_dict() == want.to_dict()


class TestFromDense:
    def test_exact_rank_recovery(self):
        x, _ = tt_gaussian((8, 9, 7, 6), (3, 4, 2), RNGState.from_key(1))
        dense = x.full()
        tt2, _ = tt_from_dense(dense, (3, 4, 2), RNGState.from_key(2))
        rel = float(jnp.linalg.norm(tt2.full() - dense)
                    / jnp.linalg.norm(dense))
        assert rel < 1e-4, rel
        assert tt2.ranks == (1, 3, 4, 2, 1)

    def test_quasi_optimal_truncation(self):
        """On a tensor with decaying TT spectrum, the randomized
        truncation must land within 2x of the deterministic TT-SVD
        error (HMT-type quasi-optimality, power_iters=2)."""
        rng = np.random.default_rng(4)
        # decaying sum of separable terms
        x = np.zeros((10, 11, 12), np.float64)
        for t in range(10):
            a, b, c = (rng.standard_normal(s) for s in (10, 11, 12))
            x += (0.4 ** t) * np.einsum("i,j,k->ijk", a, b, c)
        xj = jnp.asarray(x.astype(np.float32))
        tt, _ = tt_from_dense(xj, 4, RNGState.from_key(5), power_iters=2)
        got = np.linalg.norm(np.asarray(tt.full(), np.float64) - x)
        base = np.linalg.norm(tt_svd_oracle(x, 4) - x)
        assert got < 2 * base + 1e-6, (got, base)

    def test_rank_clipping_and_matrix_case(self):
        a = jnp.asarray(np.random.default_rng(6).standard_normal(
            (7, 9)).astype(np.float32))
        tt, _ = tt_from_dense(a, 50, RNGState.from_key(6))
        assert tt.ranks == (1, 7, 1)       # clipped to min dim
        rel = float(jnp.linalg.norm(tt.full() - a) / jnp.linalg.norm(a))
        assert rel < 1e-4                  # full-rank = exact


class TestRound:
    def test_add_round_trip(self):
        """x + 2x rounds back to x's ranks with value 3x (the classic
        rounding correctness certificate: the sum's TRUE ranks are
        x's, so truncation is exact up to sketch conditioning)."""
        x, _ = tt_gaussian((8, 9, 7, 6), (3, 4, 2), RNGState.from_key(1))
        s = tt_add(x, tt_scale(x, 2.0))
        assert s.ranks == (1, 6, 8, 4, 1)
        r, _ = tt_round(s, (3, 4, 2), RNGState.from_key(3))
        assert r.ranks == (1, 3, 4, 2, 1)
        dense = np.asarray(x.full(), np.float64)
        rel = np.linalg.norm(np.asarray(r.full(), np.float64) - 3 * dense
                             ) / (3 * np.linalg.norm(dense))
        assert rel < 1e-4, rel

    def test_quasi_optimal_vs_tt_svd(self):
        """Rounding a decaying-spectrum TT to lower rank lands within
        3x of the deterministic TT-SVD truncation error (SISC 2023
        thm 3.1 posture, oversample=4)."""
        rng = np.random.default_rng(8)
        x = np.zeros((9, 10, 11), np.float64)
        for t in range(8):
            a, b, c = (rng.standard_normal(s) for s in (9, 10, 11))
            x += (0.5 ** t) * np.einsum("i,j,k->ijk", a, b, c)
        # exact-ish TT of x first (feasible ranks), then round down
        tt, _ = tt_from_dense(jnp.asarray(x.astype(np.float32)), 8,
                              RNGState.from_key(12), power_iters=2)
        r, _ = tt_round(tt, 3, RNGState.from_key(13), oversample=4)
        got = np.linalg.norm(np.asarray(r.full(), np.float64) - x)
        base = np.linalg.norm(tt_svd_oracle(x, 3) - x)
        assert got < 3 * base + 1e-6, (got, base)

    def test_jit(self):
        x, _ = tt_gaussian((6, 7, 5), (4, 3), RNGState.from_key(14))
        s = tt_add(x, x)
        st = RNGState.from_key(15)
        eager, _ = tt_round(s, (4, 3), st)
        f = jax.jit(lambda t, ss: tt_round(t, (4, 3), ss)[0])
        j = f(s, st)
        rel = float(jnp.linalg.norm(j.full() - eager.full())
                    / jnp.linalg.norm(eager.full()))
        assert rel < 1e-4, rel

    def test_single_mode_noop(self):
        x, _ = tt_gaussian((5,), (), RNGState.from_key(16))
        r, nxt = tt_round(x, (), RNGState.from_key(17))
        np.testing.assert_array_equal(np.asarray(r.full()),
                                      np.asarray(x.full()))


class TestTTMatrix:
    """TT-matrix (MPO) container + tt_matvec: dense-matrix oracle,
    rank growth and its rounding, stream contracts."""

    def _mk(self, key_a=0, key_x=1):
        from randblas_tpu.linalg import tt_gaussian, tt_matrix_gaussian
        a, _ = tt_matrix_gaussian((4, 5, 3), (6, 2, 7), (2, 3),
                                  RNGState.from_key(key_a))
        x, _ = tt_gaussian((6, 2, 7), (2, 2), RNGState.from_key(key_x))
        return a, x

    def test_full_and_matvec_vs_dense(self):
        from randblas_tpu.linalg import tt_matvec
        a, x = self._mk()
        y = tt_matvec(a, x)
        assert y.shape == (4, 5, 3)
        assert y.ranks == (1, 4, 6, 1)        # ranks multiply
        want = np.asarray(a.full(), np.float64) @ np.asarray(
            x.full(), np.float64).reshape(-1)
        got = np.asarray(y.full(), np.float64).reshape(-1)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 1e-5, rel

    def test_rounded_matvec(self):
        from randblas_tpu.linalg import tt_matvec
        a, x = self._mk()
        want = np.asarray(a.full(), np.float64) @ np.asarray(
            x.full(), np.float64).reshape(-1)
        # randomized (returns next_state) and deterministic rounding at
        # the product's true ranks are both exact
        yr, nxt = tt_matvec(a, x, ranks=(4, 6),
                            state=RNGState.from_key(2))
        assert nxt.to_dict() != RNGState.from_key(2).to_dict()
        yd = tt_matvec(a, x, ranks=(4, 6))
        for y in (yr, yd):
            got = np.asarray(y.full(), np.float64).reshape(-1)
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            assert rel < 1e-5, rel
        # interface-2 rank clips to n_3 = 3 structurally
        assert yd.ranks == (1, 4, 3, 1)

    def test_jit(self):
        from randblas_tpu.linalg import tt_matvec
        a, x = self._mk()
        eager = tt_matvec(a, x, ranks=(4, 6))
        f = jax.jit(lambda aa, xx: tt_matvec(aa, xx, ranks=(4, 6)))
        j = f(a, x)
        rel = float(jnp.linalg.norm(j.full() - eager.full())
                    / jnp.linalg.norm(eager.full()))
        assert rel < 1e-4, rel

    def test_validates(self):
        from randblas_tpu.linalg import (TTMatrix, tt_gaussian,
                                         tt_matrix_gaussian, tt_matvec)
        with pytest.raises(ValueError):
            TTMatrix([jnp.zeros((2, 3, 3, 1))])
        with pytest.raises(ValueError):
            tt_matrix_gaussian((4, 4), (4,), 2, RNGState.from_key(0))
        a, _ = tt_matrix_gaussian((4,), (5,), (), RNGState.from_key(0))
        x, _ = tt_gaussian((6,), (), RNGState.from_key(1))
        with pytest.raises(ValueError):
            tt_matvec(a, x)                   # in_shape mismatch
        x2, _ = tt_gaussian((5,), (), RNGState.from_key(1))
        with pytest.raises(ValueError):
            tt_matvec(a, x2, state=RNGState.from_key(2))  # no ranks


class TestSinglePass:
    """STTA (tt_single_pass / TTStream): single-pass TT from linear
    sketches — exact-rank recovery, additive-stream equivalence,
    truncation quality, stream contracts."""

    def test_exact_rank_recovery(self):
        from randblas_tpu.linalg import tt_single_pass
        x, _ = tt_gaussian((8, 9, 7, 6), (3, 4, 2), RNGState.from_key(1))
        dense = x.full()
        tt, _ = tt_single_pass(dense, (3, 4, 2), RNGState.from_key(2),
                               oversample=6)
        rel = float(jnp.linalg.norm(tt.full() - dense)
                    / jnp.linalg.norm(dense))
        assert rel < 1e-4, rel
        assert tt.ranks == (1, 3, 4, 2, 1)

    def test_stream_equals_one_call(self):
        """Additive chunks through TTStream recover (up to f32
        reassociation in the sketch sums) what the one-call form
        computes from the assembled tensor — the linearity contract."""
        from randblas_tpu.linalg import TTStream, tt_single_pass
        x, _ = tt_gaussian((8, 9, 7, 6), (3, 4, 2), RNGState.from_key(1))
        dense = np.asarray(x.full())
        want, nxt_w = tt_single_pass(jnp.asarray(dense), (3, 4, 2),
                                     RNGState.from_key(2), oversample=6)
        stream = TTStream((8, 9, 7, 6), (3, 4, 2), RNGState.from_key(2),
                          oversample=6)
        assert stream.next_state.to_dict() == nxt_w.to_dict()
        for lo, hi in ((0, 3), (3, 6), (6, 8)):
            delta = np.zeros_like(dense)
            delta[lo:hi] = dense[lo:hi]
            stream.update(jnp.asarray(delta))
        rec = stream.recover()
        np.testing.assert_allclose(np.asarray(rec.full()),
                                   np.asarray(want.full()),
                                   rtol=1e-3, atol=1e-3)

    def test_truncation_quality(self):
        """Single-pass truncation lands within a modest factor of the
        TT-SVD baseline (KVV22 quasi-optimality; larger constant than
        the two-pass tt_from_dense)."""
        rng = np.random.default_rng(8)
        y = np.zeros((9, 10, 11), np.float64)
        for t in range(8):
            a, b, c = (rng.standard_normal(s) for s in (9, 10, 11))
            y += (0.5 ** t) * np.einsum("i,j,k->ijk", a, b, c)
        from randblas_tpu.linalg import tt_single_pass
        errs = []
        for seed in range(3):
            tty, _ = tt_single_pass(jnp.asarray(y.astype(np.float32)),
                                    3, RNGState.from_key(20 + seed),
                                    oversample=8)
            errs.append(np.linalg.norm(
                np.asarray(tty.full(), np.float64) - y))
        base = np.linalg.norm(tt_svd_oracle(y, 3) - y)
        assert min(errs) < 8 * base, (errs, base)

    def test_next_state_and_validation(self):
        from randblas_tpu.linalg import TTStream, tt_single_pass
        x = jnp.zeros((4, 5, 6))
        st = RNGState.from_key(30)
        _, n1 = tt_single_pass(x, 2, st)
        _, n2 = tt_single_pass(jnp.ones((4, 5, 6)), 2, st)
        assert n1.to_dict() == n2.to_dict()      # f(shape, ranks) only
        s = TTStream((4, 5), 2, st)
        with pytest.raises(ValueError):
            s.update(jnp.zeros((4, 6)))
        with pytest.raises(ValueError):
            s.recover()

    def test_jit(self):
        from randblas_tpu.linalg import tt_single_pass
        x, _ = tt_gaussian((6, 7, 5), (2, 3), RNGState.from_key(31))
        dense = x.full()
        st = RNGState.from_key(32)
        eager, _ = tt_single_pass(dense, (2, 3), st)
        f = jax.jit(lambda d, s: tt_single_pass(d, (2, 3), s)[0])
        j = f(dense, st)
        rel = float(jnp.linalg.norm(j.full() - eager.full())
                    / jnp.linalg.norm(eager.full()))
        assert rel < 1e-3, rel
