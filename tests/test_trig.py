"""Tests for the SRHT operator family (trig.py, ops/hadamard.py).

Beyond-parity feature (no reference analog): tested with the same
posture as the other operator families — structure tests, oracle
cross-checks against the materialized operator, stream/next_state
contracts, and a subspace-distortion statistical test mirroring
test_distortion.cc's setup.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import (
    RNGState, TrigDist, TrigSkOp, hadamard_matrix, hadamard_transform,
    isometry_scale_factor, sketch_general, srht_operator,
)
from randblas_tpu.ops.hadamard import _balanced_factors


class TestHadamard:
    @pytest.mark.parametrize("m", [1, 2, 4, 8, 32, 128, 256, 2048])
    def test_matches_sylvester_matrix(self, m):
        h2 = np.array([[1.0, 1.0], [1.0, -1.0]], np.float32)
        h = np.ones((1, 1), np.float32)
        while h.shape[0] < m:
            h = np.kron(h, h2)
        np.testing.assert_array_equal(np.asarray(hadamard_matrix(m)), h)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(m, 5)), jnp.float32)
        np.testing.assert_allclose(np.asarray(hadamard_transform(x)),
                                   h @ np.asarray(x), rtol=1e-5, atol=1e-4)

    def test_orthogonality(self):
        m = 512
        h = np.asarray(hadamard_matrix(m))
        np.testing.assert_array_equal(h @ h.T, m * np.eye(m))

    def test_balanced_factors(self):
        for lg in range(0, 22):
            fs = _balanced_factors(1 << lg)
            assert np.prod(fs) == 1 << lg
            assert all(f <= 128 for f in fs)
            if lg >= 7:
                # balanced: no stage smaller than half the largest
                assert min(fs) * 4 >= max(fs)

    def test_transform_is_self_adjoint(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
        lhs = jnp.vdot(hadamard_transform(x), y)
        rhs = jnp.vdot(x, hadamard_transform(y))
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)

    def test_rejects_non_pow2(self):
        with pytest.raises(Exception):
            hadamard_transform(jnp.zeros((12, 3)))


class TestTrigSkOp:
    def _op(self, d=16, m=100, key=3):
        return TrigSkOp(TrigDist(d, m), RNGState.from_key(key))

    def test_materialized_structure(self):
        S = self._op()
        dense = np.asarray(S.materialize())
        # every entry of R H D is +-1
        np.testing.assert_array_equal(np.abs(dense), 1.0)

    def test_lmult_matches_materialized(self):
        S = self._op()
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(100, 7)), jnp.float32)
        got = S.lmult(a)
        want = np.asarray(S.materialize()) @ np.asarray(a)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-4)

    def test_lmult_t_is_adjoint(self):
        S = self._op()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        np.testing.assert_allclose(float(jnp.vdot(S.lmult(x), y)),
                                   float(jnp.vdot(x, S.lmult_t(y))),
                                   rtol=1e-4)

    def test_pow2_m_unpadded(self):
        S = self._op(d=8, m=64)
        a = jnp.eye(64, dtype=jnp.float32)
        got = np.asarray(S.lmult(a))
        np.testing.assert_array_equal(np.abs(got), 1.0)

    def test_reproducible_and_cached(self):
        S1 = self._op()
        S2 = self._op()
        a = jnp.asarray(np.random.default_rng(0).normal(size=(100, 4)),
                        jnp.float32)
        np.testing.assert_array_equal(np.asarray(S1.lmult(a)),
                                      np.asarray(S2.lmult(a)))
        # cache primed after first concrete use
        assert S1._signs is not None and S1._indices is not None

    def test_next_state_function_of_dist_only(self):
        st = RNGState.from_key(9)
        S = TrigSkOp(TrigDist(16, 100), st)
        # signs consume ceil(100/4)=25, samples ceil(16/4)=4 blocks
        want = st.incr(29)
        np.testing.assert_array_equal(np.asarray(S.next_state.counter),
                                      np.asarray(want.counter))
        # chaining: a second operator from next_state differs from the first
        S2 = TrigSkOp(TrigDist(16, 100), S.next_state)
        assert not np.array_equal(np.asarray(S.materialize()),
                                  np.asarray(S2.materialize()))

    def test_pytree_round_trip(self):
        S = self._op()
        leaves, treedef = jax.tree_util.tree_flatten(S)
        S2 = jax.tree_util.tree_unflatten(treedef, leaves)
        a = jnp.asarray(np.random.default_rng(0).normal(size=(100, 2)),
                        jnp.float32)
        np.testing.assert_array_equal(np.asarray(S.lmult(a)),
                                      np.asarray(S2.lmult(a)))

    def test_jit_and_grad(self):
        S = self._op(d=8, m=60)
        a = jnp.asarray(np.random.default_rng(0).normal(size=(60, 5)),
                        jnp.float32)

        @jax.jit
        def f(a):
            return jnp.sum(S.lmult(a) ** 2)

        g = jax.grad(f)(a)
        # grad of ||S a||^2 is 2 S^T S a
        want = 2.0 * S.lmult_t(S.lmult(a))
        np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)


class TestSketchGeneralIntegration:
    def test_left_noTrans(self):
        S = srht_operator(16, 100, key=5)
        a = jnp.asarray(np.random.default_rng(0).normal(size=(100, 7)),
                        jnp.float32)
        got = sketch_general(S, a)
        want = np.asarray(S.materialize()) @ np.asarray(a)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-4)

    def test_left_trans(self):
        S = srht_operator(16, 100, key=5)
        b = jnp.asarray(np.random.default_rng(0).normal(size=(16, 7)),
                        jnp.float32)
        got = sketch_general(S, b, op_s="T")
        want = np.asarray(S.materialize()).T @ np.asarray(b)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-4)

    def test_right_noTrans(self):
        # A (n, m') @ S (m', d): storage S = (m', d) -> TrigDist(m', d)
        S = TrigSkOp(TrigDist(100, 16), RNGState.from_key(5))
        a = jnp.asarray(np.random.default_rng(0).normal(size=(7, 100)),
                        jnp.float32)
        got = sketch_general(S, a, side="right")
        want = np.asarray(a) @ np.asarray(S.materialize())
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-4)

    def test_right_trans(self):
        S = srht_operator(16, 100, key=5)
        a = jnp.asarray(np.random.default_rng(0).normal(size=(7, 100)),
                        jnp.float32)
        got = sketch_general(S, a, side="right", op_s="T")
        want = np.asarray(a) @ np.asarray(S.materialize()).T
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-4)

    def test_alpha_and_out_beta(self):
        S = srht_operator(8, 64, key=1)
        a = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)),
                        jnp.float32)
        b0 = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)),
                         jnp.float32)
        got = sketch_general(S, a, alpha=0.5, beta=2.0, out=b0)
        want = 0.5 * np.asarray(S.materialize()) @ np.asarray(a) \
            + 2.0 * np.asarray(b0)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-4)

    def test_rejects_submatrix(self):
        S = srht_operator(8, 64)
        a = jnp.zeros((64, 3), jnp.float32)
        with pytest.raises(Exception):
            sketch_general(S, a, d=4, ro_s=1)


@pytest.mark.slow
class TestStatistical:
    def test_isometry_scale(self):
        dist = TrigDist(16, 100)
        c = isometry_scale_factor(dist)
        assert c == pytest.approx(1.0 / math.sqrt(16))

    def test_expected_gram_identity(self):
        """Monte-Carlo check of E[(cS)^T (cS)] = I over seeds."""
        dist = TrigDist(32, 64)
        c = isometry_scale_factor(dist)
        acc = np.zeros((64, 64))
        trials = 200
        for key in range(trials):
            s = np.asarray(
                TrigSkOp(dist, RNGState.from_key(key)).materialize())
            acc += (c * s).T @ (c * s)
        acc /= trials
        # diagonal ~1, off-diagonal ~0 at MC noise scale 1/sqrt(trials)
        np.testing.assert_allclose(np.diag(acc), 1.0, atol=0.15)
        off = acc - np.diag(np.diag(acc))
        assert np.abs(off).max() < 0.15

    def test_subspace_distortion(self):
        """Singular values of c S U near 1 for a random orthonormal U —
        the SRHT analog of the dense/SASO distortion tests
        (test_distortion.cc:49-116)."""
        m, n, d = 2048, 8, 512
        rng = np.random.default_rng(0)
        u, _ = np.linalg.qr(rng.normal(size=(m, n)))
        dist = TrigDist(d, m)
        S = TrigSkOp(dist, RNGState.from_key(11))
        su = S.lmult(jnp.asarray(u, jnp.float32))
        sv = np.linalg.svd(isometry_scale_factor(dist) * np.asarray(su),
                           compute_uv=False)
        # delta ~ sqrt(n log(n) / d) + ... ~ 0.4 at these sizes; use 0.5
        assert sv.max() < 1.5 and sv.min() > 0.5


class TestComposition:
    """TrigSkOp composes with the wrapper entry points and transforms
    out of the box (pure-XLA apply) — pinned here so it stays true."""

    def test_sketch_vector(self):
        from randblas_tpu import sketch_vector
        S = srht_operator(8, 60, key=2)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(60,)),
                        jnp.float32)
        y = sketch_vector(S, x)
        want = np.asarray(S.materialize()) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(y).ravel(), want,
                                   rtol=1e-5, atol=1e-5)

    def test_sketch_symmetric(self):
        from randblas_tpu import sketch_symmetric
        S = srht_operator(8, 60, key=2)
        a = np.random.default_rng(1).normal(size=(60, 60)).astype(
            np.float32)
        a = (a + a.T) / 2
        y = sketch_symmetric(S, jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(S.materialize()) @ a,
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_vmap_over_seeds_matches_serial(self):
        """Ensemble sketching: vmapping the seed state through sampling
        and apply is bitwise equal to the serial per-seed results (the
        trig analog of test_vmap_ensemble)."""
        from randblas_tpu import RNGState

        def one(key_ctr):
            st = RNGState.from_arrays(key_ctr[:4], key_ctr[4:6])
            T = TrigSkOp(TrigDist(8, 60), st)
            return T.lmult(jnp.ones((60, 3), jnp.float32))

        ctrs = jnp.zeros((4, 6), jnp.uint32).at[:, 4].set(
            jnp.arange(4, dtype=jnp.uint32))
        outs = jax.vmap(one)(ctrs)
        for i in range(4):
            np.testing.assert_array_equal(np.asarray(outs[i]),
                                          np.asarray(one(ctrs[i])))


class TestF64AndContracts:
    def test_f64_transform_hiprec_route(self):
        """Forced use_hiprec_f64 must route f64 Hadamard stages through
        the int8-sliced GEMM, matching plain f64 tensordot tightly."""
        import randblas_tpu as rb
        x64 = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
        try:
            x = jnp.asarray(np.random.default_rng(0).normal(size=(256, 5)),
                            jnp.float64)
            want = np.asarray(hadamard_transform(x))
            with rb.flags(use_hiprec_f64=True):
                got = np.asarray(hadamard_transform(x))
            np.testing.assert_allclose(got, want, rtol=1e-12)
        finally:
            jax.config.update("jax_enable_x64", x64)

    def test_distributed_cols_rejects_forced_fused(self):
        from randblas_tpu.parallel import make_sketch_mesh
        from randblas_tpu.parallel.distributed import distributed_sketch_cols
        S = srht_operator(8, 64, key=1)
        A = jnp.zeros((64, 16), jnp.float32)
        mesh = make_sketch_mesh(2, 4)
        with pytest.raises(ValueError, match="fused"):
            distributed_sketch_cols(S, A, mesh, use_fused=True)
