"""Tests for linalg/lstsq.py: CGLS, sketch-and-solve, sketch-and-precondition.

Model: the reference's examples-tier TLS checks (tls_dense_skop.cc) —
sketched answers compared against the dense direct solver on problems
with known solutions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import randblas_tpu as rbt
from randblas_tpu import RNGState
from randblas_tpu import linalg as rla
from randblas_tpu.linalg import (
    cgls, sketch_and_precondition, sketch_and_solve_lsq,
)
from randblas_tpu.sparse_data.coo import COOMatrix


def _tall_problem(m=600, n=40, cond=1e3, noise=1e-4, seed=0, k_rhs=None):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.normal(size=(m, n)))
    v, _ = np.linalg.qr(rng.normal(size=(n, n)))
    sv = np.logspace(0, -np.log10(cond), n)
    a = (u * sv) @ v.T
    shape = (n,) if k_rhs is None else (n, k_rhs)
    x_true = rng.normal(size=shape)
    b = a @ x_true + noise * rng.normal(size=(m,) if k_rhs is None
                                        else (m, k_rhs))
    return (jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
            jnp.asarray(x_true, jnp.float32))


def _residual(a, b, x):
    return float(jnp.linalg.norm(a @ x - b))


class TestCGLS:
    def test_matches_direct_solve(self):
        a, b, _ = _tall_problem(cond=10.0)
        x, iters, _ = cgls(lambda y: a @ y, lambda r: a.T @ r, b,
                           a.shape[1], tol=1e-6, maxiter=400)
        x_ref, *_ = jnp.linalg.lstsq(a, b)
        assert _residual(a, b, x) <= _residual(a, b, x_ref) * (1 + 1e-4)
        assert int(iters) < 400

    def test_block_rhs_columns_independent(self):
        a, b, _ = _tall_problem(cond=10.0, k_rhs=3)
        x, _, _ = cgls(lambda y: a @ y, lambda r: a.T @ r, b,
                       a.shape[1], tol=1e-6, maxiter=400)
        assert x.shape == (a.shape[1], 3)
        for j in range(3):
            xj, _, _ = cgls(lambda y: a @ y, lambda r: a.T @ r, b[:, j],
                            a.shape[1], tol=1e-6, maxiter=400)
            np.testing.assert_allclose(np.asarray(x[:, j]), np.asarray(xj),
                                       rtol=2e-3, atol=2e-4)

    def test_warm_start_skips_work(self):
        a, b, _ = _tall_problem(cond=10.0)
        x_ref, *_ = jnp.linalg.lstsq(a, b)
        _, iters, _ = cgls(lambda y: a @ y, lambda r: a.T @ r, b,
                           a.shape[1], x0=x_ref, tol=1e-3, maxiter=100)
        assert int(iters) <= 2


@pytest.mark.slow
class TestSketchAndSolve:
    @pytest.mark.parametrize("operator", ["saso", "gaussian", "srht"])
    def test_residual_near_optimal(self, operator):
        a, b, _ = _tall_problem(noise=1e-2)
        n = a.shape[1]
        x, nxt = sketch_and_solve_lsq(a, b, 4 * n, RNGState.from_key(7),
                                      operator=operator)
        r_opt = _residual(a, b, jnp.linalg.lstsq(a, b)[0])
        # d = 4n gives delta ~ 0.5-accurate residuals whp
        assert _residual(a, b, x) <= 1.5 * r_opt
        assert nxt is not None

    def test_block_rhs_shape(self):
        a, b, _ = _tall_problem(noise=1e-2, k_rhs=2)
        x, _ = sketch_and_solve_lsq(a, b, 4 * a.shape[1],
                                    RNGState.from_key(7))
        assert x.shape == (a.shape[1], 2)

    def test_reproducible(self):
        a, b, _ = _tall_problem()
        st = RNGState.from_key(3)
        x1, n1 = sketch_and_solve_lsq(a, b, 160, st)
        x2, n2 = sketch_and_solve_lsq(a, b, 160, st)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        np.testing.assert_array_equal(np.asarray(n1.counter),
                                      np.asarray(n2.counter))


@pytest.mark.slow
class TestSketchAndPrecondition:
    @pytest.mark.parametrize("operator", ["saso", "gaussian", "srht"])
    def test_solver_accurate(self, operator):
        a, b, _ = _tall_problem(cond=1e3, noise=1e-3)
        x, iters, _ = sketch_and_precondition(
            a, b, RNGState.from_key(1), operator=operator, tol=1e-6,
            maxiter=100)
        r_opt = _residual(a, b, jnp.linalg.lstsq(a, b)[0])
        assert _residual(a, b, x) <= r_opt * (1 + 1e-3)
        # the whole point: iteration count independent of cond(A)
        assert int(iters) < 60

    def test_warm_start_saves_iterations(self):
        a, b, _ = _tall_problem(cond=1e3, noise=1e-3)
        _, it_warm, _ = sketch_and_precondition(
            a, b, RNGState.from_key(1), tol=1e-6, maxiter=200,
            warm_start=True)
        _, it_cold, _ = sketch_and_precondition(
            a, b, RNGState.from_key(1), tol=1e-6, maxiter=200,
            warm_start=False)
        assert int(it_warm) <= int(it_cold)

    def test_block_rhs(self):
        a, b, _ = _tall_problem(cond=100.0, noise=1e-3, k_rhs=3)
        x, _, _ = sketch_and_precondition(a, b, RNGState.from_key(2),
                                          tol=1e-6, maxiter=100)
        x_ref, *_ = jnp.linalg.lstsq(a, b)
        np.testing.assert_allclose(np.asarray(a @ x), np.asarray(a @ x_ref),
                                   rtol=0, atol=5e-3)

    def test_jittable(self):
        a, b, _ = _tall_problem(cond=100.0)
        f = jax.jit(lambda a, b: sketch_and_precondition(
            a, b, RNGState.from_key(1), tol=1e-6, maxiter=100)[0])
        x = f(a, b)
        r_opt = _residual(a, b, jnp.linalg.lstsq(a, b)[0])
        assert _residual(a, b, x) <= r_opt * (1 + 1e-3)


@pytest.mark.slow
class TestSparseData:
    def _sparse_problem(self, m=500, n=30, density=0.05, seed=0):
        rng = np.random.default_rng(seed)
        mask = rng.random((m, n)) < density
        dense = np.where(mask, rng.normal(size=(m, n)), 0.0)
        # ensure full column rank: add a scaled identity block on top
        dense[:n, :] += np.eye(n)
        a_dense = jnp.asarray(dense, jnp.float32)
        coo = COOMatrix.from_dense(a_dense)
        b = jnp.asarray(rng.normal(size=(m,)), jnp.float32)
        return coo, a_dense, b

    @pytest.mark.parametrize("operator", ["saso", "gaussian"])
    def test_sparse_matches_dense_route(self, operator):
        coo, a_dense, b = self._sparse_problem()
        x_sp, iters, _ = sketch_and_precondition(
            coo, b, RNGState.from_key(5), operator=operator, tol=1e-6,
            maxiter=150)
        x_ref, *_ = jnp.linalg.lstsq(a_dense, b)
        np.testing.assert_allclose(np.asarray(a_dense @ x_sp),
                                   np.asarray(a_dense @ x_ref),
                                   rtol=0, atol=5e-3)

    def test_sparse_sketch_and_solve(self):
        coo, a_dense, b = self._sparse_problem()
        n = a_dense.shape[1]
        x, _ = sketch_and_solve_lsq(coo, b, 4 * n, RNGState.from_key(5))
        r_opt = _residual(a_dense, b, jnp.linalg.lstsq(a_dense, b)[0])
        assert _residual(a_dense, b, x) <= 1.5 * r_opt + 1e-5

    def test_srht_rejects_sparse_data(self):
        coo, _, b = self._sparse_problem()
        with pytest.raises(ValueError):
            sketch_and_solve_lsq(coo, b, 120, RNGState.from_key(5),
                                 operator="srht")


def test_f64_matvecs_route_through_hiprec():
    """qb._apply (the CGLS/power-iteration matvec) must honor the
    use_hiprec_f64 policy: forced True routes dense f64 products through
    the int8-sliced GEMM, matching the plain f64 product to its
    documented accuracy."""
    import randblas_tpu as rb
    from randblas_tpu.linalg.qb import _apply, _apply_t
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(64, 32)), jnp.float64)
    x = jnp.asarray(rng.normal(size=(32, 3)), jnp.float64)
    want = np.asarray(a, np.float64) @ np.asarray(x, np.float64)
    with rb.flags(use_hiprec_f64=True):
        got = np.asarray(_apply(a, x))
        got_t = np.asarray(_apply_t(a.T, x))
    np.testing.assert_allclose(got, want, rtol=1e-12)
    np.testing.assert_allclose(got_t, want, rtol=1e-12)


# ----------------------------------------------------------- min_norm_lsq

@pytest.mark.slow
class TestMinNormLsq:
    def _wide_consistent(self, m=40, n=400, cond=1e4, seed=0, k=None):
        rng = np.random.default_rng(seed)
        u, _ = np.linalg.qr(rng.normal(size=(m, m)))
        v, _ = np.linalg.qr(rng.normal(size=(n, m)))
        s = np.logspace(0, np.log10(cond), m)[::-1]
        a = (u * s) @ v.T
        b = rng.normal(size=(m,) if k is None else (m, k))
        return (jnp.asarray(a, jnp.float32),
                jnp.asarray(b, jnp.float32))

    @pytest.mark.parametrize("operator", ["saso", "gaussian", "srht"])
    def test_matches_numpy_min_norm(self, operator):
        a, b = self._wide_consistent(cond=1e3, seed=1)
        x, iters, nxt = rla.min_norm_lsq(a, b, rbt.default_state(2),
                                         operator=operator)
        x_ref = np.linalg.lstsq(np.asarray(a, np.float64),
                                np.asarray(b, np.float64), rcond=None)[0]
        # minimum norm: matches the pseudoinverse solution (the
        # deliverable; x-space error is NOT cond-amplified)
        np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-3,
                                   atol=1e-4)
        # consistency holds to ~cond(A)*eps_f32 (residual amplifies
        # x-error by sigma_max; run f64 for tighter — see docstring)
        np.testing.assert_allclose(np.asarray(a @ x), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)
        assert nxt.to_dict() != rbt.default_state(2).to_dict()

    def test_block_rhs(self):
        a, b = self._wide_consistent(seed=3, k=3, cond=1e2)
        x, _, _ = rla.min_norm_lsq(a, b, rbt.default_state(4))
        assert x.shape == (400, 3)
        x_ref = np.linalg.lstsq(np.asarray(a, np.float64),
                                np.asarray(b, np.float64), rcond=None)[0]
        np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-3,
                                   atol=1e-4)

    def test_iteration_count_cond_independent(self):
        # cond 1e6 in f32: unpreconditioned CG on A A^T would need
        # thousands of steps; the sketched preconditioner needs dozens
        a, b = self._wide_consistent(cond=1e6, seed=5)
        x, iters, _ = rla.min_norm_lsq(a, b, rbt.default_state(6))
        assert int(iters) < 60, int(iters)
        x_ref = np.linalg.lstsq(np.asarray(a, np.float64),
                                np.asarray(b, np.float64), rcond=None)[0]
        # at cond 1e6 the f32 triangular solves inject ~cond*eps noise;
        # the iteration count (above) is the claim — accuracy is sanity
        rel = (np.abs(np.asarray(x, np.float64) - x_ref).max()
               / np.abs(x_ref).max())
        assert rel < 5e-2, rel
        norm_ratio = (np.linalg.norm(np.asarray(x))
                      / np.linalg.norm(x_ref))
        assert abs(norm_ratio - 1.0) < 1e-2

    def test_sparse_data(self):
        rng = np.random.default_rng(7)
        m, n = 30, 300
        dense = np.zeros((m, n), np.float32)
        nnz = 1500
        ii = rng.integers(0, m, nnz)
        jj = rng.integers(0, n, nnz)
        vv = rng.normal(size=nnz).astype(np.float32)
        np.add.at(dense, (ii, jj), vv)
        from randblas_tpu.sparse_data import COOMatrix
        coo = COOMatrix.from_dense(jnp.asarray(dense))
        b = jnp.asarray(rng.normal(size=m), jnp.float32)
        x, _, _ = rla.min_norm_lsq(coo, b, rbt.default_state(8))
        np.testing.assert_allclose(np.asarray(dense @ np.asarray(x)),
                                   np.asarray(b), rtol=1e-3, atol=1e-3)

    def test_validates_tall(self):
        a = jnp.zeros((50, 10), jnp.float32)
        with pytest.raises(ValueError):
            rla.min_norm_lsq(a, jnp.zeros(50), rbt.default_state(9))


@pytest.mark.slow
class TestRidgeLsq:
    @pytest.mark.parametrize("operator", ["saso", "gaussian", "srht"])
    def test_matches_direct_normal_equations(self, operator):
        a, b, _ = _tall_problem(cond=1e2, noise=1e-3, seed=5)
        mu = 0.05
        x, iters, _ = rla.ridge_lsq(a, b, mu, RNGState.from_key(3),
                                    operator=operator, tol=1e-6,
                                    maxiter=100)
        an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
        x_ref = np.linalg.solve(an.T @ an + mu * np.eye(an.shape[1]),
                                an.T @ bn)
        np.testing.assert_allclose(np.asarray(x), x_ref, rtol=0, atol=2e-4)
        assert int(iters) < 80

    def test_iterations_independent_of_conditioning(self):
        # the augmented-system preconditioner handles cond(A) AND mu:
        # ill-conditioned data with small mu still converges in O(1)
        a, b, _ = _tall_problem(cond=1e6, noise=1e-3, seed=6)
        x, iters, _ = rla.ridge_lsq(a, b, 1e-4, RNGState.from_key(4),
                                    tol=1e-6, maxiter=150)
        assert np.all(np.isfinite(np.asarray(x)))
        assert int(iters) < 80

    def test_mu_zero_matches_precondition(self):
        a, b, _ = _tall_problem(cond=1e2, noise=1e-3, seed=7)
        x0, _, nxt0 = rla.ridge_lsq(a, b, 0.0, RNGState.from_key(5),
                                    tol=1e-8, maxiter=150)
        x1, _, nxt1 = sketch_and_precondition(a, b, RNGState.from_key(5),
                                              tol=1e-8, maxiter=150)
        np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                                   rtol=0, atol=1e-4)
        # identical operator stream (same A-sketch consumed)
        assert nxt0.to_dict() == nxt1.to_dict()

    def test_block_rhs_and_shrinkage(self):
        a, b, _ = _tall_problem(cond=1e2, noise=1e-3, seed=8, k_rhs=3)
        x_small, _, _ = rla.ridge_lsq(a, b, 1e-3, RNGState.from_key(6),
                                      tol=1e-7, maxiter=120)
        x_big, _, _ = rla.ridge_lsq(a, b, 100.0, RNGState.from_key(6),
                                    tol=1e-7, maxiter=120)
        assert x_small.shape == (a.shape[1], b.shape[1])
        # heavier regularization shrinks the solution
        assert float(jnp.linalg.norm(x_big)) < float(jnp.linalg.norm(x_small))

    def test_sparse_data(self):
        rng = np.random.default_rng(9)
        m, n = 400, 24
        dense = np.zeros((m, n), np.float32)
        nnz = 3000
        ii = rng.integers(0, m, nnz)
        jj = rng.integers(0, n, nnz)
        vv = rng.normal(size=nnz).astype(np.float32)
        np.add.at(dense, (ii, jj), vv)
        coo = COOMatrix.from_dense(jnp.asarray(dense))
        b = jnp.asarray(rng.normal(size=m), jnp.float32)
        mu = 0.1
        x, _, _ = rla.ridge_lsq(coo, b, mu, RNGState.from_key(7),
                                operator="gaussian", tol=1e-6, maxiter=100)
        dn, bn = dense.astype(np.float64), np.asarray(b, np.float64)
        x_ref = np.linalg.solve(dn.T @ dn + mu * np.eye(n), dn.T @ bn)
        np.testing.assert_allclose(np.asarray(x), x_ref, rtol=0, atol=2e-4)

    def test_mesh_matches_single_device(self):
        from randblas_tpu.parallel import make_sketch_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = make_sketch_mesh(2, 4)
        a, b, _ = _tall_problem(m=512, n=24, cond=1e2, noise=1e-3, seed=10)
        x_ref, _, nxt_ref = rla.ridge_lsq(a, b, 0.05, RNGState.from_key(8),
                                          tol=1e-6, maxiter=100)
        x_mesh, _, nxt_mesh = rla.ridge_lsq(
            jax.device_put(a, NamedSharding(mesh, P("data", None))),
            jax.device_put(b, NamedSharding(mesh, P("data"))),
            0.05, RNGState.from_key(8), tol=1e-6, maxiter=100, mesh=mesh)
        np.testing.assert_allclose(np.asarray(x_mesh), np.asarray(x_ref),
                                   rtol=2e-4, atol=2e-4)
        assert nxt_mesh.to_dict() == nxt_ref.to_dict()

    def test_validates(self):
        a = jnp.zeros((10, 20), jnp.float32)
        with pytest.raises(ValueError):
            rla.ridge_lsq(a, jnp.zeros(10), 0.1, RNGState.from_key(9))
        with pytest.raises(ValueError):
            rla.ridge_lsq(jnp.zeros((20, 10), jnp.float32), jnp.zeros(20),
                          -1.0, RNGState.from_key(9))


@pytest.mark.slow
class TestDivergenceGuard:
    def test_unreachable_tol_returns_best_iterate(self):
        # review regression: an f32-unreachable tol used to make CGLS
        # iterate past machine precision and DIVERGE (observed max err
        # ~650 vs the direct solve); the loop now tracks the best
        # iterate per column, exits once every unconverged column sits
        # 1e4x above its own best, and returns the best.
        a, b, _ = _tall_problem(cond=1e4, noise=1e-3, seed=11)
        mu = 0.01
        x, iters, _ = rla.ridge_lsq(a, b, mu, RNGState.from_key(10),
                                    tol=1e-7, maxiter=200)
        an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
        x_ref = np.linalg.solve(an.T @ an + mu * np.eye(an.shape[1]),
                                an.T @ bn)
        err = np.abs(np.asarray(x) - x_ref).max()
        assert err < 1e-3, err
        # and the divergence exit fires before maxiter burns out
        assert int(iters) < 200

    def test_pcg_guard_min_norm(self):
        rng = np.random.default_rng(12)
        aw = jnp.asarray(rng.normal(size=(40, 300)), jnp.float32)
        bw = jnp.asarray(rng.normal(size=40), jnp.float32)
        xm, _, _ = rla.min_norm_lsq(aw, bw, RNGState.from_key(11),
                                    tol=1e-10, maxiter=300)
        rm = float(jnp.linalg.norm(aw @ xm - bw) / jnp.linalg.norm(bw))
        assert rm < 1e-4


class TestIHS:
    """Iterative Hessian sketch (PW16, heavy-ball form LP20): ONE
    fixed isometry-scaled sketch + momentum; the solution error must
    contract at ~sqrt(n/d) per step, reaching solver accuracy (not just
    residual accuracy)."""

    @pytest.mark.parametrize("operator", ["saso", "gaussian", "srht"])
    def test_solver_accurate(self, operator):
        a, b, _ = _tall_problem(cond=1e2)
        x_ref, *_ = jnp.linalg.lstsq(a, b)
        x, _ = rla.ihs_lsq(a, b, RNGState.from_key(3), iters=24,
                           operator=operator)
        err = float(jnp.linalg.norm(x - x_ref) / jnp.linalg.norm(x_ref))
        assert err < 1e-4, err

    def test_error_contracts_at_momentum_rate(self):
        # heavy-ball rate sqrt(n/d) = 1/2 at d = 4n: 8 extra iterations
        # must buy ~0.5^8 = 4e-3; assert a 10x-slack 0.05
        a, b, _ = _tall_problem(cond=1e2)
        x_ref, *_ = jnp.linalg.lstsq(a, b)

        def err(t):
            x, _ = rla.ihs_lsq(a, b, RNGState.from_key(5), iters=t)
            return float(jnp.linalg.norm(x - x_ref)
                         / jnp.linalg.norm(x_ref))

        e4, e12 = err(4), err(12)
        assert e12 < e4 * 0.05, (e4, e12)

    def test_next_state_is_chained(self):
        a, b, _ = _tall_problem()
        st = RNGState.from_key(7)
        _, nxt = rla.ihs_lsq(a, b, st, iters=3, operator="gaussian")
        # ONE fixed embedding: the state advances exactly once
        from randblas_tpu.linalg.embed import make_embedding
        s = make_embedding("gaussian", 4 * a.shape[1], a.shape[0],
                           st).next_state
        assert np.array_equal(np.asarray(nxt.counter),
                              np.asarray(s.counter))

    def test_reproducible_and_block_rhs(self):
        a, b, _ = _tall_problem(k_rhs=3)
        x1, _ = rla.ihs_lsq(a, b, RNGState.from_key(9), iters=6)
        x2, _ = rla.ihs_lsq(a, b, RNGState.from_key(9), iters=6)
        assert x1.shape == (a.shape[1], 3)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    def test_sparse_data(self):
        a, b, _ = _tall_problem(cond=50.0)
        ad = np.array(a)
        ad[np.abs(ad) < np.quantile(np.abs(ad), 0.6)] = 0.0
        coo = COOMatrix.from_dense(jnp.asarray(ad))
        x_ref, *_ = jnp.linalg.lstsq(jnp.asarray(ad), b)
        x, _ = rla.ihs_lsq(coo, b, RNGState.from_key(11), iters=24)
        err = float(jnp.linalg.norm(x - x_ref) / jnp.linalg.norm(x_ref))
        assert err < 1e-4, err

    def test_validates(self):
        a, b, _ = _tall_problem()
        with pytest.raises(Exception):
            rla.ihs_lsq(a.T, b, RNGState.from_key(0))
        with pytest.raises(Exception):
            rla.ihs_lsq(a, b, RNGState.from_key(0), iters=0)
