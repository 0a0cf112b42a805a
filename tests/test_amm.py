"""Monte-Carlo approximate matrix multiplication (linalg/amm.py).

Model: DKM06's guarantees — unbiasedness, the ||A||_F ||B||_F / sqrt(s)
error rate, exactness structure — plus this framework's contracts
(reproducibility, state chaining, jit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import randblas_tpu as rbt
from randblas_tpu.linalg import amm


def _mats(m=60, n=400, p=24, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, p)).astype(np.float32))
    return a, b


@pytest.mark.slow
def test_error_rate_and_shrinks_with_s():
    a, b = _mats()
    exact = np.asarray(a) @ np.asarray(b)
    bound_unit = (np.linalg.norm(np.asarray(a))
                  * np.linalg.norm(np.asarray(b)))
    errs = {}
    for s in (50, 800):
        est, _ = amm(a, b, s, rbt.default_state(1))
        errs[s] = np.linalg.norm(np.asarray(est) - exact)
        # DKM06: E error <= bound_unit / sqrt(s); allow 3x slack on a
        # single draw
        assert errs[s] < 3 * bound_unit / np.sqrt(s), (s, errs[s])
    assert errs[800] < errs[50]


@pytest.mark.slow
def test_unbiased_over_chained_states():
    a, b = _mats(m=24, n=200, p=16, seed=2)
    exact = np.asarray(a) @ np.asarray(b)
    st = rbt.default_state(3)
    acc = np.zeros_like(exact)
    reps = 60
    for _ in range(reps):
        est, st = amm(a, b, 40, st)
        acc += np.asarray(est)
    acc /= reps
    # mean of 60 independent 40-sample estimates ~ one 2400-sample
    # estimate: error must sit at/below the DKM06 rate for S_total
    # (with 1.5x single-draw slack) AND far below a single 40-sample
    # call's rate — i.e., averaging independent chained calls converges
    err = np.linalg.norm(acc - exact)
    bound_unit = (np.linalg.norm(np.asarray(a))
                  * np.linalg.norm(np.asarray(b)))
    assert err < 1.5 * bound_unit / np.sqrt(reps * 40), err
    single, _ = amm(a, b, 40, rbt.default_state(3))
    assert err < 0.4 * np.linalg.norm(np.asarray(single) - exact)


def test_rank_one_is_exact():
    """With rank-1 A and B sharing the one direction, every sampled
    outer product is the SAME rescaled rank-1 term, so any s gives the
    exact product (the variance formula's zero case)."""
    rng = np.random.default_rng(4)
    u = rng.normal(size=(30, 1)).astype(np.float32)
    v = np.abs(rng.normal(size=(1, 200)).astype(np.float32)) + 0.1
    w = rng.normal(size=(1, 12)).astype(np.float32)
    a = jnp.asarray(u @ v)
    b = jnp.asarray(v.T @ w)
    est, _ = amm(a, b, 7, rbt.default_state(5))
    np.testing.assert_allclose(np.asarray(est),
                               np.asarray(a) @ np.asarray(b),
                               rtol=2e-4, atol=1e-5)


def test_reproducible_and_chains():
    a, b = _mats(seed=6)
    e1, n1 = amm(a, b, 64, rbt.default_state(7))
    e2, n2 = amm(a, b, 64, rbt.default_state(7))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(n1.counter),
                                  np.asarray(n2.counter))
    e3, _ = amm(a, b, 64, n1)
    assert not np.array_equal(np.asarray(e1), np.asarray(e3))


def test_jits_end_to_end():
    a, b = _mats(m=16, n=128, p=8, seed=8)
    f = jax.jit(lambda aa, bb: amm(aa, bb, 32, rbt.default_state(9))[0])
    eager, _ = amm(a, b, 32, rbt.default_state(9))
    # jit path uses the traced (f32) CDF sampler; same indices at this
    # scale, values equal to f32 roundoff
    np.testing.assert_allclose(np.asarray(f(a, b)), np.asarray(eager),
                               rtol=1e-5, atol=1e-5)


def test_zero_product_and_validation():
    a = jnp.zeros((5, 20))
    b = jnp.zeros((20, 3))
    est, _ = amm(a, b, 4, rbt.default_state(10))
    np.testing.assert_array_equal(np.asarray(est), np.zeros((5, 3)))
    with pytest.raises(ValueError):
        amm(a, jnp.zeros((19, 3)), 4, rbt.default_state(10))
    with pytest.raises(ValueError):
        amm(a, b, 0, rbt.default_state(10))


class TestSampleLsq:
    """Leverage-score row-sampling LS (linalg/amm.py::sample_lsq)."""

    def _system(self, m=4000, n=24, seed=11, spike=True):
        rng = np.random.default_rng(seed)
        a = rng.normal(size=(m, n)).astype(np.float32)
        if spike:
            # a few high-leverage rows that uniform sampling would miss
            a[:8] *= 40.0
        x_true = rng.normal(size=n).astype(np.float32)
        b = a @ x_true + 0.01 * rng.normal(size=m).astype(np.float32)
        return jnp.asarray(a), jnp.asarray(b), x_true

    @pytest.mark.slow
    def test_near_optimal_residual(self):
        from randblas_tpu.linalg import sample_lsq
        a, b, _ = self._system()
        x_opt = np.linalg.lstsq(np.asarray(a), np.asarray(b),
                                rcond=None)[0]
        r_opt = np.linalg.norm(np.asarray(a) @ x_opt - np.asarray(b))
        x, _ = sample_lsq(a, b, 600, rbt.default_state(12))
        r = np.linalg.norm(np.asarray(a) @ np.asarray(x)
                           - np.asarray(b))
        assert r < 1.15 * r_opt, (r, r_opt)

    @pytest.mark.slow
    def test_leverage_beats_uniform_on_spiked_rows(self):
        """With planted high-leverage rows, leverage-weighted sampling
        (lam=1) must beat pure uniform (lam=0) at equal budget."""
        from randblas_tpu.linalg import sample_lsq
        a, b, _ = self._system(seed=13)
        x_opt = np.linalg.lstsq(np.asarray(a), np.asarray(b),
                                rcond=None)[0]

        def excess(lam, seed):
            x, _ = sample_lsq(a, b, 150, rbt.default_state(seed),
                              lam=lam)
            return (np.linalg.norm(np.asarray(a) @ np.asarray(x)
                                   - np.asarray(b))
                    - np.linalg.norm(np.asarray(a) @ x_opt
                                     - np.asarray(b)))

        lev = np.median([excess(1.0, s) for s in range(30, 36)])
        uni = np.median([excess(0.0, s) for s in range(30, 36)])
        assert lev < uni, (lev, uni)

    def test_precomputed_scores_and_block_rhs(self):
        from randblas_tpu.linalg import exact_leverage_scores, sample_lsq
        a, b, _ = self._system(m=1500, n=12, seed=14)
        scores = exact_leverage_scores(a)
        B = jnp.stack([b, 2 * b], axis=1)
        X, _ = sample_lsq(a, B, 400, rbt.default_state(15),
                          scores=scores)
        x_opt = np.linalg.lstsq(np.asarray(a), np.asarray(b),
                                rcond=None)[0]
        np.testing.assert_allclose(np.asarray(X[:, 1]),
                                   2 * np.asarray(X[:, 0]), rtol=1e-4)
        r_opt = np.linalg.norm(np.asarray(a) @ x_opt - np.asarray(b))
        r = np.linalg.norm(np.asarray(a) @ np.asarray(X[:, 0])
                           - np.asarray(b))
        assert r < 1.2 * r_opt

    def test_validates(self):
        from randblas_tpu.linalg import sample_lsq
        a, b, _ = self._system(m=100, n=10)
        with pytest.raises(ValueError):
            sample_lsq(a, b, 5, rbt.default_state(1))      # s < n
        with pytest.raises(ValueError):
            sample_lsq(a.T, b, 20, rbt.default_state(1))   # wide
        with pytest.raises(ValueError):
            sample_lsq(a, b, 20, rbt.default_state(1), lam=1.5)


def test_nan_propagates():
    """Review regression (round 4): a NaN in A must SURFACE — either as
    NaN in the estimate (jit path) or as weights_to_cdf's host-side
    validity error (eager path) — never as a silent exact-zero
    product."""
    a = jnp.ones((6, 30)).at[2, 3].set(jnp.nan)
    b = jnp.ones((30, 4))
    try:
        est, _ = amm(a, b, 8, rbt.default_state(16))
    except ValueError:
        pass                        # eager CDF validity check fired
    else:
        assert np.isnan(np.asarray(est)).any()
    # jit path has no host-side check: NaN must flow to the output
    est = jax.jit(lambda aa, bb: amm(aa, bb, 8,
                                     rbt.default_state(16))[0])(a, b)
    assert np.isnan(np.asarray(est)).any()


@pytest.mark.slow
def test_sample_lsq_zero_scores_uniform_fallback():
    """Review regression (round 4): caller-supplied all-zero scores
    with lam=1 must fall back to uniform sampling, not produce NaN."""
    from randblas_tpu.linalg import sample_lsq
    rng = np.random.default_rng(17)
    a = jnp.asarray(rng.normal(size=(300, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=300).astype(np.float32))
    x, _ = sample_lsq(a, b, 100, rbt.default_state(18),
                      scores=jnp.zeros(300), lam=1.0)
    assert np.isfinite(np.asarray(x)).all()
    x_opt = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)[0]
    r_opt = np.linalg.norm(np.asarray(a) @ x_opt - np.asarray(b))
    r = np.linalg.norm(np.asarray(a) @ np.asarray(x) - np.asarray(b))
    assert r < 1.3 * r_opt
