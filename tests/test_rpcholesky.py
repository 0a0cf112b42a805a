"""RPCholesky: exact recovery, near-optimal trace error, duplicate-pivot
robustness, oracle parity, seed chaining, and the PCG consumer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu.linalg.rpcholesky import rpcholesky, rpcholesky_pcg
from randblas_tpu.rng.state import RNGState


def _psd(n, spectrum, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = (q * np.asarray(spectrum)[None, :]) @ q.T
    return jnp.asarray(0.5 * (a + a.T), jnp.float32)


@pytest.mark.slow
def test_exact_recovery_low_rank():
    n, r = 96, 12
    spec = np.concatenate([np.linspace(5.0, 1.0, r), np.zeros(n - r)])
    a = _psd(n, spec, seed=1)
    f, piv, _ = rpcholesky(a, 2 * r, RNGState.from_key(3), block=8)
    err = jnp.linalg.norm(a - f @ f.T) / jnp.linalg.norm(a)
    assert float(err) < 5e-5
    assert piv.shape == (2 * r,)
    assert bool(jnp.all((piv >= 0) & (piv < n)))


def test_trace_error_near_optimal():
    # decaying spectrum: trace error at rank k should be within a modest
    # factor of the optimal tail sum (CETW22 thm 3.1 gives ~(1+eps) with
    # oversampling; we assert a loose 4x at 2x oversampling).
    n, k = 128, 16
    spec = 2.0 ** -np.arange(n)
    a = _psd(n, spec, seed=2)
    f, _, _ = rpcholesky(a, 2 * k, RNGState.from_key(7), block=8)
    resid = float(jnp.trace(a - f @ f.T))
    opt_tail = float(spec[k:].sum())
    assert resid < 4.0 * opt_tail + 1e-6
    # the residual diagonal identity
    d_res = jnp.diagonal(a) - jnp.sum(f * f, axis=1)
    assert float(jnp.min(d_res)) > -1e-4


def test_duplicate_pivots_are_harmless():
    # one dominant diagonal entry -> the iid block draw collides almost
    # surely; clipping must shed the duplicates without NaN/Inf.
    n = 64
    d = np.full(n, 1e-6)
    d[17] = 1.0
    a = jnp.asarray(np.diag(d), jnp.float32)
    f, piv, _ = rpcholesky(a, 8, RNGState.from_key(11), block=8)
    assert bool(jnp.all(jnp.isfinite(f)))
    assert int((piv == 17).sum()) >= 2  # collisions actually happened
    err = jnp.linalg.norm(a - f @ f.T)
    assert float(err) < 1e-5  # the dominant direction was captured once


def test_column_oracle_matches_dense():
    n, r = 80, 10
    a = _psd(n, np.linspace(3.0, 0.1, n), seed=4)
    st = RNGState.from_key(5)
    f1, p1, s1 = rpcholesky(a, r, st, block=4)
    f2, p2, s2 = rpcholesky(lambda idx: jnp.take(a, idx, axis=1), r, st,
                            block=4, n=n, diag=jnp.diagonal(a))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=0,
                               atol=0)
    assert s1.to_dict() == s2.to_dict()


def test_state_chaining_and_determinism():
    n, r, b = 60, 12, 4
    a = _psd(n, np.linspace(2.0, 0.5, n), seed=6)
    st = RNGState.from_key(9)
    f1, p1, nxt = rpcholesky(a, r, st, block=b)
    f2, p2, nxt2 = rpcholesky(a, r, st, block=b)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    # next_state = ceil(b/len_c) counters per block draw, chained
    n_blocks = 0
    lo = 0
    while lo < r:
        bt = min(b, r - lo)
        n_blocks += -(-bt // st.len_c)
        lo += bt
    expect = st.incr(n_blocks)
    assert nxt.to_dict() == expect.to_dict() == nxt2.to_dict()


def test_jit_path_runs_and_approximates():
    n, r = 72, 24
    a = _psd(n, 2.0 ** -np.arange(n, dtype=np.float64), seed=8)
    fn = jax.jit(lambda m, s: rpcholesky(m, r, s, block=8)[0])
    f = fn(a, RNGState.from_key(13))
    assert bool(jnp.all(jnp.isfinite(f)))
    # jit pivot stream is the documented f32 path (may differ from the
    # host-f64 eager stream) but the approximation quality must hold
    resid = float(jnp.trace(a - f @ f.T))
    assert resid < float(jnp.trace(a)) * 1e-2


def test_zero_residual_fallback():
    # rank > true rank: residual hits zero mid-run; uniform fallback must
    # keep the factor finite and the approximation exact.
    n, r = 40, 3
    spec = np.concatenate([[2.0, 1.0, 0.5], np.zeros(n - 3)])
    a = _psd(n, spec, seed=10)
    f, _, _ = rpcholesky(a, 16, RNGState.from_key(15), block=8)
    assert bool(jnp.all(jnp.isfinite(f)))
    assert float(jnp.linalg.norm(a - f @ f.T)) < 1e-5


@pytest.mark.parametrize("mu", [0.0, 1e-2])
@pytest.mark.slow
def test_rpcholesky_pcg_solves(mu):
    n = 96
    spec = np.concatenate([np.linspace(50.0, 5.0, 12),
                           np.full(n - 12, 1e-3)])
    a = _psd(n, spec, seed=12)
    x_true = jnp.asarray(np.random.default_rng(1).standard_normal((n, 2)),
                         jnp.float32)
    b = a @ x_true + mu * x_true
    x, iters, _ = rpcholesky_pcg(a, b, RNGState.from_key(21), rank=32,
                                 mu=mu, tol=1e-5)
    rel = jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true)
    assert float(rel) < (1e-2 if mu == 0.0 else 1e-3)
    assert int(iters) < 60
