"""Sketched Rayleigh–Ritz eigensolver: dominant-pair accuracy on
nonsymmetric and symmetric operators, complex spectra, residuals."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from randblas_tpu.linalg.spectral import sketched_eigs
from randblas_tpu.rng.state import RNGState


@pytest.mark.slow
def test_dominant_eigs_nonsymmetric_real():
    # upper-triangular: spectrum on the diagonal, well-separated head
    n = 100
    rng = np.random.default_rng(0)
    diag = np.concatenate([[10.0, 8.0, 6.0], np.linspace(1.0, 0.1, n - 3)])
    a_np = np.triu(0.3 * rng.standard_normal((n, n)), 1) + np.diag(diag)
    a = jnp.asarray(a_np, jnp.float32)
    theta, x, res, _ = sketched_eigs(a, 3, RNGState.from_key(1), basis=40)
    got = np.sort(np.abs(np.asarray(theta)))[::-1]
    np.testing.assert_allclose(got, [10.0, 8.0, 6.0], rtol=2e-3)
    assert np.all(np.asarray(res) < 5e-2)
    # Ritz vectors satisfy A x ~ theta x
    ax = a_np @ np.asarray(x)
    rel = np.linalg.norm(ax - np.asarray(x) * np.asarray(theta)[None, :],
                         axis=0) / np.abs(np.asarray(theta))
    assert np.all(rel < 5e-2)


@pytest.mark.slow
def test_complex_conjugate_pair():
    # rotation-like block embedded in a damped system: dominant pair is
    # complex conjugate with |theta| = 2, angle +-pi/4
    n = 60
    a_np = np.diag(np.linspace(0.5, 0.01, n))
    a_np[:2, :2] = 2.0 * np.array([[np.cos(np.pi / 4), -np.sin(np.pi / 4)],
                                   [np.sin(np.pi / 4), np.cos(np.pi / 4)]])
    a = jnp.asarray(a_np, jnp.float32)
    theta, _, res, _ = sketched_eigs(a, 2, RNGState.from_key(5), basis=24)
    th = np.asarray(theta)
    assert np.allclose(np.abs(th), 2.0, rtol=1e-3)
    assert np.allclose(np.sort(th.imag), np.sort([-np.sqrt(2.0),
                                                  np.sqrt(2.0)]), rtol=1e-2)
    assert np.all(np.asarray(res) < 1e-2)


def test_symmetric_path_on_device():
    n = 80
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.concatenate([[5.0, -4.0, 3.0], np.linspace(0.5, -0.5, n - 3)])
    a = jnp.asarray(q @ np.diag(lam) @ q.T, jnp.float32)
    a = 0.5 * (a + a.T)
    theta, x, res, _ = sketched_eigs(a, 3, RNGState.from_key(7), basis=60,
                                     trunc=8, sym=True)
    got = np.sort(np.abs(np.asarray(theta)))[::-1]
    np.testing.assert_allclose(got, [5.0, 4.0, 3.0], rtol=2e-2)
    assert theta.dtype == jnp.float32  # real, on-device path
    assert np.all(np.asarray(res) < 5e-2)


@pytest.mark.slow
def test_callable_matches_dense_and_chains_state():
    n = 64
    rng = np.random.default_rng(4)
    a_np = np.diag(np.linspace(3.0, 0.1, n)) + 0.05 * rng.standard_normal(
        (n, n))
    a = jnp.asarray(a_np, jnp.float32)
    st = RNGState.from_key(9)
    t1, _, _, s1 = sketched_eigs(a, 2, st, basis=24)
    t2, _, _, s2 = sketched_eigs(lambda v: a @ v, 2, st, basis=24, n=n)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
    assert s1.to_dict() == s2.to_dict()
    # chained: reusing the returned state gives a different (valid) draw
    t3, _, _, _ = sketched_eigs(a, 2, s1, basis=24)
    assert np.allclose(np.abs(np.asarray(t3)), np.abs(np.asarray(t1)),
                       rtol=5e-2)


def test_sym_path_jittable():
    n = 48
    rng = np.random.default_rng(6)
    m = rng.standard_normal((n, n))
    a = jnp.asarray(0.5 * (m + m.T), jnp.float32)
    fn = jax.jit(lambda aa, s: sketched_eigs(aa, 2, s, basis=20,
                                             sym=True)[0])
    theta = fn(a, RNGState.from_key(11))
    assert bool(jnp.all(jnp.isfinite(theta)))


def test_sym_path_jits_without_callback():
    """The documented jit boundary (docs/linalg.md): sym=True must
    compile with NO host callback anywhere in the module — the whole
    pipeline (Arnoldi, SVD orthonormalization, eigh, residuals) stays
    on-device. (sym=False deliberately calls np.linalg.eig on the host
    and is not jittable at all.)"""
    n = 40
    rng = np.random.default_rng(7)
    # planted spectral gap so the top-2 Ritz pairs converge at basis=16
    # (a gap-free GOE spectrum would need a far larger basis)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    vals = np.concatenate([[10.0, -8.0], rng.uniform(-1, 1, n - 2)])
    a = jnp.asarray((q * vals) @ q.T, jnp.float32)

    def full(aa, s):
        return sketched_eigs(aa, 2, s, basis=16, sym=True)[:3]

    lowered = jax.jit(full).lower(a, RNGState.from_key(3))
    text = lowered.as_text()
    for marker in ("callback", "CustomCall(\"xla_python",
                   "outside_compilation", "host_compute"):
        assert marker not in text, f"host-callback marker {marker!r} in HLO"
    theta, x, resid = jax.jit(full)(a, RNGState.from_key(3))
    # and the Ritz pairs are real eigenpair approximations
    err = np.asarray(a) @ np.asarray(x) - np.asarray(x) * np.asarray(theta)
    assert np.linalg.norm(err, axis=0).max() <= 1e-2 * np.abs(
        np.asarray(theta)).max()
