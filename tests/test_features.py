"""Tests for linalg/features.py (random Fourier features)."""

import jax.numpy as jnp
import numpy as np
import pytest

import randblas_tpu as rbt
from randblas_tpu import RNGState
from randblas_tpu import linalg as rla


@pytest.mark.slow
def test_kernel_approximation():
    # z(x)^T z(y) converges to the RBF kernel at ~1/sqrt(D)
    rng = np.random.default_rng(1)
    n, d, D = 80, 5, 8192
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    bw = 0.8
    z, nxt = rla.random_fourier_features(x, D, bw, RNGState.from_key(2))
    assert z.shape == (n, D)
    k_hat = np.asarray(z @ z.T)
    xn = np.asarray(x)
    d2 = ((xn[:, None, :] - xn[None, :, :]) ** 2).sum(-1)
    k_true = np.exp(-d2 / (2 * bw**2))
    assert np.abs(k_hat - k_true).max() < 0.06          # ~4/sqrt(D)
    assert nxt.to_dict() != RNGState.from_key(2).to_dict()


@pytest.mark.slow
def test_reproducible_and_error_shrinks_with_D():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (40, 4)), jnp.float32)
    z1, n1 = rla.random_fourier_features(x, 512, 1.0, RNGState.from_key(4))
    z2, n2 = rla.random_fourier_features(x, 512, 1.0, RNGState.from_key(4))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    assert n1.to_dict() == n2.to_dict()

    xn = np.asarray(x)
    d2 = ((xn[:, None, :] - xn[None, :, :]) ** 2).sum(-1)
    k_true = np.exp(-d2 / 2.0)

    def err(D, seed):
        z, _ = rla.random_fourier_features(x, D, 1.0,
                                           RNGState.from_key(seed))
        return np.abs(np.asarray(z @ z.T) - k_true).max()

    # averaged over seeds, error drops with D (1/sqrt rate)
    e_small = np.mean([err(256, s) for s in range(5)])
    e_big = np.mean([err(16384, s) for s in range(5)])
    assert e_big < e_small / 2


@pytest.mark.slow
def test_feature_ridge_matches_kernel_solve():
    # primal: ridge on RFF features ~= dual kernel ridge (nystrom_pcg)
    rng = np.random.default_rng(5)
    n, d, D = 1500, 3, 1024          # tall primal: more samples than
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)  # features
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0])
                    + 0.05 * rng.normal(size=n), jnp.float32)
    bw, mu = 0.7, 1e-2
    z, _ = rla.random_fourier_features(x, D, bw, RNGState.from_key(6))
    w, _, _ = rla.ridge_lsq(z, y, mu, RNGState.from_key(7), tol=1e-6)
    pred_primal = np.asarray(z @ w)
    # dual solve on the exact kernel
    xn = np.asarray(x)
    d2 = ((xn[:, None, :] - xn[None, :, :]) ** 2).sum(-1)
    K = jnp.asarray(np.exp(-d2 / (2 * bw**2)), jnp.float32)
    alpha, _, _ = rla.nystrom_pcg(K, y, RNGState.from_key(8), d=80, mu=mu)
    pred_dual = np.asarray(K @ alpha)
    # both are mu-regularized fits of the same kernel: predictions agree
    # to the feature-approximation level
    assert np.abs(pred_primal - pred_dual).max() < 0.1
    assert np.sqrt(np.mean((pred_primal - np.asarray(y)) ** 2)) < 0.1


def test_validates():
    with pytest.raises(ValueError):
        rla.random_fourier_features(jnp.zeros((4,), jnp.float32), 8, 1.0,
                                    RNGState.from_key(9))
    with pytest.raises(ValueError):
        rla.random_fourier_features(jnp.zeros((4, 2), jnp.float32), 8,
                                    0.0, RNGState.from_key(9))
