"""Kernel ridge regression with a Nystrom-preconditioned CG solve.

The production-shaped consumer of nystrom_pcg (Frangella-Tropp-Udell
2021's headline application): fit f(x) = sum_i alpha_i k(x_i, x) by
solving the n x n SPD system (K + n*mu*I) alpha = y. The kernel matrix
is dense and ill-conditioned; one rank-d Nystrom sketch of K (d matvecs,
riding the framework's sketching dispatch) buys a preconditioner that
makes CG converge in a spectrum-independent handful of iterations.

The reference library has no solver tier at all — this is the kind of
pipeline its users build on top; here it is three library calls.

Run: python examples/kernel_ridge.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp                                        # noqa: E402

from randblas_tpu import RNGState                              # noqa: E402
from randblas_tpu.linalg import nystrom_pcg                    # noqa: E402


def rbf_kernel(x1, x2, bandwidth):
    d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
    return jnp.exp(-d2 / (2.0 * bandwidth**2))


def main():
    rng = np.random.default_rng(0)
    n, n_test, dim = 3000, 500, 4
    x = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    x_test = rng.uniform(-1, 1, (n_test, dim)).astype(np.float32)
    f = lambda z: np.sin(3 * z[:, 0]) * np.cos(2 * z[:, 1]) + 0.5 * z[:, 2]
    y = (f(x) + 0.05 * rng.normal(size=n)).astype(np.float32)

    bandwidth, mu = 0.5, 1e-4
    k_mat = rbf_kernel(jnp.asarray(x), jnp.asarray(x), bandwidth)

    t0 = time.perf_counter()
    alpha, iters, _ = nystrom_pcg(k_mat, jnp.asarray(y),
                                  RNGState.from_key(1),
                                  d=200, mu=n * mu, tol=1e-6)
    alpha.block_until_ready() if hasattr(alpha, "block_until_ready") else None
    t1 = time.perf_counter()

    k_test = rbf_kernel(jnp.asarray(x_test), jnp.asarray(x), bandwidth)
    pred = np.asarray(k_test @ alpha)
    rmse = float(np.sqrt(np.mean((pred - f(x_test)) ** 2)))
    res = float(jnp.linalg.norm(k_mat @ alpha + n * mu * alpha
                                - jnp.asarray(y)))
    print(f"kernel ridge: n={n}, d=200 Nystrom sketch, "
          f"{int(iters)} CG iterations, {t1 - t0:.2f}s")
    print(f"  system residual {res:.2e}, test RMSE {rmse:.4f} "
          f"(noise floor 0.05)")


if __name__ == "__main__":
    main()
