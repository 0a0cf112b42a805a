"""Spectrum exploration before committing a rank/shift budget.

The workflow the DOS tier exists for (no reference analog — the
reference ships sampling primitives, util.hh:173-334, not estimators):

1. estimate the eigenvalue DENSITY of a symmetric operator from block
   matvecs only (SLQ and KPM routes),
2. COUNT the eigenvalues in candidate intervals (eig_count) to size a
   rank budget,
3. verify the chosen rank with an actual partial eigendecomposition,
4. stream the matrix's rows through FrequentDirections and check its
   deterministic a-posteriori certificate against the truth.

Run: python examples/spectrum_exploration.py
"""

import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from randblas_tpu import RNGState                              # noqa: E402
from randblas_tpu.linalg import (                              # noqa: E402
    FrequentDirections, eig_count, kpm_density, rand_eigh,
    spectral_density,
)


def main():
    rng = np.random.default_rng(0)
    n = 2048
    # planted spectrum: a 12-eigenvalue signal cluster around 6.0 on top
    # of a noise bulk in [-1, 1] (a spiked model)
    lam = np.concatenate([6.0 + 0.05 * rng.standard_normal(12),
                          np.sort(rng.uniform(-1, 1, n - 12))])
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = jnp.asarray(((q * lam) @ q.T).astype(np.float32))

    st = RNGState.from_key(7)
    t0 = time.perf_counter()
    grid, dens, st = spectral_density(a, st, probes=8, steps=48)
    dens.block_until_ready()
    print(f"SLQ density ({time.perf_counter() - t0:.2f}s): "
          f"integral = {np.trapezoid(np.asarray(dens), np.asarray(grid)):.0f}"
          f" (n = {n})")

    gridk, densk, st = kpm_density(a, st, degree=128, probes=8,
                                   bounds=(-1.5, 6.5))
    print(f"KPM density integral = "
          f"{np.trapezoid(np.asarray(densk), np.asarray(gridk)):.0f}")

    # how big is the spike cluster? (interval endpoints in the gap)
    count, st = eig_count(a, 4.0, 7.0, st, probes=48, steps=64)
    k = int(round(float(count)))
    print(f"eig_count[4, 7] = {float(count):.2f} -> rank budget k = {k}")

    w, _ = rand_eigh(a, k, st)
    print("recovered spike eigenvalues:",
          np.sort(np.asarray(w))[::-1][:4].round(3), "...")

    # stream the rows; FD certifies its own covariance error
    fd = FrequentDirections(n, ell=64)
    for i in range(0, n, 256):
        fd.update(a[i:i + 256])
    b = np.asarray(fd.sketch(), np.float64)
    an = np.asarray(a, np.float64)
    true_err = np.linalg.norm(an.T @ an - b.T @ b, 2)
    cert = float(fd.shrink_mass)
    worst = np.linalg.norm(an, "fro") ** 2 / 64
    print(f"FrequentDirections: true covariance error {true_err:.1f} <= "
          f"certificate {cert:.1f} <= worst-case {worst:.1f}")


if __name__ == "__main__":
    main()
