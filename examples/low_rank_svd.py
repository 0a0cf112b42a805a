"""Randomized low-rank SVD of sparse data via QB (reference: examples/
sparse-low-rank-approx/svd_rank1_plus_noise.cc:217-300).

Builds the reference's test matrix — a rank-1 spike plus sparse noise —
and recovers the dominant singular triple with a sketch-based rangefinder.

Run: python examples/low_rank_svd.py
"""

import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from randblas_tpu import RNGState                              # noqa: E402
from randblas_tpu.sparse_data import COOMatrix                 # noqa: E402
from randblas_tpu.linalg import qb_decompose, qb_to_svd        # noqa: E402


def main():
    m, n = 2000, 1500
    rng = np.random.default_rng(0)
    # sparse rank-1 spike (the reference plants u, v with vec_nnz nonzeros
    # each via Fisher-Yates, svd_rank1_plus_noise.cc:150-180) + sparse
    # noise with nonzero probability 1/1000
    vec_nnz = 32
    u = np.zeros(m, dtype=np.float32)
    v = np.zeros(n, dtype=np.float32)
    u[rng.choice(m, vec_nnz, replace=False)] = \
        rng.choice([-1.0, 1.0], vec_nnz) / np.sqrt(vec_nnz)
    v[rng.choice(n, vec_nnz, replace=False)] = \
        rng.choice([-1.0, 1.0], vec_nnz) / np.sqrt(vec_nnz)
    spike = 25.0 * np.outer(u, v).astype(np.float32)
    mask = rng.random(size=(m, n)) < 1e-3
    noise = (rng.normal(size=(m, n)) * mask).astype(np.float32)
    dense = spike + noise
    a = COOMatrix.from_dense(dense)
    print(f"A: {m}x{n}, nnz={a.nnz} "
          f"({a.nnz / (m * n):.2%} dense)")

    k = 8
    t0 = time.perf_counter()
    q, b = qb_decompose(a, k, RNGState.from_key(3), power_iters=2)
    u_hat, s_hat, vt_hat = qb_to_svd(q, b)
    s_hat.block_until_ready()
    print(f"QB->SVD (k={k}): {time.perf_counter() - t0:.3f}s")
    print("top singular values:", np.asarray(s_hat[:4]).round(3))

    # accuracy of the dominant triple
    cos_u = abs(float(np.dot(np.asarray(u_hat[:, 0]), u)))
    cos_v = abs(float(np.dot(np.asarray(vt_hat[0]), v)))
    print(f"sigma1 rel err: {abs(float(s_hat[0]) - 25.0) / 25.0:.2e}; "
          f"|cos(u)| {cos_u:.6f}, |cos(v)| {cos_v:.6f}")


if __name__ == "__main__":
    main()
