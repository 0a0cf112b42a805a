"""Sketch-and-solve total least squares (reference: examples/
total-least-squares/tls_dense_skop.cc:101-203 and tls_sparse_skop.cc).

Generates a noisy errors-in-variables regression problem (m=10000, n=500,
d=2(n+1) — the reference's default scale), solves it classically and via
dense-Gaussian / sparse-sign sketching, and reports timing + accuracy.

Run: python examples/total_least_squares.py [m] [n]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from randblas_tpu import (                                     # noqa: E402
    DenseDist, DenseSkOp, RNGState, SparseDist, SparseSkOp,
)
from randblas_tpu.linalg import sketched_tls, tls_via_svd      # noqa: E402


def make_problem(m, n, seed=0):
    rng = np.random.default_rng(seed)
    x_true = rng.normal(size=(n,)).astype(np.float32)
    a_true = rng.normal(size=(m, n)).astype(np.float32)
    b_true = a_true @ x_true
    noise = 0.05
    a = a_true + noise * rng.normal(size=(m, n)).astype(np.float32)
    b = b_true + noise * rng.normal(size=(m,)).astype(np.float32)
    return np.hstack([a, b[:, None]]), x_true


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    d = 2 * (n + 1)
    ab_np, x_true = make_problem(m, n)
    ab = jnp.asarray(ab_np)

    def timed(fn, *args):
        """warm timing: first call pays jit compilation, second measures"""
        fn = jax.jit(fn)
        out = fn(*args)
        out.block_until_ready()
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        return out, time.perf_counter() - t0

    x_classic, t_classic = timed(tls_via_svd, ab)
    err_c = float(jnp.linalg.norm(x_classic - x_true)
                  / jnp.linalg.norm(x_true))
    print(f"classical TLS: {t_classic:.3f}s, rel err {err_c:.4f}")

    S = DenseSkOp(DenseDist(d, m), RNGState.from_key(1))
    x_sk, t_dense = timed(sketched_tls, S, ab)
    err_d = float(jnp.linalg.norm(x_sk - x_true) / jnp.linalg.norm(x_true))
    print(f"dense-sketch TLS (d={d}): {t_dense:.3f}s, rel err {err_d:.4f}, "
          f"speedup {t_classic / t_dense:.1f}x")

    # SASO with vec_nnz=8 (tls_sparse_skop.cc:146)
    Ss = SparseSkOp(SparseDist(d, m, vec_nnz=8), RNGState.from_key(2))
    x_sp, t_sparse = timed(sketched_tls, Ss, ab)
    err_s = float(jnp.linalg.norm(x_sp - x_true) / jnp.linalg.norm(x_true))
    print(f"SASO-sketch TLS (vec_nnz=8): {t_sparse:.3f}s, "
          f"rel err {err_s:.4f}, speedup {t_classic / t_sparse:.1f}x")

    # SRHT (no reference analog): O(mn log m) apply, independent of d
    from randblas_tpu import TrigDist, TrigSkOp
    St = TrigSkOp(TrigDist(d, m), RNGState.from_key(3))
    x_t, t_trig = timed(sketched_tls, St, ab)
    err_t = float(jnp.linalg.norm(x_t - x_true) / jnp.linalg.norm(x_true))
    print(f"SRHT-sketch TLS (d={d}): {t_trig:.3f}s, "
          f"rel err {err_t:.4f}, speedup {t_classic / t_trig:.1f}x")


if __name__ == "__main__":
    main()
