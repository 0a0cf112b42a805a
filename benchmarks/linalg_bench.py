"""Measured TPU numbers for the randomized-linalg tier.

Times three representative production pipelines end to end on the real
chip via bench_util.time_loop (on-device loop differencing — see that
module's docstring for why wall clocks lie through the axon tunnel):

  1. rsvd: rank-256 randomized SVD of a 32768 x 4096 f32 matrix
     (2 power iterations, p=8). Dominant cost ~ 6 * m*n*k MXU flops.
  2. nystrom_pcg: regularized solve of an 8192^2 SPD system with a
     d=512 Nystrom preconditioner (the FTU21 kernel-ridge shape).
  3. ridge_lsq: 131072 x 2048 Blendenpik ridge solve, SASO embedding.

Run: python benchmarks/linalg_bench.py  (TPU; minutes — tunnel compiles)
Numbers recorded in BENCH_LOCAL.md.
"""

import sys
import numpy as np

sys.path.insert(0, ".")

import jax                                                      # noqa: E402
import jax.numpy as jnp                                         # noqa: E402


from randblas_tpu import RNGState                               # noqa: E402
from randblas_tpu.bench_util import time_loop                   # noqa: E402
from randblas_tpu.linalg import nystrom_pcg, ridge_lsq, rsvd    # noqa: E402


def bench_rsvd():
    m, n, rank = 32768, 4096, 256
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))

    def body(i, carry, a_op):
        # data dependence on (i, carry) so iterations can't be elided
        u, s, vt = rsvd(a_op + carry * 0.0, rank,
                        RNGState.from_key(7), power_iters=2)
        return carry + s[0] * 1e-20 + jnp.float32(i) * 0.0

    t = time_loop(body, a, iters_small=1, iters_large=4, repeats=2)
    k = rank + 8
    flops = 6 * m * n * k            # sketch + 2 power iters + B
    print(f"rsvd {m}x{n} rank {rank}: {t*1e3:.1f} ms/solve "
          f"(~{flops/t/1e12:.1f} TFLOP/s on the dominant products)")


def bench_nystrom_pcg():
    n, d = 8192, 512
    rng = np.random.default_rng(1)
    g = rng.normal(size=(n, 64)).astype(np.float32) / 8.0
    a = jnp.asarray(g @ g.T + 0.1 * np.eye(n, dtype=np.float32))
    b = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def body(i, carry, a_op, b_op):
        x, iters, _ = nystrom_pcg(a_op, b_op + carry * 0.0,
                                  RNGState.from_key(8), d=d, mu=1e-3,
                                  tol=1e-5, maxiter=60)
        return carry + x[0] * 1e-20 + jnp.float32(i) * 0.0

    t = time_loop(body, a, b, iters_small=1, iters_large=3, repeats=2)
    print(f"nystrom_pcg n={n}, d={d}: {t*1e3:.1f} ms/solve")


def bench_ridge():
    m, n = 131072, 2048
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=m).astype(np.float32))

    def body(i, carry, a_op, b_op):
        x, iters, _ = ridge_lsq(a_op, b_op + carry * 0.0, 1e-2,
                                RNGState.from_key(9), tol=1e-5,
                                maxiter=40)
        return carry + x[0] * 1e-20 + jnp.float32(i) * 0.0

    t = time_loop(body, a, b, iters_small=1, iters_large=3, repeats=2)
    print(f"ridge_lsq {m}x{n}: {t*1e3:.1f} ms/solve")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    bench_rsvd()
    bench_nystrom_pcg()
    bench_ridge()
