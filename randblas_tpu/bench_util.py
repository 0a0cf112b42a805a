"""Benchmark timing that is robust to async-dispatch / result-dedup quirks.

Measured lesson from the axon-tunneled TPU in this environment:
``block_until_ready`` does not reliably synchronize, identical dispatches
can be served from a cache, and host<->device transfers have seconds of
latency. The only trustworthy clock is *on-device work inside a single
dispatch*: run the op in a lax.fori_loop with a data dependence between
iterations, fetch one scalar, and difference two loop lengths to cancel
all fixed overhead (dispatch, transfer, compile residue).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def time_loop(make_body, *operands, iters_small: int = 1,
              iters_large: int = 6, repeats: int = 3):
    """Per-iteration seconds of make_body's op.

    make_body(i, carry_scalar, *operands) -> new_carry_scalar must run the
    op under test with a data dependence on (i, carry) so XLA cannot hoist
    or elide iterations. carry is a f32 scalar. Large arrays MUST be passed
    via *operands (jit arguments) — closures would embed them as constants
    in the compile payload.

    The chip behind the tunnel shows multi-percent run-to-run drift;
    raise iters_large/repeats (min-of-N estimator) when a stable number
    matters more than harness latency.

    SIZE THE LOOPS TO THE OP: the differencing signal is
    (iters_large - iters_small) * t_op, and the tunnel's fixed-overhead
    noise is several ms. A signal under ~50 ms produces garbage —
    including absurd rates like "19.7 PFLOP/s" when a min-of-N small
    run lands slow and a large run lands fast (measured; see
    benchmarks/fused_tune.py time_colmajor, which uses 220-iteration
    loops for a ~0.3 ms op).
    """

    def runner(iters):
        @jax.jit
        def run(x0, *ops):
            return jax.lax.fori_loop(
                0, iters, lambda i, c: make_body(i, c, *ops), x0)
        return run

    run_small = runner(iters_small)
    run_large = runner(iters_large)
    # compile + device warmup (also warms the transfer path)
    jax.device_get(run_small(jnp.float32(0.0), *operands))
    jax.device_get(run_large(jnp.float32(0.0), *operands))

    def timed(run, seed_val):
        t0 = time.perf_counter()
        jax.device_get(run(jnp.float32(seed_val), *operands))
        return time.perf_counter() - t0

    # distinct carry seeds defeat any same-dispatch result caching
    t_small = min(timed(run_small, 1.0 + k) for k in range(repeats))
    t_large = min(timed(run_large, 10.0 + k) for k in range(repeats))
    return max(t_large - t_small, 1e-9) / (iters_large - iters_small)
