"""Fused-vs-staged profit-boundary sweep for the three skge dispatch
gates, in ONE same-run probe (VERDICT r3 #4: the gates were set from
three-point measurements; this charts the full boundary).

Gates under test (randblas_tpu/skge.py; the values BELOW are the ones
this sweep's round-4 run produced — if you re-run the sweep, compare
against the gates currently in skge.py, not this list):
  * RowMajor fused (`_fused_eligible`): auto mode fuses RowMajor-
    natural operators when cols_s >= 1536 AND rows_s >= 512 (was
    2048 / no d gate before this sweep).
  * ColMajor fused (`_left_colmajor_fused_or_none`): tall ColMajor-
    natural operators fuse when cols_s >= 1024 (confirmed).
  * Right-side transpose route (`_right_fused_or_none`): taken when
    the operator block is >= 0.5x the data (was 2x) and the left
    routes' contraction/short-operator floors hold.

Per shape, both sides run the REAL production entries: the fused Pallas
kernel (per-iteration RNGState so generation can't be cached) vs the
staged word-plane fill + GEMM. Ratio > 1.00 means fused is faster.

Run: python benchmarks/gate_sweep.py [row|col|right ...]  (TPU, ~20 min)
Results: BENCH_LOCAL.md "Gate sweep" table.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def _per_iter_state(rb, jnp, carry, i):
    return rb.RNGState.from_arrays(
        jnp.zeros(4, jnp.uint32).at[0].set(
            (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
        jnp.zeros(2, jnp.uint32))


def _measure_pair(d, m, n, kind):
    """(t_fused, t_staged) seconds at one shape through the production
    entries. kind: 'row' (wide RowMajor), 'col' (tall ColMajor),
    'right' (A @ S via the transpose route)."""
    import jax.numpy as jnp
    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops import fused_sketch as fs

    dist = rb.DenseDist(d, m)
    rng = np.random.default_rng(0)
    if kind == "right":
        # data (n, m) times tall-Long operator (m, d): the production
        # route (skge._right_fused_or_none, NoTrans branch) runs the
        # autotransposed wide-RowMajor kernel on a_mat.T. The sweep
        # calls that kernel directly so it can chart BOTH sides of the
        # 2x size-ratio gate (the dispatcher itself returns None below
        # the gate). Requires m > d so the stored operator is tall.
        dist = rb.DenseDist(m, d)
        dist_t = rb.DenseDist(d, m)
        A = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))
    else:
        A = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    flops = 2.0 * d * m * n
    # Size the differencing signal to >= 100 ms at an assumed 100 TF/s
    # (time_loop needs >> 50 ms of signal or the subtraction returns
    # noise — the first sweep's 48-iteration cap produced a literal
    # 283-PFLOP/s "measurement" at the smallest shape).
    iters = 4 + max(12, min(4000, int(100e-3 / (flops / 100e12))))

    def body_fused(i, carry, a):
        st = _per_iter_state(rb, jnp, carry, i)
        if kind == "row":
            out = fs.fused_sketch(rb.DenseSkOp(dist, st), a)
        elif kind == "col":
            out = fs.fused_sketch_colmajor(rb.DenseSkOp(dist, st), a)
        else:
            # mirror of _right_fused_or_none's NoTrans branch
            out = fs.fused_sketch(rb.DenseSkOp(dist_t, st), a.T).T
        return jnp.sum(out) * jnp.float32(1e-20)

    def body_staged(i, carry, a):
        st = _per_iter_state(rb, jnp, carry, i)
        s_mat = rb.fill_dense_submat(dist, st, dist.n_rows, dist.n_cols)
        if kind == "right":
            out = jnp.matmul(a, s_mat, preferred_element_type=jnp.float32)
        else:
            out = jnp.matmul(s_mat, a, preferred_element_type=jnp.float32)
        return jnp.sum(out) * jnp.float32(1e-20)

    t_f = time_loop(body_fused, A, iters_small=4, iters_large=iters,
                    repeats=3)
    t_s = time_loop(body_staged, A, iters_small=4, iters_large=iters,
                    repeats=3)
    return t_f, t_s


SWEEPS = {
    # RowMajor gate: vary the contraction length m through the 2048
    # boundary at two output widths, plus one big-operator anchor.
    "row": [(1024, 1280, 2048), (1024, 1536, 2048), (1024, 2048, 2048),
            (1024, 3072, 2048), (1024, 4096, 2048), (1024, 8192, 2048),
            (1024, 2048, 512), (1024, 4096, 512), (256, 4096, 4096),
            (1024, 65536, 4096)],
    # ColMajor gate: vary m through the 1024 boundary at two operator
    # heights, plus the canonical + large anchors from round 3.
    "col": [(4096, 512, 4096), (4096, 768, 4096), (4096, 1024, 4096),
            (4096, 2048, 4096), (4096, 4096, 4096), (16384, 1024, 2048),
            (16384, 4096, 2048), (8192, 2048, 4096)],
    # Right gate: operator-to-data size ratio r = (m*d)/(n*m) = d/n
    # against the 2x gate (A is n x m, S is m x d, m > d so the stored
    # operator is tall-Long and the autotranspose route applies).
    "right": [(1024, 32768, 2048), (2048, 32768, 2048),
              (4096, 32768, 2048), (8192, 32768, 2048),
              (16384, 32768, 2048)],
}


def main():
    import jax
    print(f"device: {jax.devices()[0]}", flush=True)
    kinds = sys.argv[1:] or list(SWEEPS)
    for kind in kinds:
        print(f"-- {kind} gate --", flush=True)
        for d, m, n in SWEEPS[kind]:
            flops = 2.0 * d * m * n
            try:
                t_f, t_s = _measure_pair(d, m, n, kind)
            except AssertionError as e:
                print(f"d={d:6d} m={m:6d} n={n:5d}: skipped ({e})",
                      flush=True)
                continue
            ratio = t_s / t_f
            extra = f" (size ratio {d / n:.1f}x)" if kind == "right" else ""
            print(f"d={d:6d} m={m:6d} n={n:5d}: "
                  f"fused {flops/t_f/1e12:7.1f} TF/s | "
                  f"staged {flops/t_s/1e12:7.1f} TF/s | "
                  f"fused/staged {ratio:.3f}{extra}", flush=True)


if __name__ == "__main__":
    main()
