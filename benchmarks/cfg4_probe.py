"""Breakdown probe for config 4b (sketch_sparse right via BlockedELL).

Times, separately and on the same run:
  fill   — S.submat(10000, 512) materialization alone
  kernel — blocked_ell_matmul with a pre-materialized operator block
  full   — rb.sketch_sparse(S, bell, side="right") as run_all.py times it

to locate where the gap between the kernel-alone rate (~441 GFLOP/s) and
the full-body rate (234) comes from.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops import ell_spmm
    from randblas_tpu.sparse_data import COOMatrix, ELLMatrix

    m4, n4, d4 = 20_000, 10_000, 512
    rng = np.random.default_rng(3)
    nnz4 = (m4 * n4) // 200
    coo = COOMatrix.from_arrays(
        m4, n4, rng.integers(0, m4, nnz4), rng.integers(0, n4, nnz4),
        rng.normal(size=nnz4).astype(np.float32))
    bell = ELLMatrix.from_coo(coo).blocked()
    op_dist = rb.DenseDist(n4, d4)
    print(f"dist major_axis={op_dist.major_axis} "
          f"natural layout={op_dist!r}", flush=True)
    eff = 2.0 * d4 * nnz4

    def mk_state(i, carry):
        return rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))

    # --- fill alone ---
    def body_fill(i, carry):
        S = rb.DenseSkOp(op_dist, mk_state(i, carry))
        blk = S.submat(n4, d4, 0, 0)
        return jnp.sum(blk) * jnp.float32(1e-20)

    t = time_loop(body_fill, iters_small=5, iters_large=45, repeats=3)
    print(f"fill alone: {t*1e3:.2f} ms "
          f"({n4*d4/t/1e9:.1f} Gelem/s)", flush=True)

    # --- kernel alone ---
    b = jnp.asarray(np.random.default_rng(1).normal(
        size=(n4, d4)).astype(np.float32))

    def body_k(i, carry, ci, v, bb):
        v2 = v.at[0, 0].add(carry * jnp.float32(1e-30))
        b2 = ell_spmm.BlockedELL(ci, v2, bell.n_rows, bell.n_cols,
                                 bell.kb, bell.bw)
        out = ell_spmm.blocked_ell_matmul(b2, bb)
        return jnp.sum(out) * jnp.float32(1e-20)

    t = time_loop(body_k, bell.local_cols, bell.vals, b,
                  iters_small=5, iters_large=45, repeats=3)
    print(f"kernel alone: {t*1e3:.2f} ms  {eff/t/1e9:.0f} GFLOP/s",
          flush=True)

    # --- full body (as run_all.py) ---
    def body_full(i, carry, ci, v):
        S = rb.DenseSkOp(op_dist, mk_state(i, carry))
        sp = ell_spmm.BlockedELL(ci, v, bell.n_rows, bell.n_cols,
                                 bell.kb, bell.bw)
        out = rb.sketch_sparse(S, sp, side="right")
        return jnp.sum(out) * jnp.float32(1e-20)

    t = time_loop(body_full, bell.local_cols, bell.vals,
                  iters_small=5, iters_large=45, repeats=3)
    print(f"full body: {t*1e3:.2f} ms  {eff/t/1e9:.0f} GFLOP/s",
          flush=True)

    # --- fill + kernel back to back (no sksp plumbing) ---
    def body_fk(i, carry, ci, v):
        S = rb.DenseSkOp(op_dist, mk_state(i, carry))
        blk = S.submat(n4, d4, 0, 0)
        sp = ell_spmm.BlockedELL(ci, v, bell.n_rows, bell.n_cols,
                                 bell.kb, bell.bw)
        out = ell_spmm.blocked_ell_matmul(sp, blk)
        return jnp.sum(out) * jnp.float32(1e-20)

    t = time_loop(body_fk, bell.local_cols, bell.vals,
                  iters_small=5, iters_large=45, repeats=3)
    print(f"fill+kernel direct: {t*1e3:.2f} ms  {eff/t/1e9:.0f} GFLOP/s",
          flush=True)


if __name__ == "__main__":
    main()
