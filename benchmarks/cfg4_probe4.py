"""Measure the word-plane fill_colmajor fix at the config-4 shape.

Times, same-run:
  cm_fill new  — fill_dense_submat of DenseDist(10000, 512) (ColMajor-
                 natural; now routed through fill_colmajor word planes)
  cm_fill uniform — same, Uniform family
  full 4b      — the run_all.py config-4b body (fill + BlockedELL kernel)
  kernel alone — BlockedELL with pre-materialized operator (context)
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
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
    op_dist_u = rb.DenseDist(n4, d4, rb.DenseDistName.Uniform)
    eff = 2.0 * d4 * nnz4

    def mk_state(i, carry):
        return rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))

    def body_fill(i, carry):
        S = rb.DenseSkOp(op_dist, mk_state(i, carry))
        blk = S.submat(n4, d4, 0, 0)
        return jnp.sum(blk) * jnp.float32(1e-20)

    t = time_loop(body_fill, iters_small=5, iters_large=120, repeats=3)
    print(f"cm_fill new: {t*1e3:.2f} ms ({n4*d4/t/1e9:.1f} Gelem/s)",
          flush=True)

    def body_fill_u(i, carry):
        S = rb.DenseSkOp(op_dist_u, mk_state(i, carry))
        blk = S.submat(n4, d4, 0, 0)
        return jnp.sum(blk) * jnp.float32(1e-20)

    t = time_loop(body_fill_u, iters_small=5, iters_large=120, repeats=3)
    print(f"cm_fill uniform: {t*1e3:.2f} ms ({n4*d4/t/1e9:.1f} Gelem/s)",
          flush=True)

    def body_full(i, carry, ci, v):
        S = rb.DenseSkOp(op_dist, mk_state(i, carry))
        sp = ell_spmm.BlockedELL(ci, v, bell.n_rows, bell.n_cols,
                                 bell.kb, bell.bw)
        out = rb.sketch_sparse(S, sp, side="right")
        return jnp.sum(out) * jnp.float32(1e-20)

    t = time_loop(body_full, bell.local_cols, bell.vals,
                  iters_small=5, iters_large=25, repeats=3)
    print(f"full 4b: {t*1e3:.2f} ms  {eff/t/1e9:.0f} GFLOP/s", flush=True)

    b = jnp.asarray(np.random.default_rng(1).normal(
        size=(n4, d4)).astype(np.float32))

    def body_k(i, carry, ci, v, bb):
        v2 = v.at[0, 0].add(carry * jnp.float32(1e-30))
        b2 = ell_spmm.BlockedELL(ci, v2, bell.n_rows, bell.n_cols,
                                 bell.kb, bell.bw)
        out = ell_spmm.blocked_ell_matmul(b2, bb)
        return jnp.sum(out) * jnp.float32(1e-20)

    t = time_loop(body_k, bell.local_cols, bell.vals, b,
                  iters_small=5, iters_large=25, repeats=3)
    print(f"kernel alone: {t*1e3:.2f} ms  {eff/t/1e9:.0f} GFLOP/s",
          flush=True)


if __name__ == "__main__":
    main()
