"""Locate the remaining config-4b gap (full 4.50 ms vs kernel 2.40 +
fill 0.17): sum consumers are interleave-invariant, so XLA can elide the
word-plane fill's transpose+stack assembly under them. Honest variants:

  fill+barrier  — fill_dense_submat, optimization_barrier, sum (forces
                  the assembled array to materialize)
  fill+kernel   — S.submat -> blocked_ell_matmul (the real consumer,
                  no sksp wrapper)
  kernel carry-b — kernel alone but with b depending on the carry so the
                  bf16 cast+pad cannot be hoisted out of the loop
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
    eff = 2.0 * d4 * nnz4

    def mk_state(i, carry):
        return rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))

    def body_bar(i, carry):
        S = rb.DenseSkOp(op_dist, mk_state(i, carry))
        blk = S.submat(n4, d4, 0, 0)
        blk = jax.lax.optimization_barrier(blk)
        return jnp.sum(blk) * jnp.float32(1e-20)

    t = time_loop(body_bar, iters_small=5, iters_large=120, repeats=3)
    print(f"fill+barrier: {t*1e3:.2f} ms ({n4*d4/t/1e9:.1f} Gelem/s)",
          flush=True)

    def body_fk(i, carry, ci, v):
        S = rb.DenseSkOp(op_dist, mk_state(i, carry))
        blk = S.submat(n4, d4, 0, 0)
        sp = ell_spmm.BlockedELL(ci, v, bell.n_rows, bell.n_cols,
                                 bell.kb, bell.bw)
        out = ell_spmm.blocked_ell_matmul(sp, blk)
        return jnp.sum(out) * jnp.float32(1e-20)

    t = time_loop(body_fk, bell.local_cols, bell.vals,
                  iters_small=5, iters_large=25, repeats=3)
    print(f"fill+kernel: {t*1e3:.2f} ms  {eff/t/1e9:.0f} GFLOP/s",
          flush=True)

    b = jnp.asarray(np.random.default_rng(1).normal(
        size=(n4, d4)).astype(np.float32))

    def body_kc(i, carry, ci, v, bb):
        b2 = bb + carry * jnp.float32(1e-30)
        sp = ell_spmm.BlockedELL(ci, v, bell.n_rows, bell.n_cols,
                                 bell.kb, bell.bw)
        out = ell_spmm.blocked_ell_matmul(sp, b2)
        return jnp.sum(out) * jnp.float32(1e-20)

    t = time_loop(body_kc, bell.local_cols, bell.vals, b,
                  iters_small=5, iters_large=25, repeats=3)
    print(f"kernel carry-b: {t*1e3:.2f} ms  {eff/t/1e9:.0f} GFLOP/s",
          flush=True)


if __name__ == "__main__":
    main()
