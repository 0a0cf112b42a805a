"""Integrated config-4b with word-major BlockedELL tables: the full
rb.sketch_sparse body (implicit operator fill + kernel), natural vs
word-major storage order, same run."""

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
    ell = ELLMatrix.from_coo(coo)
    eff = 2.0 * d4 * nnz4
    op_dist = rb.DenseDist(n4, d4)

    def mk_state(i, carry):
        return rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))

    for label, wm in (("natural   ", 0), ("word-major", 4)):
        bell = ell.blocked(word_major=wm)

        def body(i, carry, ci, v, bell=bell):
            S = rb.DenseSkOp(op_dist, mk_state(i, carry))
            sp = ell_spmm.BlockedELL(ci, v, bell.n_rows, bell.n_cols,
                                     bell.kb, bell.bw,
                                     word_major=bell.word_major)
            out = rb.sketch_sparse(S, sp, side="right")
            return jnp.sum(out) * jnp.float32(1e-20)

        t = time_loop(body, bell.local_cols, bell.vals,
                      iters_small=5, iters_large=25, repeats=3)
        print(f"full 4b {label}: {t*1e3:.2f} ms  {eff/t/1e9:.0f} GFLOP/s",
              flush=True)

    # numerics cross-check on hardware (bf16-dot tolerance)
    bell_n = ell.blocked()
    bell_w = ell.blocked(word_major=4)
    S = rb.DenseSkOp(op_dist, 7)
    a = rb.sketch_sparse(S, bell_n, side="right")
    b = rb.sketch_sparse(S, bell_w, side="right")
    rel = float(jnp.max(jnp.abs(a - b))) / float(jnp.max(jnp.abs(a)))
    print(f"natural vs word-major rel diff: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
