"""Candidate data paths for feeding the ColMajor-natural operator fill
into the BlockedELL kernel (the fill->pallas relayout costs ~2.1 ms at
the config-4 shape; cfg4_probe5.py).

TIMING-ONLY: the deinterleaved variants feed word-major-ordered B to a
bell built for natural order, so values are wrong — the cost of the data
path is identical to the permuted-conversion design being evaluated.

  int_f32   — current path: assembled fill -> cast+pad -> kernel
  int_bf16  — assembled fill cast to bf16 in plane form, pad, kernel
  deint_f32 — planes -> 4 transposes + concat (no interleave), kernel
  deint_bf16 — planes cast bf16, transposes + concat, kernel
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops import ell_spmm
    from randblas_tpu.ops.dense_fill import fill_colmajor_planes
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

    kpb = 4
    n_k = bell.n_kblocks
    blocks_pad = -(-n_k // kpb) * kpb
    k_pad = blocks_pad * bell.kb
    extra = (blocks_pad - n_k) * bell.bw
    ci = jnp.pad(bell.local_cols, ((0, extra), (0, 0)), constant_values=-1)
    va = jnp.pad(bell.vals, ((0, extra), (0, 0)))
    m_pad = ci.shape[1]
    ti, tn = min(2048, m_pad), 512

    def mk_state(i, carry):
        return rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))

    def call(b, v):
        return ell_spmm._call(ci, v, b, alpha=1.0, ti=ti, kb=bell.kb,
                              tn=tn, bw=bell.bw, interpret=False, kpb=kpb)

    def pad_k(b):
        return jnp.pad(b, ((0, k_pad - b.shape[0]), (0, 0)))

    def run(name, body, iters_large=25):
        t = time_loop(body, bell.vals, iters_small=5,
                      iters_large=iters_large, repeats=3)
        print(f"{name}: {t*1e3:.2f} ms  {eff/t/1e9:.0f} GFLOP/s",
              flush=True)

    def planes(i, carry):
        gs, fbs, rows_gen, nblk = fill_colmajor_planes(
            n4, d4, n4, 0, mk_state(i, carry), "boxmul")
        assert fbs == 0 and rows_gen == d4
        return gs

    def body_int_f32(i, carry, v):
        S = rb.DenseSkOp(op_dist, mk_state(i, carry))
        blk = S.submat(n4, d4, 0, 0)
        v = v.at[0, 0].add(carry * jnp.float32(1e-30))
        out = call(pad_k(blk.astype(jnp.bfloat16)), va)
        return jnp.sum(out) * jnp.float32(1e-20)

    def body_int_bf16(i, carry, v):
        gs = planes(i, carry)
        blk = jnp.stack([g.astype(jnp.bfloat16).T for g in gs],
                        axis=1).reshape(n4, d4)
        out = call(pad_k(blk), va)
        return jnp.sum(out) * jnp.float32(1e-20)

    def body_deint_f32(i, carry, v):
        gs = planes(i, carry)
        blk = jnp.concatenate([g.T for g in gs], axis=0)  # (n4, d4) wrong order
        out = call(pad_k(blk.astype(jnp.bfloat16)), va)
        return jnp.sum(out) * jnp.float32(1e-20)

    def body_deint_bf16(i, carry, v):
        gs = planes(i, carry)
        blk = jnp.concatenate([g.astype(jnp.bfloat16).T for g in gs],
                              axis=0)
        out = call(pad_k(blk), va)
        return jnp.sum(out) * jnp.float32(1e-20)

    run("int_f32  ", body_int_f32)
    run("int_bf16 ", body_int_bf16)
    run("deint_f32", body_deint_f32)
    run("deint_bf16", body_deint_bf16)


if __name__ == "__main__":
    main()
