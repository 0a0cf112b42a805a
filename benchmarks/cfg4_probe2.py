"""Isolate the slow part of the ColMajor-natural fill at (10000, 512).

Variants (same-run, sum consumer unless noted):
  cm_fill    — fill_dense_submat of DenseDist(10000,512) [.T path], sum
  cm_matvec  — same fill, matvec consumer (forces output layout)
  gen_raw    — fill_rowmajor(ma_len=10000, 512 rows x 10000 cols), no .T
  rm_fill    — RowMajor-natural fill of the same block (major_axis=Short)
  xpose      — transpose alone of a resident (512, 10000) array
  ctl_8k     — 8192x8192 RowMajor-natural fill control (expect ~31 Gelem/s)
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.dense import fill_dense_submat
    from randblas_tpu.ops.dense_fill import fill_rowmajor

    R, C = 10_000, 512

    def mk_state(i, carry):
        return rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))

    def run(name, body, nelem, iters_large=45, **kw):
        t = time_loop(body, *kw.get("args", ()), iters_small=5,
                      iters_large=iters_large, repeats=3)
        print(f"{name}: {t*1e3:.2f} ms ({nelem/t/1e9:.1f} Gelem/s)",
              flush=True)

    cm = rb.DenseDist(R, C)                      # MajorAxis.Long -> ColMajor
    rm = rb.DenseDist(R, C, major_axis="short")  # RowMajor-natural

    def body_cm(i, carry):
        blk = fill_dense_submat(cm, mk_state(i, carry), R, C)
        return jnp.sum(blk) * jnp.float32(1e-20)

    ones = jnp.ones((C,), jnp.float32)

    def body_cm_mv(i, carry, o):
        blk = fill_dense_submat(cm, mk_state(i, carry), R, C)
        return jnp.sum(blk @ o) * jnp.float32(1e-20)

    def body_gen(i, carry):
        flat = fill_rowmajor(R, C, R, 0, mk_state(i, carry), "boxmul")
        return jnp.sum(flat) * jnp.float32(1e-20)

    def body_rm(i, carry):
        blk = fill_dense_submat(rm, mk_state(i, carry), R, C)
        return jnp.sum(blk) * jnp.float32(1e-20)

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(C, R)).astype(np.float32))

    def body_xp(i, carry, xx):
        y = (xx + carry * jnp.float32(1e-30)).T
        return jnp.sum(y @ ones) * jnp.float32(1e-20)

    # candidate fix: generation in natural orientation, optimization
    # barrier so XLA cannot fuse the transpose into the generator, then
    # the standalone transpose (forced to materialize by a second
    # barrier, as feeding a pallas_call would)
    def body_cm_bar(i, carry):
        flat = fill_rowmajor(R, C, R, 0, mk_state(i, carry), "boxmul")
        flat = jax.lax.optimization_barrier(flat)
        blk = jax.lax.optimization_barrier(flat.T)
        return jnp.sum(blk) * jnp.float32(1e-20)

    # what the pallas consumer actually forces: materialized transpose
    def body_cm_mat(i, carry):
        blk = fill_dense_submat(cm, mk_state(i, carry), R, C)
        blk = jax.lax.optimization_barrier(blk)
        return jnp.sum(blk) * jnp.float32(1e-20)

    run("cm_fill (sum)", body_cm, R * C)
    run("cm_fill mat (sum)", body_cm_mat, R * C)
    run("cm_fill barrier (sum)", body_cm_bar, R * C)
    run("cm_fill (matvec)", body_cm_mv, R * C, args=(ones,))
    run("gen_raw no-T (sum)", body_gen, R * C)
    run("rm_fill (sum)", body_rm, R * C)
    run("xpose+matvec", body_xp, R * C, args=(x,))

    K = 8192
    ctl = rb.DenseDist(K, K, major_axis="short")

    def body_ctl(i, carry):
        blk = fill_dense_submat(ctl, mk_state(i, carry), K, K)
        return jnp.sum(blk) * jnp.float32(1e-20)

    run("ctl_8k rm fill", body_ctl, K * K, iters_large=12)


if __name__ == "__main__":
    main()
