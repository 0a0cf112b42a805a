"""Same-run fused-vs-staged comparison for ColMajor-natural operators,
through the REAL production entries (fused_sketch_colmajor incl. its bf16
pre-cast, vs fill_dense_submat + GEMM), at several shapes. Decides the
skge auto-dispatch gate after the word-plane fill (round 3)."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops import fused_sketch as fs

    shapes = [
        (4096, 1024, 4096),    # canonical lifting shape
        (8192, 2048, 4096),    # larger operator
        (16384, 4096, 2048),   # bigger still (0.5 GB operator f32)
    ]
    for d, m, n in shapes:
        flops = 2.0 * d * m * n
        S = rb.DenseSkOp(rb.DenseDist(d, m), rb.RNGState.from_key(0))
        dist = S.dist
        A = jnp.asarray(np.random.default_rng(0).normal(
            size=(m, n)).astype(np.float32))
        Smat = S.materialize()

        def body_gemm(i, carry, s, a):
            x = s.at[0, 0].add(carry)
            out = jnp.matmul(x, a, preferred_element_type=jnp.float32)
            return jnp.sum(out) * jnp.float32(1e-20)

        iters = max(20, int(60e-3 / (flops / 180e12)))
        t_roof = time_loop(body_gemm, Smat, A, iters_small=10,
                           iters_large=iters, repeats=3)
        roof = flops / t_roof / 1e9

        def body_fused(i, carry, a):
            st = rb.RNGState.from_arrays(
                jnp.zeros(4, jnp.uint32).at[0].set(
                    (carry * 1e-30).astype(jnp.uint32)
                    + i.astype(jnp.uint32)),
                jnp.zeros(2, jnp.uint32))
            Si = rb.DenseSkOp(dist, st)
            out = fs.fused_sketch_colmajor(Si, a)
            return jnp.sum(out) * jnp.float32(1e-20)

        t_fused = time_loop(body_fused, A, iters_small=10,
                            iters_large=iters, repeats=3)

        def body_staged(i, carry, a):
            st = rb.RNGState.from_arrays(
                jnp.zeros(4, jnp.uint32).at[0].set(
                    (carry * 1e-30).astype(jnp.uint32)
                    + i.astype(jnp.uint32)),
                jnp.zeros(2, jnp.uint32))
            s_mat = rb.fill_dense_submat(dist, st, d, m)
            out = jnp.matmul(s_mat, a, preferred_element_type=jnp.float32)
            return jnp.sum(out) * jnp.float32(1e-20)

        t_staged = time_loop(body_staged, A, iters_small=10,
                             iters_large=iters, repeats=3)
        print(f"d={d} m={m} n={n}: roof {roof:9.1f} GF/s | "
              f"fused {flops/t_fused/1e9:9.1f} ({t_roof/t_fused:.4f}) | "
              f"staged {flops/t_staged/1e9:9.1f} ({t_roof/t_staged:.4f})",
              flush=True)


if __name__ == "__main__":
    main()
