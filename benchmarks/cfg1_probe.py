"""Localize config-1's per-call overhead (run_all 3.21 vs f64_tune 5.02).

Times, under jax_enable_x64 (as run_all config 1 runs):
  A. operator fill alone (4002 x 100000 Gaussian block, f32 values)
  B. fill + hiprec GEMM (the full sketch_general f64 body)
  C. hiprec GEMM alone with a pre-filled operator (f64_tune's body)
Usage: python benchmarks/cfg1_probe.py [A B C ...]
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops.f64gemm import matmul_hiprec

    which = set(sys.argv[1:]) or {"A", "B", "C"}
    d, m, n = 4002, 100_000, 2_000
    dist = rb.DenseDist(d, m)
    flops = 2.0 * d * m * n

    def state(i, carry):
        return rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))

    if "A" in which:
        def bodyA(i, carry):
            S = rb.DenseSkOp(dist, state(i, carry), dtype=jnp.float64)
            blk = S.submat(d, m, 0, 0).astype(jnp.float32)
            return jnp.sum(blk[:8, :8]).astype(jnp.float32) * \
                jnp.float32(1e-20) + carry * jnp.float32(0.5)

        t = time_loop(bodyA, iters_small=2, iters_large=8)
        print(f"A fill-only: {t*1e3:.1f} ms "
              f"({d*m/t/1e9:.1f} Gelem/s)", flush=True)

    if "B" in which:
        A = jnp.asarray(np.random.default_rng(0).normal(size=(m, n)))

        def bodyB(i, carry, a):
            S = rb.DenseSkOp(dist, state(i, carry), dtype=jnp.float64)
            out = rb.sketch_general(S, a)
            return (jnp.sum(out) * 1e-20).astype(jnp.float32)

        t = time_loop(bodyB, A, iters_large=3)
        print(f"B full body: {t*1e3:.1f} ms  {flops/t/1e12:.2f} TFLOP/s",
              flush=True)

    if "C" in which:
        rng = np.random.default_rng(0)
        a32 = jnp.asarray(rng.normal(size=(d, m)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(m, n)))

        def bodyC(i, carry, a_op, b_op):
            ax = a_op + (carry * 1e-30).astype(jnp.float32)
            out = matmul_hiprec(ax, b_op, slices_a=8)
            return (jnp.sum(out) * 1e-20).astype(jnp.float32)

        t = time_loop(bodyC, a32, b, iters_small=1, iters_large=3)
        print(f"C gemm-only: {t*1e3:.1f} ms  {flops/t/1e12:.2f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
