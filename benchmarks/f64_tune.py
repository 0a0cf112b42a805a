"""Tuning harness for the int8-sliced f64 GEMM at the TLS (config 1) shape.

Usage: python benchmarks/f64_tune.py [kblock ...] | check

Measures matmul_hiprec at the config-1 call shape — a = operator block
(d x m, f32-exact, slices_a=8), b = data (m x n, f64) — across k_block
values, printing TFLOP/s. The per-call operand slicing is inside the
timed body exactly as sketch_general dispatches it. 'check' verifies the
padded kernel still matches an f64 numpy oracle at the odd shape.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops.f64gemm import matmul_hiprec

    mode = sys.argv[1] if len(sys.argv) > 1 else "time"

    d, m, n = 4002, 100_000, 2_000
    rng = np.random.default_rng(0)

    if mode == "check":
        dd, mm, nn = 130, 1000, 77  # odd everything
        a = rng.normal(size=(dd, mm))
        b = rng.normal(size=(mm, nn))
        got = np.asarray(matmul_hiprec(jnp.asarray(a), jnp.asarray(b)))
        want = a @ b
        rel = np.abs(got - want).max() / np.abs(want).max()
        print("check rel err:", rel)
        assert rel < 1e-14
        # f32-exact a with slices_a=8 (the sketch path's form)
        a32 = a.astype(np.float32)
        got2 = np.asarray(matmul_hiprec(jnp.asarray(a32), jnp.asarray(b),
                                        slices_a=8))
        want2 = a32.astype(np.float64) @ b
        rel2 = np.abs(got2 - want2).max() / np.abs(want2).max()
        print("check f32-exact rel err:", rel2)
        assert rel2 < 1e-14
        print("OK")
        return

    kbs = [int(x) for x in sys.argv[1:]] or [8192, 16384, 32768]
    a32 = jnp.asarray(rng.normal(size=(d, m)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(m, n)))
    flops = 2.0 * d * m * n

    for kb in kbs:
        def body(i, carry, a_op, b_op):
            ax = a_op + (carry * 1e-30).astype(jnp.float32)
            out = matmul_hiprec(ax, b_op, slices_a=8, k_block=kb)
            return (jnp.sum(out) * 1e-20).astype(jnp.float32)

        t = time_loop(body, a32, b, iters_small=1, iters_large=3)
        print(f"k_block={kb}: {t*1e3:.1f} ms  "
              f"{flops / t / 1e12:.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
