"""RNG fill micro-benchmark (counterpart of the reference's
test_basic_rng/benchmark_speed.cc: elapsed time to fill an m x n block).

Run: python benchmarks/rng_speed.py [m] [n] [gaussian|uniform]
Prints one JSON line with elapsed seconds and Gelem/s.
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.dense import DenseDistName

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    fam = (DenseDistName.Uniform if "uniform" in sys.argv[3:]
           else DenseDistName.Gaussian)
    dist = rb.DenseDist(m, n, fam)

    def body(i, carry, _x):
        st = rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))
        arr = rb.fill_dense_submat(dist, st, m, n)
        return jnp.sum(arr) * jnp.float32(1e-20)

    dummy = jnp.zeros((1,), jnp.float32)
    dt = time_loop(body, dummy, iters_large=4)
    print(json.dumps({
        "metric": f"rng_fill_{fam.name.lower()}_{m}x{n}",
        "value": round(dt, 6),
        "unit": "s",
        "gelem_per_s": round(m * n / dt / 1e9, 3),
    }))


if __name__ == "__main__":
    main()
