"""Isolate which generated-array dim must be padded for a fast fill,
under an HONEST consumer (a small matmul materializes the fill; sum
consumers let XLA elide transposes and fuse away the materialization).

Cases (config-1 operator geometry: 4002 rows x 100000 cols natural,
Gaussian, no x64):
  A: fill (4002, 100000)              @ ones  — logical config-1 shape
     (fill_rowmajor now generates sublane-aligned rows internally, so
     this case measures the production row-align fix)
  B: fill (4096, 100000) phantom rows @ ones  — fully aligned control
  E: fill (4096, 100000)[:4002]       @ ones  — row pad + row slice
Historical (round-3 diagnosis, same-run honest numbers BEFORE the fix):
  A 183.8 ms / B 21.1 / width-padding-only 186.9 / both 21.4 / E 21.5
  -> the row (sublane) count is the entire effect; width is irrelevant;
  slicing rows afterward is free. See ops/dense_fill.py _ROW_ALIGN.
Usage: python benchmarks/cfg1_probe7.py [A B E ...]
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops.dense_fill import fill_rowmajor

    which = set(a.upper() for a in sys.argv[1:]) or set("ABE")
    m = 100_000

    def state(i, carry):
        return rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))

    def run(tag, body, rows):
        dummy = jnp.zeros((1,), jnp.float32)
        dt = time_loop(body, dummy, iters_large=4)
        print(f"{tag}: {dt*1e3:.2f} ms ({rows*m/dt/1e9:.1f} Gelem/s)",
              flush=True)

    def consume(g):
        ones = jnp.ones((g.shape[1], 128), jnp.float32)
        out = g @ ones
        return (jnp.sum(out) * jnp.float32(1e-20)).astype(jnp.float32)

    if "A" in which:
        def bodyA(i, carry, _x):
            g = fill_rowmajor(m, 4002, m, 0, state(i, carry), "boxmul")
            return consume(g)
        run("A (4002,100000)        ", bodyA, 4002)

    if "B" in which:
        def bodyB(i, carry, _x):
            g = fill_rowmajor(m, 4096, m, 0, state(i, carry), "boxmul")
            return consume(g)
        run("B (4096,100000)        ", bodyB, 4096)

    if "E" in which:
        def bodyE(i, carry, _x):
            g = fill_rowmajor(m, 4096, m, 0, state(i, carry), "boxmul")
            return consume(g[:4002])
        run("E (4096,100000)[:4002] ", bodyE, 4096)


if __name__ == "__main__":
    main()
