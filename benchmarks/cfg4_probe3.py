"""Isolate WHY fill generation at (rows=512, nblk=2500, 4) is ~10x slower
than (rows=10000, nblk=128, 4) (cfg4_probe2 finding: 3.1 vs 33.6 Gelem/s).

Times, same-run:
  bits rm     — raw uint32 generation, fast orientation (10000, 128, 4)
  bits cm     — raw uint32 generation, slow orientation (512, 2500, 4)
  uneg11 rm/cm — elementwise uniform transform on top (no pair slicing)
  boxmul rm/cm — full Box-Muller (pairwise lane slicing + stack)
  boxmul cm rows sweep — (rows, 2500, 4) for rows in {512, 2048, 8192}
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops.dense_fill import fill_rowmajor_bits
    from randblas_tpu.rng.transforms import boxmul_block, uneg11_block

    def mk_state(i, carry):
        return rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))

    def run(name, body, nelem, iters_large=45):
        t = time_loop(body, iters_small=5, iters_large=iters_large,
                      repeats=3)
        print(f"{name}: {t*1e3:.2f} ms ({nelem/t/1e9:.1f} Gelem/s)",
              flush=True)

    CASES = [
        ("rm 10000x(128,4)", 512, 10000, 512),     # parent W=512 -> nblk 128
        ("cm 512x(2500,4)", 10000, 512, 10000),    # parent W=10000
    ]

    for label, ncp, nrows, ncols in CASES:
        def body_bits(i, carry, ncp=ncp, nrows=nrows, ncols=ncols):
            bits, _ = fill_rowmajor_bits(ncp, nrows, ncols, 0,
                                         mk_state(i, carry))
            return (jnp.sum(bits.astype(jnp.float32))
                    * jnp.float32(1e-20))

        def body_u(i, carry, ncp=ncp, nrows=nrows, ncols=ncols):
            bits, _ = fill_rowmajor_bits(ncp, nrows, ncols, 0,
                                         mk_state(i, carry))
            return jnp.sum(uneg11_block(bits)) * jnp.float32(1e-20)

        def body_b(i, carry, ncp=ncp, nrows=nrows, ncols=ncols):
            bits, _ = fill_rowmajor_bits(ncp, nrows, ncols, 0,
                                         mk_state(i, carry))
            return jnp.sum(boxmul_block(bits)) * jnp.float32(1e-20)

        n = nrows * ncols
        run(f"bits   {label}", body_bits, n)
        run(f"uneg11 {label}", body_u, n)
        run(f"boxmul {label}", body_b, n)

    for rows in (2048, 8192):
        def body_b2(i, carry, rows=rows):
            bits, _ = fill_rowmajor_bits(10000, rows, 10000, 0,
                                         mk_state(i, carry))
            return jnp.sum(boxmul_block(bits)) * jnp.float32(1e-20)

        run(f"boxmul {rows}x(2500,4)", body_b2, rows * 10000,
            iters_large=45 if rows <= 2048 else 8)


if __name__ == "__main__":
    main()
