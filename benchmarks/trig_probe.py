"""SRHT vs fused dense sketch on the headline shape, and factor-cap sweep.

The SRHT apply is O(m n log m) MXU work independent of d, but each
Kronecker stage is one full HBM pass over the (m_pad, n) block, so the
transform is bandwidth-bound at big m: per stage ~2 * 4 * m * n bytes.
The factor cap trades passes for MXU flops — this probe sweeps it and
compares against the fused dense Gaussian sketch at the same shape
(whose cost scales with d; the SRHT's does not).

Run: python benchmarks/trig_probe.py [--small]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import randblas_tpu as rb
from randblas_tpu.bench_util import time_loop
from randblas_tpu.ops.hadamard import _balanced_factors, next_pow2


def main():
    small = "--small" in sys.argv
    d, m, n = (256, 8192, 512) if small else (1024, 65536, 4096)
    if "--d" in sys.argv:
        d = int(sys.argv[sys.argv.index("--d") + 1])
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    mp = next_pow2(m)
    eff_flops = 2.0 * d * m * n

    def report(name, t, max_factor=None):
        line = f"{name}: {t*1e3:7.3f} ms = {eff_flops/t/1e12:6.2f} eff TFLOP/s"
        if max_factor is not None:
            fs = _balanced_factors(mp, max_factor)
            passes = len(fs)
            hbm = passes * 2.0 * 4.0 * mp * n
            line += (f"  [factors {fs}, {passes} passes, "
                     f"{hbm/t/1e9:5.0f} GB/s]")
        print(line, flush=True)

    trig_dist = rb.TrigDist(d, m)
    for mf in (128, 512, 1024, 2048):
        def body(i, carry, a, mf=mf):
            st = rb.RNGState.from_arrays(
                jnp.zeros(4, jnp.uint32).at[0].set(
                    (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
                jnp.zeros(2, jnp.uint32))
            S = rb.TrigSkOp(trig_dist, st)
            signs, idx = S._sample()
            x = signs[:, None] * a
            if mp != m:
                x = jnp.pad(x, ((0, mp - m), (0, 0)))
            out = rb.hadamard_transform(x, max_factor=mf)[idx, :]
            return jnp.sum(out) * jnp.float32(1e-20)

        report(f"srht mf={mf:4d}", time_loop(body, a, iters_large=12),
               max_factor=mf)

    # bf16 data: the transform is bandwidth-bound, so halving the block
    # bytes should nearly halve the time (+-1 stage constants are exact
    # in bf16; XLA accumulates the MXU dots in f32 either way)
    a16 = a.astype(jnp.bfloat16)

    def body16(i, carry, a16):
        st = rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))
        S = rb.TrigSkOp(trig_dist, st, dtype=jnp.bfloat16)
        signs, idx = S._sample()
        x = signs[:, None] * a16
        if mp != m:
            x = jnp.pad(x, ((0, mp - m), (0, 0)))
        out = rb.hadamard_transform(x, max_factor=512)[idx, :]
        return (jnp.sum(out.astype(jnp.float32)) * jnp.float32(1e-20))

    report("srht bf16    ", time_loop(body16, a16, iters_large=12),
           max_factor=512)

    dense_dist = rb.DenseDist(d, m)

    def body_dense(i, carry, a):
        st = rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))
        S = rb.DenseSkOp(dense_dist, st)
        out = rb.sketch_general(S, a)
        return jnp.sum(out) * jnp.float32(1e-20)

    report("fused dense ", time_loop(body_dense, a, iters_large=12))


if __name__ == "__main__":
    main()
