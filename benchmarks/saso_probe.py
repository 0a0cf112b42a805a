"""SASO apply probe: Pallas in-VMEM one-hot kernel vs the XLA one-hot
panel route, same-run pairs across the profit boundary (VERDICT r4
item 6: config 3's 2.9 ms was SLOWER than the dense fused sketch at the
same shape despite 1/128th the math).

Per shape both sides run the apply ONLY (indices/signs prebuilt, so the
pair isolates the dispatch decision; config 3's in-graph FY fill is
measured separately by the fill row). Per-iteration index perturbation
defeats result caching.

Run: python benchmarks/saso_probe.py   (TPU, ~5 min)
Results: BENCH_LOCAL.md "SASO kernel" table.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops.coo_apply import onehot_panel_apply
    from randblas_tpu.ops.saso_sketch import saso_sketch

    k = 8
    shapes = [
        (1024, 65536, 2048),    # config 3
        (1024, 65536, 512),
        (1024, 16384, 2048),
        (1024, 8192, 2048),
        (1024, 4096, 2048),
        (1024, 2048, 2048),
        (512, 65536, 2048),
        (2048, 65536, 2048),
        (256, 65536, 512),
    ]
    print(f"{'d':>5} {'m':>6} {'n':>5} | {'kernel ms':>9} {'panels ms':>9}"
          f" {'ratio':>6}")
    for d, m, n in shapes:
        S = rb.SparseSkOp(rb.SparseDist(d, m, vec_nnz=k),
                          rb.RNGState.from_key(1))
        s = S.filled()
        idx = s.rows.reshape(m, k).astype(jnp.int32)
        vals = s.vals.reshape(m, k)
        A = jnp.asarray(np.random.default_rng(0).normal(
            size=(m, n)).astype(np.float32))

        def body_k(i, carry, idx, vals, a):
            # rotate one slot's indices by i so generation can't cache
            ii = idx.at[:, 0].set((idx[:, 0] + i.astype(jnp.int32)) % d)
            out = saso_sketch(ii, vals, a, d)
            return jnp.sum(out) * jnp.float32(1e-20)

        def body_p(i, carry, idx, vals, a):
            ii = idx.at[:, 0].set((idx[:, 0] + i.astype(jnp.int32)) % d)
            out = onehot_panel_apply(ii, vals, a, d)
            return jnp.sum(out) * jnp.float32(1e-20)

        iters = max(10, int(0.06 / max(2e-3 * (m / 65536) * (n / 2048),
                                       2e-4)))
        tk = time_loop(body_k, idx, vals, A, iters_small=2,
                       iters_large=2 + iters)
        tp = time_loop(body_p, idx, vals, A, iters_small=2,
                       iters_large=2 + iters)
        print(f"{d:>5} {m:>6} {n:>5} | {tk*1e3:9.3f} {tp*1e3:9.3f}"
              f" {tp/tk:6.2f}")

    # config-3 end-to-end (in-graph FY fill + apply) through the public
    # dispatch, both flag settings
    d, m, n = 1024, 65536, 2048
    A = jnp.asarray(np.random.default_rng(2).normal(
        size=(m, n)).astype(np.float32))
    sdist = rb.SparseDist(d, m, vec_nnz=k)

    def body_e2e(i, carry, a):
        st = rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))
        out = rb.sketch_general(rb.SparseSkOp(sdist, st), a)
        return jnp.sum(out) * jnp.float32(1e-20)

    for flag in ("auto", False):
        with rb.flags(use_saso_kernel=flag):
            t = time_loop(body_e2e, A, iters_small=2, iters_large=27)
        eff = 2.0 * k * m * n / t / 1e9
        print(f"config3 end-to-end use_saso_kernel={flag!r}: "
              f"{t*1e3:.3f} ms = {eff:.0f} effective GFLOP/s")


if __name__ == "__main__":
    main()
