"""Probe scatter strategies for the traced-COO apply at the config-4 shape.

The transposed orientation config 4 actually runs (right_spmm reduction):
C^T[(d=10000) x (n=512)] = Asp^T[(10000) x (m=20000)] @ S^T[(20000) x 512],
nnz = 1e6, triplets TRACED (so no host-side format conversion possible).

Variants:
  auto    current coo_left_apply_auto (panels: 3 passes, each scatters nnz)
  full    one scatter into the full (d, m) densified operator + one GEMM
  flat    same but linearized 1-D scatter into a (d*m,) vector
  sorted  flat + argsort(idx) first (indices_are_sorted scatter)
  segsum  gather + segment_sum (nnz x n traffic)

Run (TPU): python benchmarks/coo_probe.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np                                             # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops import coo_apply

    d, m, n = 10_000, 20_000, 512
    nnz = (m * n) // 200 * 2  # matches config 4: (20000*10000)//200 = 1e6
    nnz = 1_000_000
    rng = np.random.default_rng(3)
    # roles transposed: rows in [0, d), cols in [0, m)
    rows = jnp.asarray(rng.integers(0, d, nnz).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, m, nnz).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=nnz).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    flops = 2.0 * nnz * n

    def v_auto(r, c, v, bb):
        return coo_apply.coo_left_apply_auto(r, c, v, bb, d, m)

    def v_full(r, c, v, bb):
        dense = jnp.zeros((d, m), jnp.float32).at[r, c].add(v)
        return jnp.matmul(dense, bb, preferred_element_type=jnp.float32)

    def v_flat(r, c, v, bb):
        idx = r * jnp.int32(m) + c
        dense = jnp.zeros((d * m,), jnp.float32).at[idx].add(v)
        return jnp.matmul(dense.reshape(d, m), bb,
                          preferred_element_type=jnp.float32)

    def v_sorted(r, c, v, bb):
        idx = r * jnp.int32(m) + c
        order = jnp.argsort(idx)
        idx_s = idx[order]
        v_s = v[order]
        dense = jnp.zeros((d * m,), jnp.float32).at[idx_s].add(
            v_s, indices_are_sorted=True)
        return jnp.matmul(dense.reshape(d, m), bb,
                          preferred_element_type=jnp.float32)

    def v_segsum(r, c, v, bb):
        contrib = v[:, None] * bb[c]
        return jax.ops.segment_sum(contrib, r, num_segments=d)

    variants = [("auto", v_auto), ("full", v_full), ("flat", v_flat),
                ("sorted", v_sorted), ("segsum", v_segsum)]
    if len(sys.argv) > 1:
        keep = set(sys.argv[1].split(","))
        variants = [kv for kv in variants if kv[0] in keep]

    # correctness vs the current auto path first (cheap shapes)
    small = 4096
    ref = None
    for name, fn in variants:
        out = jax.jit(fn)(rows[:small], cols[:small], vals[:small], b)
        out = np.asarray(out)
        if ref is None:
            ref = out
        else:
            err = np.abs(out - ref).max() / np.abs(ref).max()
            # GEMM variants run bf16-on-MXU; segment-sum is exact f32
            assert err < 2e-2, (name, err)
    print("correctness ok", flush=True)

    for name, fn in variants:
        def body(i, carry, r, c, v, bb):
            vv = v.at[0].add(carry * jnp.float32(1e-30)
                             + i.astype(jnp.float32) * jnp.float32(1e-30))
            out = fn(r, c, vv, bb)
            return jnp.sum(out) * jnp.float32(1e-20)

        t = time_loop(body, rows, cols, vals, b, iters_large=4)
        print(f"{name:8s} {t*1e3:9.3f} ms  {flops/t/1e9:9.1f} GFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
