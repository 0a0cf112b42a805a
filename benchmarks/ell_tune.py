"""Tuning/diagnostic harness for the BlockedELL SpMM kernel at the
config-4 narrow-output shape.

Usage: python benchmarks/ell_tune.py [time|check]

Measures the kernel at (m=20000, k=10000, 0.5% density) for n in
{512, 2048} together with a build-only and dot-only breakdown, to locate
where the narrow-n collapse (BENCH_LOCAL config 4: 362 GFLOP/s at n=512
vs 592 at 2048) comes from. VPU and MXU are strictly additive on v5e
(ROADMAP), so the build cost is pure overhead at every n.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def _matrix():
    import jax.numpy as jnp
    from randblas_tpu.sparse_data import COOMatrix, ELLMatrix
    m, k = 20_000, 10_000
    nnz = (m * k) // 200
    rng = np.random.default_rng(3)
    coo = COOMatrix.from_arrays(
        m, k, rng.integers(0, m, nnz), rng.integers(0, k, nnz),
        rng.normal(size=nnz).astype(np.float32))
    bell = ELLMatrix.from_coo(coo).blocked()
    return bell, nnz


def check():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from randblas_tpu.ops.ell_spmm import blocked_ell_matmul
    from randblas_tpu.sparse_data import COOMatrix, ELLMatrix
    m, k, nnz = 300, 500, 900
    rng = np.random.default_rng(0)
    coo = COOMatrix.from_arrays(
        m, k, rng.integers(0, m, nnz), rng.integers(0, k, nnz),
        rng.normal(size=nnz).astype(np.float32))
    bell = ELLMatrix.from_coo(coo).blocked()
    b = jnp.asarray(rng.normal(size=(k, 64)).astype(np.float32))
    got = np.asarray(blocked_ell_matmul(bell, b, interpret=True))
    dense = np.zeros((m, k), np.float32)
    np.add.at(dense, (np.asarray(coo.rows), np.asarray(coo.cols)),
              np.asarray(coo.vals))
    want = (dense.astype(np.float32) @ np.asarray(b))
    rel = np.abs(got - want).max() / np.abs(want).max()
    print("check rel err (bf16 dots):", rel)
    assert rel < 5e-2
    print("OK")


def time_sweep():
    import jax
    import jax.numpy as jnp
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops import ell_spmm

    bell, nnz = _matrix()
    print(f"bell: rows={bell.n_rows} cols={bell.n_cols} kb={bell.kb} "
          f"bw={bell.bw} blocks={bell.n_kblocks}", flush=True)
    rng = np.random.default_rng(1)

    for n in (512, 2048):
        b = jnp.asarray(rng.normal(size=(bell.n_cols, n)).astype(
            np.float32))
        eff_flops = 2.0 * nnz * n

        def body(i, carry, ci, v, bb):
            v2 = v.at[0, 0].add(carry * jnp.float32(1e-30))
            bell2 = ell_spmm.BlockedELL(ci, v2, bell.n_rows, bell.n_cols,
                                        bell.kb, bell.bw)
            out = ell_spmm.blocked_ell_matmul(bell2, bb)
            return jnp.sum(out) * jnp.float32(1e-20)

        t = time_loop(body, bell.local_cols, bell.vals, b,
                      iters_small=5, iters_large=45, repeats=3)
        print(f"n={n}: {t*1e3:.2f} ms  {eff_flops/t/1e9:.0f} GFLOP/s "
              f"effective", flush=True)


def time_tiered():
    """Two-tier (bw_cap) sweep at the config-4 shape."""
    import jax
    import jax.numpy as jnp
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops import ell_spmm
    from randblas_tpu.sparse_data import COOMatrix, ELLMatrix

    import numpy as np
    m, k = 20_000, 10_000
    nnz = (m * k) // 200
    rng = np.random.default_rng(3)
    coo = COOMatrix.from_arrays(
        m, k, rng.integers(0, m, nnz), rng.integers(0, k, nnz),
        rng.normal(size=nnz).astype(np.float32))
    ell = ELLMatrix.from_coo(coo)
    rng2 = np.random.default_rng(1)
    for cap in (None, 2, 1):
        bell = ell.blocked(bw_cap=cap)
        print(f"bw_cap={cap}: bw={bell.bw} ovf={bell.ovf_nnz} "
              f"({100.0*bell.ovf_nnz/nnz:.1f}%)", flush=True)
        for n in (512, 2048):
            b = jnp.asarray(rng2.normal(size=(k, n)).astype(np.float32))
            eff = 2.0 * nnz * n

            def body(i, carry, ci, v, orr, oc, ov, bb, bell=bell):
                v2 = v.at[0, 0].add(carry * jnp.float32(1e-30))
                b2 = ell_spmm.BlockedELL(ci, v2, bell.n_rows,
                                         bell.n_cols, bell.kb, bell.bw,
                                         orr, oc, ov)
                out = ell_spmm.blocked_ell_matmul(b2, bb)
                return jnp.sum(out) * jnp.float32(1e-20)

            t = time_loop(body, bell.local_cols, bell.vals,
                          bell.ovf_rows, bell.ovf_cols, bell.ovf_vals,
                          b, iters_small=5, iters_large=45, repeats=3)
            print(f"  n={n}: {t*1e3:.2f} ms  {eff/t/1e9:.0f} GFLOP/s",
                  flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check()
    elif mode == "tiered":
        time_tiered()
    else:
        time_sweep()
