"""Tuning harness for the fused RNG-in-GEMM kernel.

Usage:
  python benchmarks/fused_tune.py check   # CPU interpret-mode bitwise check
  python benchmarks/fused_tune.py time    # TPU sweep over row_chunks

The `time` sweep reports GFLOP/s at the headline shape (d=1024, m=65536,
n=4096) for each row_chunks setting, plus the materialized-GEMM roofline,
using the same time_loop methodology as bench.py.
"""

import sys

import numpy as np


def check():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import randblas_tpu as rb
    from randblas_tpu.ops import fused_sketch as fs

    d, m, n = 16, 64, 256
    S = rb.DenseSkOp(rb.DenseDist(d, m), rb.RNGState.from_key(7))
    A = jnp.asarray(
        np.random.default_rng(1).normal(size=(m, n)).astype(np.float32))
    seed_words = jnp.concatenate([
        S.seed_state.counter, S.seed_state.key,
        jnp.zeros((2,), jnp.uint32)]).reshape(1, 8)
    kw = dict(d=d, m=m, gaussian=True, alpha=1.0, ti=16, tk=32, tn=256,
              ctr_stride=m // 4, interpret=True)
    ref = fs._fused_call(seed_words, A, **kw, row_chunks=1)
    for rc in (2, 4, 8):
        out = fs._fused_call(seed_words, A, **kw, row_chunks=rc)
        same = bool(jnp.all(out == ref))
        print(f"row_chunks={rc}: bitwise_equal={same}")
        assert same
    # oracle: materialized fill @ A
    Smat, _ = rb.fill_dense(S.dist, S.seed_state)
    err = float(jnp.max(jnp.abs(ref - Smat @ A)))
    print(f"vs materialized GEMM max abs err: {err:.3e}")
    print("CHECK OK")


def time_sweep():
    import jax
    import jax.numpy as jnp
    import randblas_tpu as rb
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops import fused_sketch as fs

    d, m, n = 1024, 65536, 4096
    flops = 2.0 * d * m * n
    S = rb.DenseSkOp(rb.DenseDist(d, m), rb.RNGState.from_key(0))
    seed_words = jnp.concatenate([
        S.seed_state.counter, S.seed_state.key,
        jnp.zeros((2,), jnp.uint32)]).reshape(1, 8)
    A = jnp.asarray(
        np.random.default_rng(0).normal(size=(m, n)).astype(np.float32))
    _, _, _, ti, tk, tn = fs._plan(d, m, n)

    Smat, _ = rb.fill_dense(S.dist, S.seed_state)

    def body_gemm(i, carry, s, a):
        x = s.at[0, 0].add(carry)
        out = jnp.matmul(x, a, preferred_element_type=jnp.float32)
        return jnp.sum(out) * jnp.float32(1e-20)

    def measure_roof():
        t = time_loop(body_gemm, Smat, A, iters_small=4, iters_large=24,
                      repeats=4)
        return flops / t / 1e9

    roofs = [measure_roof()]
    print(f"roofline: {roofs[0]:.1f} GFLOP/s", flush=True)

    configs = [
        # control: current production config
        ("ti=1024 rc=32 ft", dict(alias_acc=True, row_chunks=32,
                                  fast_cos=True)),
        ("ti=512 rc=16 ft", dict(alias_acc=True, row_chunks=16,
                                 fast_cos=True, ti=512)),
        ("ti=512 rc=8 ft", dict(alias_acc=True, row_chunks=8,
                                fast_cos=True, ti=512)),
        ("ti=256 rc=8 ft", dict(alias_acc=True, row_chunks=8,
                                fast_cos=True, ti=256)),
        ("ti=1024 rc=32 tk=1024 ft", dict(alias_acc=True, row_chunks=32,
                                          fast_cos=True, tk=1024)),
        ("ti=512 rc=16 tk=1024 ft", dict(alias_acc=True, row_chunks=16,
                                         fast_cos=True, ti=512, tk=1024)),
    ]
    for label, over in configs:
        kw = dict(d=d, m=m, gaussian=over.pop("gaussian", True),
                  alpha=1.0, ti=over.pop("ti", ti),
                  tk=over.pop("tk", tk), tn=tn,
                  ctr_stride=m // 4)
        kw.update(over)

        def body(i, carry, sw, a, kw=kw):
            sw2 = sw.at[0, 4].add(i.astype(jnp.uint32)
                                  + (carry * 1e-30).astype(jnp.uint32))
            out = fs._fused_call(sw2, a, **kw)
            return jnp.sum(out) * jnp.float32(1e-20)

        try:
            t = time_loop(body, seed_words, A, iters_small=4,
                          iters_large=24, repeats=4)
            g = flops / t / 1e9
            print(f"{label:32s}: {g:8.1f} GFLOP/s  "
                  f"vs_roof={g / roofs[-1]:.4f}", flush=True)
        except Exception as e:
            print(f"{label:32s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    roofs.append(measure_roof())
    print(f"roofline (re-measured): {roofs[-1]:.1f} GFLOP/s "
          f"(drift {roofs[-1] / roofs[0]:.3f})", flush=True)


def time_colmajor():
    """ColMajor (transposed-generation) kernel at a lifting shape
    (d > m) vs the staged fill+GEMM path and the materialized roofline."""
    import jax
    import jax.numpy as jnp
    import randblas_tpu as rb
    from randblas_tpu.base import MajorAxis
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops import fused_sketch as fs

    d, m, n = 4096, 1024, 4096   # tall + Long = ColMajor natural
    flops = 2.0 * d * m * n
    S = rb.DenseSkOp(rb.DenseDist(d, m), rb.RNGState.from_key(0))
    from randblas_tpu.dense import dist_to_layout
    print("layout:", dist_to_layout(S.dist))
    A = jnp.asarray(
        np.random.default_rng(0).normal(size=(m, n)).astype(np.float32))
    Smat = S.materialize()

    def body_gemm(i, carry, s, a):
        x = s.at[0, 0].add(carry)
        out = jnp.matmul(x, a, preferred_element_type=jnp.float32)
        return jnp.sum(out) * jnp.float32(1e-20)

    t_roof = time_loop(body_gemm, Smat, A, iters_small=20,
                       iters_large=220, repeats=3)
    roof = flops / t_roof / 1e9
    print(f"roofline: {roof:.1f} GFLOP/s", flush=True)

    d_pad, m_pad, n_pad, ti, tk, tn = fs._plan_T(d, m, n)
    base = S.seed_state
    sw = fs._seed_words(base)
    A16 = A.astype(jnp.bfloat16)
    variants = [
        ("T slab: exec_opts_T (prod)", fs._fused_call_T, ti, tk, tn,
         dict(fs.exec_opts_T(ti)), False),
        ("T slab ti256tk1024 bf16", fs._fused_call_T, 256, 1024, tn,
         dict(fast_cos=True), True),
        ("T slab ti512tk1024 bf16", fs._fused_call_T, 512, 1024, tn,
         dict(fast_cos=True), True),
        ("T slab ti512tk1024 bf16 rc2", fs._fused_call_T, 512, 1024, tn,
         dict(fast_cos=True, row_chunks=2), True),
        ("T slab ti256tk512 bf16", fs._fused_call_T, 256, 512, tn,
         dict(fast_cos=True), True),
        ("T slab ti1024tk1024 bf16", fs._fused_call_T, 1024, 1024, tn,
         dict(fast_cos=True), True),
    ]
    for label, call, ti_v, tk_v, tn_v, opts, use16 in variants:
        a_op = A16 if use16 else A

        def body(i, carry, s, a, call=call, ti_v=ti_v, tk_v=tk_v,
                 tn_v=tn_v, opts=opts):
            s2 = s.at[0, 4].add(i.astype(jnp.uint32)
                                + (carry * 1e-30).astype(jnp.uint32))
            out = call(s2, a, d=d_pad, m=m_pad, gaussian=True,
                       alpha=1.0, ti=ti_v, tk=tk_v, tn=tn_v,
                       ctr_stride=(d + (-d) % 4) // 4, **opts)
            return jnp.sum(out.astype(jnp.float32)) * jnp.float32(1e-20)

        try:
            t = time_loop(body, sw, a_op, iters_small=20, iters_large=220,
                          repeats=3)
            g = flops / t / 1e9
            print(f"{label:28s}: {g:9.1f} GFLOP/s  vs_roof={g/roof:.4f}",
                  flush=True)
        except Exception as e:
            print(f"{label:28s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # staged comparison: fill + GEMM each call
    dist = S.dist

    def body_staged(i, carry, a):
        st = rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))
        s_mat = rb.fill_dense_submat(dist, st, d, m)
        out = jnp.matmul(s_mat, a, preferred_element_type=jnp.float32)
        return jnp.sum(out) * jnp.float32(1e-20)

    t_staged = time_loop(body_staged, A, iters_small=10, iters_large=60)
    print(f"staged fill+GEMM             : {flops/t_staged/1e9:9.1f} "
          f"GFLOP/s  vs_roof={t_roof/t_staged:.4f}", flush=True)


def time_fill():
    """Pallas fill kernel vs XLA fill, plus the staged sketch end-to-end
    with each, at the ColMajor lifting shape."""
    import jax
    import jax.numpy as jnp
    import randblas_tpu as rb
    from randblas_tpu import skge
    from randblas_tpu.bench_util import time_loop
    from randblas_tpu.ops import fused_sketch as fs

    d, m, n = 4096, 1024, 4096
    flops = 2.0 * d * m * n
    S = rb.DenseSkOp(rb.DenseDist(d, m), rb.RNGState.from_key(0))
    dist = S.dist
    A = jnp.asarray(
        np.random.default_rng(0).normal(size=(m, n)).astype(np.float32))
    Smat = S.materialize()

    def body_gemm(i, carry, s, a):
        x = s.at[0, 0].add(carry)
        out = jnp.matmul(x, a, preferred_element_type=jnp.float32)
        return jnp.sum(out) * jnp.float32(1e-20)

    t_roof = time_loop(body_gemm, Smat, A, iters_small=20,
                       iters_large=220, repeats=3)
    print(f"roofline GEMM: {flops/t_roof/1e9:.1f} GFLOP/s", flush=True)

    # fill-only comparison (generate the d x m block each iteration)
    def body_fill_xla(i, carry, _a):
        st = rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))
        blk = rb.fill_dense_submat(dist, st, d, m)
        return jnp.sum(blk) * jnp.float32(1e-20)

    t = time_loop(body_fill_xla, A, iters_small=20, iters_large=220,
                  repeats=3)
    print(f"fill XLA   : {t*1e6:8.1f} us", flush=True)

    def body_fill_pallas(i, carry, _a):
        st = rb.RNGState.from_arrays(
            jnp.zeros(4, jnp.uint32).at[0].set(
                (carry * 1e-30).astype(jnp.uint32) + i.astype(jnp.uint32)),
            jnp.zeros(2, jnp.uint32))
        S2 = rb.DenseSkOp(dist, st)
        blk = fs.pallas_fill_block(S2, d, m)
        return jnp.sum(blk) * jnp.float32(1e-20)

    t = time_loop(body_fill_pallas, A, iters_small=20, iters_large=220,
                  repeats=3)
    print(f"fill Pallas: {t*1e6:8.1f} us", flush=True)

    # staged sketch end-to-end with each fill
    for label, flag in [("staged+XLA fill", False),
                        ("staged+Pallas fill", "auto")]:
        skge.use_pallas_fill = flag

        def body(i, carry, a):
            st = rb.RNGState.from_arrays(
                jnp.zeros(4, jnp.uint32).at[0].set(
                    (carry * 1e-30).astype(jnp.uint32)
                    + i.astype(jnp.uint32)),
                jnp.zeros(2, jnp.uint32))
            S2 = rb.DenseSkOp(dist, st)
            out = rb.sketch_general(S2, a)
            return jnp.sum(out) * jnp.float32(1e-20)

        t = time_loop(body, A, iters_small=20, iters_large=220, repeats=3)
        g = flops / t / 1e9
        print(f"{label:20s}: {g:9.1f} GFLOP/s  vs_roof={t_roof/t:.4f}",
              flush=True)
    skge.use_pallas_fill = "auto"

    # RowMajor staged short-m gate shape (m=1024): does pallas fill move
    # the staged path the auto gate prefers there?
    d2, m2, n2 = 1024, 1024, 4096
    dist2 = rb.DenseDist(d2, m2)
    A2 = jnp.asarray(
        np.random.default_rng(1).normal(size=(m2, n2)).astype(np.float32))
    flops2 = 2.0 * d2 * m2 * n2
    for label, flag in [("rm short-m staged+XLA", False),
                        ("rm short-m staged+Pallas", "auto")]:
        skge.use_pallas_fill = flag

        def body(i, carry, a):
            st = rb.RNGState.from_arrays(
                jnp.zeros(4, jnp.uint32).at[0].set(
                    (carry * 1e-30).astype(jnp.uint32)
                    + i.astype(jnp.uint32)),
                jnp.zeros(2, jnp.uint32))
            S2 = rb.DenseSkOp(dist2, st)
            out = rb.sketch_general(S2, a)
            return jnp.sum(out) * jnp.float32(1e-20)

        t = time_loop(body, A2, iters_small=20, iters_large=220,
                      repeats=3)
        print(f"{label:24s}: {flops2/t/1e9:9.1f} GFLOP/s", flush=True)
    skge.use_pallas_fill = "auto"


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check()
    elif mode == "colmajor":
        time_colmajor()
    elif mode == "fill":
        time_fill()
    else:
        time_sweep()
