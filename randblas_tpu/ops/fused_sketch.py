"""Fused RNG-in-GEMM sketch: the flagship Pallas TPU kernel.

Computes B = alpha * S @ A where S is an *implicit* d x m Gaussian/uniform
operator: S tiles are generated from Philox counters directly in VMEM and
fed to the MXU — the operator never exists in HBM (the TPU-native answer
to the reference's lazy lskge3 path, skge.hh:174-215 + dense_skops.hh fill;
see SURVEY.md §3.1 "fold HOT LOOP #1 into HOT LOOP #2").

Kernel structure (grid = (n_k, n_j), k OUTER):
  - at j == 0, generate the k-th operator panel S[:, k*TK:(k+1)*TK] into a
    VMEM scratch — each operator element is generated exactly once per
    sketch, regardless of n;
  - every (k, j) step runs one MXU contraction S_panel @ A_blk and
    accumulates into the (d, TN) output block in place (initialized at
    k == 0).

Constraints for this kernel (the wrapper falls back to the staged XLA path
otherwise): natural-RowMajor operator (wide + Long or tall + Short),
whole-operator sketch starting at counter 0 of the seed (ro_s == co_s == 0),
m % TK == 0, n % TN == 0, TK % counter-width == 0.

Stream identity: values match fill_dense_submat bit-for-bit at the uint32
level; float values go through the same formulas evaluated by the Mosaic
compiler (see rng/transforms.py for the cross-compiler tolerance note).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rng.bits import mul32_wide
from ..rng.philox import philox4x32_words
from ..rng.transforms import boxmul_pair_i32, uneg11_i32

_SQRT3 = math.sqrt(3.0)


def _gen_panel_words(seed_ref, d: int, tk: int, ctr_stride: int,
                     k_blocks, gaussian: bool, row_off=0,
                     fast_cos: bool = False, rng: str = "philox4x32",
                     stride_axis: int = 0):
    """Generate the (d, tk) operator panel whose first column lives at
    counter offset ``k_blocks`` blocks from the seed, starting at operator
    row ``row_off``.

    Counter mapping (fill_geometry with ptr = 0, aligned columns):
      element (i, c) of the panel -> counter = seed + (row_off + i) *
      ctr_stride + k_blocks + c // 4, lane c % 4.
    All math on separate u32 word arrays of shape (d, tk // 4).

    stride_axis selects which ARRAY axis walks the counter stride — the
    iotas are free-form, so the same formula yields either orientation:
    - 0 (RowMajor kernel): axis 0 strides, axis 1 counts blocks; output
      word l of element (i, b) is operator element (row_off+i, 4b+l).
    - 1 (ColMajor kernel): axis 1 strides, axis 0 counts blocks; output
      word l of element (b, c) is operator element (4(k_blocks+b)+l,
      row_off+c) — i.e. the four outputs are LANE SLABS of the operator
      itself, ready for standard (M,K)x(K,N) MXU dots.
    """
    nb = tk // 4 if stride_axis == 0 else tk
    shape = (d, nb)
    i_ids = jax.lax.broadcasted_iota(jnp.uint32, shape, stride_axis)
    i_ids = i_ids + jnp.asarray(row_off, dtype=jnp.uint32)
    b_ids = jax.lax.broadcasted_iota(jnp.uint32, shape, 1 - stride_axis)

    stride_lo = jnp.uint32(ctr_stride & 0xFFFFFFFF)
    off_hi, off_lo = mul32_wide(i_ids, stride_lo)
    stride_hi = (ctr_stride >> 32) & 0xFFFFFFFF
    if stride_hi:
        off_hi = off_hi + i_ids * jnp.uint32(stride_hi)
    # + k_blocks (traced scalar) + b
    kb = jnp.asarray(k_blocks, dtype=jnp.uint32)
    t = off_lo + kb
    off_hi = off_hi + (t < kb).astype(jnp.uint32)
    off_lo = t + b_ids
    off_hi = off_hi + (off_lo < b_ids).astype(jnp.uint32)

    s0 = seed_ref[0, 0]
    s1 = seed_ref[0, 1]
    s2 = seed_ref[0, 2]
    s3 = seed_ref[0, 3]

    c0 = s0 + off_lo
    carry = (c0 < off_lo).astype(jnp.uint32)
    t1 = s1 + off_hi
    ca = (t1 < off_hi).astype(jnp.uint32)
    c1 = t1 + carry
    cb = (c1 < carry).astype(jnp.uint32)
    carry1 = ca | cb
    c2 = s2 + carry1
    carry2 = (c2 < carry1).astype(jnp.uint32)
    c3 = s3 + carry2

    if rng == "philox4x32":
        r0, r1, r2, r3 = philox4x32_words(c0, c1, c2, c3,
                                          seed_ref[0, 4], seed_ref[0, 5],
                                          10)
    elif rng == "threefry4x32":
        from ..rng.threefry import threefry4x32_words
        r0, r1, r2, r3 = threefry4x32_words(
            c0, c1, c2, c3, seed_ref[0, 4], seed_ref[0, 5],
            seed_ref[0, 6], seed_ref[0, 7], 20)
    else:
        raise NotImplementedError(f"fused kernel: unsupported rng {rng}")
    s0 = pltpu.bitcast(r0, jnp.int32)
    s1 = pltpu.bitcast(r1, jnp.int32)
    s2 = pltpu.bitcast(r2, jnp.int32)
    s3 = pltpu.bitcast(r3, jnp.int32)
    if gaussian:
        v0, v1 = boxmul_pair_i32(s0, s1, fast_cos=fast_cos)
        v2, v3 = boxmul_pair_i32(s2, s3, fast_cos=fast_cos)
    else:
        sqrt3 = jnp.float32(_SQRT3)
        v0 = uneg11_i32(s0) * sqrt3
        v1 = uneg11_i32(s1) * sqrt3
        v2 = uneg11_i32(s2) * sqrt3
        v3 = uneg11_i32(s3) * sqrt3
    return v0, v1, v2, v3


def _kernel(seed_ref, a0, a1, a2, a3, *refs, ti, tk,
            ctr_stride, gaussian, alpha, row_chunks=1,
            nogen=False, alias_acc=False, fast_cos=False,
            rng="philox4x32", where_acc=False):
    """Grid (n_i, n_j, n_k), k INNERMOST. The (ti, tn) output block's index
    (i, j) is constant across the k sweep, so it stays VMEM-resident and is
    written back to HBM exactly once per (i, j) — zero accumulator traffic.
    Each step generates its (ti, tk) operator panel inline from counters
    (row offset i*ti folds into the counter math) and contracts it with
    the matching data rows.

    Lane structure: CBRNG lane l of counter block b is operator column
    4b + l; the matching data rows arrive pre-split as a0..a3 (lane slabs
    of A viewed as (m//4, 4n)), avoiding any in-kernel minor-dim
    interleave — the contraction is four MXU dots, one per lane.

    bf16 casts happen at dot time (the effective precision XLA picks for
    f32 GEMMs under --xla_allow_excess_precision — the roofline GEMM);
    casting A outside the kernel would cost a full extra HBM pass, except
    for bf16 data, which streams through uncast.

    Production schedule (exec_opts; measured on v5e — see ROADMAP.md for
    the sweep history and dead ends): alias_acc=True removes ALL control
    flow from the body (the accumulator arrives zero-initialized through
    input aliasing), and the panel is generated in ~32-row chunks with
    chunk r+1's generation issued between chunk r's dots and accumulate.
    VPU and MXU costs are strictly additive on this chip (matmul
    streaming occupies the issue pipeline), so the wins come from the
    straight-line schedule and cheaper generation math (fast_cos), not
    from overlap.

    refs is (out_ref,) normally, (zeros_in_ref, out_ref) under
    alias_acc (the input ref aliases the same buffer, never read).
    nogen/"rawbits" are timing diagnostics (dots-only / Philox-only)."""
    out_ref = refs[-1]
    i = pl.program_id(0)
    k = pl.program_id(2)
    nb = tk // 4

    k_blocks = k.astype(jnp.uint32) * jnp.uint32(nb)
    base_row = i.astype(jnp.uint32) * jnp.uint32(ti)
    chunk = ti // row_chunks
    assert chunk * row_chunks == ti

    a0b = a0[:].astype(jnp.bfloat16)
    a1b = a1[:].astype(jnp.bfloat16)
    a2b = a2[:].astype(jnp.bfloat16)
    a3b = a3[:].astype(jnp.bfloat16)

    def gen(r):
        if nogen == "rawbits":
            # diagnostic: Philox only, no float transform — bitcast the
            # raw words (garbage values, valid timing)
            row_off = base_row + jnp.uint32(r * chunk)
            k_blocks2 = k_blocks
            nb = tk // 4
            i_ids = jax.lax.broadcasted_iota(jnp.uint32, (chunk, nb), 0)
            i_ids = i_ids + row_off
            b_ids = jax.lax.broadcasted_iota(jnp.uint32, (chunk, nb), 1)
            off_hi, off_lo = mul32_wide(i_ids,
                                        jnp.uint32(ctr_stride & 0xFFFFFFFF))
            c0 = seed_ref[0, 0] + off_lo + k_blocks2 + b_ids
            c1 = seed_ref[0, 1] + off_hi
            r0, r1, r2, r3 = philox4x32_words(
                c0, c1, seed_ref[0, 2], seed_ref[0, 3],
                seed_ref[0, 4], seed_ref[0, 5], 10)
            scale = jnp.float32(2.0 ** -32)
            return tuple(pltpu.bitcast(x, jnp.int32).astype(jnp.float32)
                         * scale for x in (r0, r1, r2, r3))
        if nogen:  # diagnostic: dots-only upper bound of this schedule.
            # must depend on the seed ref or XLA hoists the whole call
            # out of timing loops as loop-invariant (measured: "2.6x
            # roofline", i.e. eliminated). uint32->f32 casts are
            # unsupported in Mosaic; go through a signed view.
            s2d = jnp.full((chunk, tk // 4), seed_ref[0, 4] & jnp.uint32(1),
                           jnp.uint32)
            s = pltpu.bitcast(s2d, jnp.int32).astype(jnp.float32)
            z = jnp.float32(0.5) + s
            return z, z + 1.0, z + 2.0, z + 3.0
        row_off = base_row + jnp.uint32(r * chunk)
        return _gen_panel_words(seed_ref, chunk, tk, ctr_stride,
                                k_blocks, gaussian, row_off,
                                fast_cos=fast_cos, rng=rng)

    def dots(v):
        v0, v1, v2, v3 = v
        acc = jnp.dot(v0.astype(jnp.bfloat16), a0b,
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(v1.astype(jnp.bfloat16), a1b,
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(v2.astype(jnp.bfloat16), a2b,
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(v3.astype(jnp.bfloat16), a3b,
                       preferred_element_type=jnp.float32)
        if alpha != 1.0:
            acc = jnp.float32(alpha) * acc
        return acc

    # explicit gen/dot interleave: issue chunk r+1's generation before
    # consuming chunk r's dots so the units overlap under in-order issue
    v = gen(0)
    for r in range(row_chunks):
        contrib = dots(v)
        if r + 1 < row_chunks:
            v = gen(r + 1)
        sl = pl.ds(r * chunk, chunk)

        if where_acc:
            # straight-line accumulate WITHOUT aliasing: at k == 0 the
            # out block's VMEM holds garbage, which the elementwise
            # select discards (select does not propagate NaN/Inf from
            # the unselected branch) — one unconditional store per
            # chunk, same schedulability as the old aliased form but
            # with no zero-initialized input to rely on.
            prev = jnp.where(k == 0, jnp.float32(0.0), out_ref[sl, :])
            out_ref[sl, :] = prev + contrib
            continue

        if alias_acc:
            # out_ref arrives zero-initialized through input aliasing:
            # the accumulate is unconditional, leaving the whole step one
            # straight-line block the scheduler can interleave freely.
            # WARNING: measured WRONG on hardware at some shapes (the
            # aliased zeros' initialization can be elided — see
            # ROADMAP.md round 3); kept only as a timing diagnostic,
            # never dispatched.
            out_ref[sl, :] = out_ref[sl, :] + contrib
            continue

        @pl.when(k == 0)
        def _(sl=sl, contrib=contrib):
            out_ref[sl, :] = contrib

        @pl.when(k != 0)
        def _(sl=sl, contrib=contrib):
            out_ref[sl, :] = out_ref[sl, :] + contrib


def _largest_divisor_leq(x, start, mult):
    t = min(start, x)
    t -= t % mult
    while t > mult and (x % t or t % mult):
        t -= mult
    return max(t, mult)


def _plan(d: int, m: int, n: int):
    """Kernel plan: (d_pad, m_pad, n_pad, ti, tk, tn).

    Every dimension is padded so tiles stay MXU/lane-friendly for ANY
    input shape:
    - n pads to a multiple of 128 (zero data columns, sliced off); TN
      covers all of n whenever the shape allows (n_j == 1 means operator
      elements are generated exactly once).
    - m pads to a multiple of TK=512 with ZERO data rows: phantom operator
      columns multiply zeros and contribute nothing, while real columns
      keep the true parent counter mapping (ctr_stride is computed from
      the parent, never from m_pad).
    - TI sized so the resident out tile ti*TN*4 stays ~<=16MB; d pads to
      a multiple of TI (phantom operator rows, sliced off).
    Measured on v5e at (d=1024, m=65536, n=4096): TI=1024/TK=512/TN=4096
    reaches 0.86-0.95 of the materialized-GEMM roofline.
    """
    n_pad = -(-n // 128) * 128
    tn = _largest_divisor_leq(n_pad, 8192, 128)
    ti_budget = max(8, ((16 * 1024 * 1024) // (4 * tn)) // 8 * 8)
    ti = min(ti_budget, -(-d // 8) * 8)
    d_pad = -(-d // ti) * ti
    tk = min(512, -(-m // 32) * 32)
    m_pad = -(-m // tk) * tk
    return d_pad, m_pad, n_pad, ti, tk, tn


@functools.partial(jax.jit, static_argnames=(
    "d", "m", "gaussian", "alpha", "ti", "tk", "tn", "ctr_stride",
    "interpret", "row_chunks", "nogen", "alias_acc", "fast_cos", "rng",
    "where_acc"))
def _fused_call(seed_words, A, *, d, m, gaussian, alpha, ti, tk, tn,
                ctr_stride, interpret=False, row_chunks=1, nogen=False,
                alias_acc=False, fast_cos=False, rng="philox4x32",
                where_acc=False):
    n = A.shape[1]
    n_i = d // ti
    n_k = m // tk
    n_j = n // tn
    nb = tk // 4
    # free row-major view: a4[b, l*n + c] == A[4b + l, c]; lane l's
    # (nb, tn) block is a 2-D aligned slab. No dtype cast here — that
    # would add a full HBM pass over A.
    a4 = A.reshape(m // 4, 4 * n)
    flops = 2 * d * m * n

    kernel = functools.partial(_kernel, ti=ti, tk=tk,
                               ctr_stride=ctr_stride,
                               gaussian=gaussian, alpha=alpha,
                               row_chunks=row_chunks,
                               nogen=nogen, alias_acc=alias_acc,
                               fast_cos=fast_cos, rng=rng,
                               where_acc=where_acc)

    def lane_spec(lane):
        col_blocks = n // tn
        return pl.BlockSpec(
            (nb, tn),
            lambda i, j, k, _l=lane, _cb=col_blocks: (k, _l * _cb + j),
            memory_space=pltpu.VMEM)

    cp_kw = dict(vmem_limit_bytes=100 * 1024 * 1024)
    in_specs = [
        pl.BlockSpec((1, 8), lambda i, j, k: (i - i, i - i),
                     memory_space=pltpu.SMEM),
        lane_spec(0), lane_spec(1), lane_spec(2), lane_spec(3),
    ]
    operands = [seed_words, a4, a4, a4, a4]
    alias = {}
    if alias_acc:
        in_specs.append(pl.BlockSpec((ti, tn), lambda i, j, k: (i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(jnp.zeros((d, n), jnp.float32))
        alias = {5: 0}
    out = pl.pallas_call(
        kernel,
        grid=(n_i, n_j, n_k),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ti, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, n), jnp.float32),
        input_output_aliases=alias,
        compiler_params=pltpu.CompilerParams(**cp_kw),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=m * n * 4 + d * n * 4,
            transcendentals=d * m if gaussian else 0,
        ),
    )(*operands)
    return out


def _kernel_T(seed_ref, a_ref, *refs, ti, tk, ctr_stride,
              gaussian, alpha, rng="philox4x32", row_chunks=1,
              alias_acc=False, fast_cos=False, nogen=False):
    """ColMajor-natural variant: grid (n_i, n_j, n_k), k innermost.

    A ColMajor-natural operator's counters walk DOWN columns (element
    (i, c) -> counter c*stride + i//4, lane i%4). The counter iotas are
    free-form, so generation produces the operator's four LANE SLABS
    directly — v_l (ti/4, tk) with v_l[b, c] = S[4b + l, c] — by
    striding along the ARRAY COLUMNS (stride_axis=1 in
    _gen_panel_words). The contraction B = S @ A is then four STANDARD
    (M,K)x(K,N) MXU dots (an earlier revision generated S^T tiles and
    contracted in the ((0,),(0,)) form, which measured ~2x slower), and
    lane l's result lands in output slab l (rows 4b + l of B),
    interleaved outside the kernel by a free reshape.

    A arrives as plain (tk, tn) tiles (no lane pre-split: the
    contraction index is the m axis, shared by all lanes)."""
    i = pl.program_id(0)
    k = pl.program_id(2)
    outs = refs[-4:]
    ci = ti // row_chunks
    assert ci * row_chunks == ti and ci % 4 == 0

    # operator columns walked by this step: row_off (G rows) = k*tk along
    # the m axis; lanes/counter blocks along d: k_blocks = i*ti/4 (+
    # chunk offset c*ci/4 when chunking the d axis)
    base_blocks = i.astype(jnp.uint32) * jnp.uint32(ti // 4)
    row_off = k.astype(jnp.uint32) * jnp.uint32(tk)

    def gen(c):
        if nogen:  # timing diagnostic: dots-only bound (see _kernel)
            s2d = jnp.full((ci // 4, tk),
                           seed_ref[0, 4] & jnp.uint32(1), jnp.uint32)
            s = pltpu.bitcast(s2d, jnp.int32).astype(jnp.float32)
            z = jnp.float32(0.5) + s + jnp.float32(c)
            return z, z + 1.0, z + 2.0, z + 3.0
        # lane-slab orientation (stride_axis=1): one call yields the
        # four (ci/4, tk) slabs v_l with v_l[b, col] = S[4b + l + chunk
        # row offset, k*tk + col] — the counter stride walks the ARRAY
        # COLUMNS, so the dots below run in the standard (M,K)x(K,N)
        # MXU form with no transposed operand anywhere
        k_blocks = base_blocks + jnp.uint32(c * (ci // 4))
        return _gen_panel_words(seed_ref, ci // 4, tk, ctr_stride,
                                k_blocks, gaussian, row_off,
                                rng=rng, fast_cos=fast_cos,
                                stride_axis=1)

    a_bf = a_ref[:].astype(jnp.bfloat16)

    # chunk the d axis: each chunk owns disjoint slab rows, and chunk
    # c+1's generation is issued before chunk c's dots are consumed
    v = gen(0)
    for c in range(row_chunks):
        contribs = []
        for l in range(4):
            contrib = jnp.dot(
                v[l].astype(jnp.bfloat16), a_bf,
                preferred_element_type=jnp.float32)
            if alpha != 1.0:
                contrib = jnp.float32(alpha) * contrib
            contribs.append(contrib)
        if c + 1 < row_chunks:
            v = gen(c + 1)
        sl = pl.ds(c * (ci // 4), ci // 4)
        for l in range(4):
            o_ref, contrib = outs[l], contribs[l]
            if alias_acc:
                o_ref[sl, :] = o_ref[sl, :] + contrib
                continue

            @pl.when(k == 0)
            def _(o_ref=o_ref, contrib=contrib, sl=sl):
                o_ref[sl, :] = contrib

            @pl.when(k != 0)
            def _(o_ref=o_ref, contrib=contrib, sl=sl):
                o_ref[sl, :] = o_ref[sl, :] + contrib


def _kernel_fill(seed_ref, o0, o1, o2, o3, *, ti, tk, ctr_stride,
                 gaussian, rng, fast_cos):
    """Pure generation kernel: writes the (ti, tk) tile of the
    natural-orientation parent at grid position (i, k) as four lane
    slabs o_l (ti, tk/4), o_l[r, b] = M[i*ti + r, 4*(k*tk/4 + b) + l].

    This is the fused kernel's generator with the MXU removed: the fill
    itself runs at in-register generation speed and the caller
    interleaves the slabs with one fused XLA pass. On v5e this beats the
    XLA fill (vectorized gather-free as it already is) because the
    counter math, Philox rounds and Box-Muller all stay in registers
    with zero intermediate HBM traffic."""
    i = pl.program_id(0)
    k = pl.program_id(1)
    row_off = i.astype(jnp.uint32) * jnp.uint32(ti)
    k_blocks = k.astype(jnp.uint32) * jnp.uint32(tk // 4)
    v0, v1, v2, v3 = _gen_panel_words(seed_ref, ti, tk, ctr_stride,
                                      k_blocks, gaussian, row_off,
                                      fast_cos=fast_cos, rng=rng,
                                      stride_axis=0)
    o0[:] = v0
    o1[:] = v1
    o2[:] = v2
    o3[:] = v3


@functools.partial(jax.jit, static_argnames=(
    "rows", "cols", "gaussian", "ti", "tk", "ctr_stride", "interpret",
    "rng", "fast_cos"))
def _fill_call(seed_words, *, rows, cols, gaussian, ti, tk, ctr_stride,
               interpret=False, rng="philox4x32", fast_cos=True):
    """(rows, cols) natural-orientation fill from the seed (rows/cols
    pre-padded to ti/tk multiples). Returns the interleaved array."""
    n_i, n_k = rows // ti, cols // tk
    kernel = functools.partial(_kernel_fill, ti=ti, tk=tk,
                               ctr_stride=ctr_stride, gaussian=gaussian,
                               rng=rng, fast_cos=fast_cos)
    slab = jax.ShapeDtypeStruct((rows, cols // 4), jnp.float32)
    spec = pl.BlockSpec((ti, tk // 4), lambda i, k: (i, k),
                        memory_space=pltpu.VMEM)
    o0, o1, o2, o3 = pl.pallas_call(
        kernel,
        grid=(n_i, n_k),
        interpret=interpret,
        in_specs=[pl.BlockSpec((1, 8), lambda i, k: (i - i, i - i),
                               memory_space=pltpu.SMEM)],
        out_specs=[spec] * 4,
        out_shape=[slab] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=rows * cols * 4,
            transcendentals=rows * cols if gaussian else 0),
    )(seed_words)
    # one fused interleave pass: M[r, 4b + l] = o_l[r, b]
    return jnp.stack([o0, o1, o2, o3], axis=-1).reshape(rows, cols)


def _plan_fill(rows: int, cols: int):
    tk = min(512, -(-cols // 4) * 4)
    cols_pad = -(-cols // tk) * tk
    ti = min(512, -(-rows // 8) * 8)
    rows_pad = -(-rows // ti) * ti
    return rows_pad, cols_pad, ti, tk


def pallas_fill_supported(dist, dtype, rng: str) -> bool:
    from ..dense import DenseDistName
    return (jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and dist.family in (DenseDistName.Gaussian,
                                DenseDistName.Uniform)
            and rng in _SUPPORTED_RNGS)


def pallas_fill_block(S, rows_s: int, cols_s: int, ro_s: int = 0,
                      co_s: int = 0, interpret: bool = False):
    """Counter-addressed (rows_s, cols_s) block of S at (ro_s, co_s) in
    MATH orientation, generated by the Pallas fill kernel.

    Same counter addressing as fill_dense_submat (dense_skops.hh:487-532
    semantics): the natural-orientation parent walks its minor axis in
    counter lanes, unaligned minor offsets reduce to the previous lane
    boundary + slice, and the counter stride always comes from the TRUE
    parent minor extent. uint32 streams are bit-identical to the XLA
    fill; Gaussian float values agree within the documented
    cross-compiler transcendental tolerance (rng/transforms.py).
    """
    from ..base import Layout
    from ..dense import DenseDistName, dist_to_layout, major_axis_length

    dist = S.dist
    natural = dist_to_layout(dist)
    if natural == Layout.ColMajor:
        # natural matrix is the transposed parent: swap roles
        g_rows, g_cols = cols_s, rows_s
        g_ro, g_co = co_s, ro_s
        parent_minor = dist.n_rows
    else:
        g_rows, g_cols = rows_s, cols_s
        g_ro, g_co = ro_s, co_s
        parent_minor = dist.n_cols
    ctr_size = 4
    ctr_stride = (parent_minor + ((-parent_minor) % ctr_size)) // ctr_size
    fbs = g_co % ctr_size
    co_al = g_co - fbs
    cols_gen = g_cols + fbs
    rows_pad, cols_pad, ti, tk = _plan_fill(g_rows, cols_gen)
    base = S.seed_state.incr(g_ro * ctr_stride + co_al // ctr_size)
    out = _fill_call(
        _seed_words(base), rows=rows_pad, cols=cols_pad,
        gaussian=dist.family == DenseDistName.Gaussian, ti=ti, tk=tk,
        ctr_stride=ctr_stride, interpret=interpret, rng=S.seed_state.rng,
        fast_cos=False)
    out = out[:g_rows, fbs:fbs + g_cols]
    return out.T if natural == Layout.ColMajor else out


def _plan_T(d: int, m: int, n: int):
    """Plan for the ColMajor kernel: (d_pad, m_pad, n_pad, ti, tk, tn).

    ti is the d-axis tile (lane axis: ti/4 is the generated minor dim —
    keep it a multiple of 128 when d allows); tk is the m-axis tile (G
    rows / contraction). Measured on v5e at the 4096x1024 @ 4096 lifting
    shape (benchmarks/fused_tune.py colmajor): tk covering the whole
    contraction (1024 > 512: 0.50 -> 0.52 of the roofline) and ti = 512
    with two row chunks beat every larger-tile config — big VMEM out
    tiles measurably hurt (ti=1024: 0.44)."""
    n_pad = -(-n // 128) * 128
    tn = _largest_divisor_leq(n_pad, 4096, 128)
    ti = min(512, -(-d // 32) * 32)
    d_pad = -(-d // ti) * ti
    tk = min(1024, -(-m // 32) * 32)
    m_pad = -(-m // tk) * tk
    return d_pad, m_pad, n_pad, ti, tk, tn


_SUPPORTED_RNGS = ("philox4x32", "threefry4x32")


def exec_opts_T(ti: int) -> dict:
    """Execution options for the ColMajor (lane-slab generation) kernel.

    Measured on v5e at the lifting shape 4096x1024 @ 4096 with
    220-iteration loops (shorter loops sit under the tunnel's noise
    floor and mislead). Round-3 production config: polynomial Box-Muller
    + TWO row chunks (gen/dot interleave) + the caller PRE-CASTING A to
    bf16 (fused_sketch_colmajor does this): each A tile is revisited
    n_i times by the ColMajor grid, so the one-time cast pass replaces
    n_i in-kernel cast passes AND halves the re-DMA — worth ~0.05 of
    the roofline. Same-run comparison: 0.516 vs 0.474 staged fill+GEMM
    (the round-2 config measured 0.45 vs 0.58 — the full history and
    the stacked-kernel/pallas-fill dead ends are in ROADMAP.md).
    alias_acc measured WORSE for this kernel (0.35) — keep pl.when."""
    rc = 2 if ti % 8 == 0 else 1
    return dict(fast_cos=True, row_chunks=rc)


def exec_opts(ti: int) -> dict:
    """Production execution options for the RowMajor kernel, from the
    v5e tuning sweeps (benchmarks/fused_tune.py; full history in
    ROADMAP.md): a pl.when-free straight-line body, ~32-row generation
    chunks interleaved with the dots, and the polynomial Box-Muller.

    Round-3 CORRECTNESS FIX: the straight-line body now uses where_acc
    (k==0 read discarded by an elementwise select) instead of the
    round-2 aliased zero-initialized accumulator — alias_acc measured
    WRONG on hardware at some shapes (e.g. d=256, n=1024: the aliased
    zeros' initialization is elided and the kernel accumulates onto
    garbage; caught by tests/test_tpu_hardware.py). where_acc keeps the
    branch-free schedule at ~equal speed.
    """
    target = max(1, ti // 32)
    rc = next((r for r in range(target, 0, -1) if ti % r == 0), 1)
    return dict(where_acc=True, row_chunks=rc, fast_cos=True)


def _seed_words(state) -> jax.Array:
    """(1, 8) SMEM operand: 4 counter words, then key words, zero-padded.
    Covers Philox4x32 (2-word key) and Threefry4x32 (4-word key)."""
    pad = 8 - state.counter.shape[0] - state.key.shape[0]
    parts = [state.counter, state.key]
    if pad:
        parts.append(jnp.zeros((pad,), jnp.uint32))
    return jnp.concatenate(parts).reshape(1, 8)


@functools.partial(jax.jit, static_argnames=(
    "d", "m", "gaussian", "alpha", "ti", "tk", "tn", "ctr_stride",
    "interpret", "rng", "row_chunks", "alias_acc", "fast_cos", "nogen"))
def _fused_call_T(seed_words, A, *, d, m, gaussian, alpha, ti, tk, tn,
                  ctr_stride, interpret=False, rng="philox4x32",
                  row_chunks=1, alias_acc=False, fast_cos=False,
                  nogen=False):
    n = A.shape[1]
    n_i = d // ti
    n_j = n // tn
    n_k = m // tk

    kernel = functools.partial(_kernel_T, ti=ti, tk=tk,
                               ctr_stride=ctr_stride, gaussian=gaussian,
                               alpha=alpha, rng=rng,
                               row_chunks=row_chunks, alias_acc=alias_acc,
                               fast_cos=fast_cos, nogen=nogen)
    slab = jax.ShapeDtypeStruct((d // 4, n), jnp.float32)
    out_spec = pl.BlockSpec((ti // 4, tn), lambda i, j, k: (i, j),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8), lambda i, j, k: (i - i, i - i),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [seed_words, A]
    alias = {}
    if alias_acc:
        for l in range(4):
            in_specs.append(pl.BlockSpec((ti // 4, tn),
                                         lambda i, j, k: (i, j),
                                         memory_space=pltpu.VMEM))
            operands.append(jnp.zeros((d // 4, n), jnp.float32))
            alias[2 + l] = l
    o0, o1, o2, o3 = pl.pallas_call(
        kernel,
        grid=(n_i, n_j, n_k),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        out_shape=[slab] * 4,
        input_output_aliases=alias,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * d * m * n,
            bytes_accessed=m * n * 4 + d * n * 4,
            transcendentals=d * m if gaussian else 0,
        ),
    )(*operands)
    # free interleave: B[4b + l] = o_l[b]
    return jnp.stack([o0, o1, o2, o3], axis=1).reshape(d, n)


def _fused_colmajor_primal(dist, state, A, alpha, interpret, rows_s,
                           cols_s, ro_s, co_s):
    """Primal body of fused_sketch_colmajor (dist/state split out so the
    custom-VJP wrapper can rebuild the call from residual arrays)."""
    from ..base import Layout
    from ..dense import DenseDistName, dist_to_layout, major_axis_length

    assert dist_to_layout(dist) == Layout.ColMajor
    assert major_axis_length(dist) == dist.n_rows
    in_bf16 = A.dtype == jnp.bfloat16
    # pre-cast A to bf16: the ColMajor grid revisits each A tile n_i
    # times, so one cast pass replaces n_i in-kernel casts and halves
    # the tile re-DMA (numerically identical — the kernel's dots cast to
    # bf16 either way). The f32 path's output stays f32.
    if not in_bf16:
        A = A.astype(jnp.float32).astype(jnp.bfloat16)
    ctr_size = 4
    parent_d = dist.n_rows
    ctr_stride = (parent_d + ((-parent_d) % ctr_size)) // ctr_size
    fbs = ro_s % ctr_size
    ro_al = ro_s - fbs
    rows_gen = rows_s + fbs
    n = A.shape[1]
    d_pad, m_pad, n_pad, ti, tk, tn = _plan_T(rows_gen, cols_s, n)
    if n_pad != n or m_pad != cols_s:
        A = jnp.pad(A, ((0, m_pad - cols_s), (0, n_pad - n)))
    base = state.incr(co_s * ctr_stride + ro_al // ctr_size)
    gaussian = dist.family == DenseDistName.Gaussian
    out = _fused_call_T(_seed_words(base), A, d=d_pad, m=m_pad,
                        gaussian=gaussian, alpha=float(alpha), ti=ti,
                        tk=tk, tn=tn, ctr_stride=ctr_stride,
                        interpret=interpret, rng=state.rng,
                        **exec_opts_T(ti))
    out = out[fbs:fbs + rows_s, :n]
    return out.astype(jnp.bfloat16) if in_bf16 else out


def fused_sketch_colmajor(S, A, alpha=1.0, interpret=False, rows_s=None,
                          cols_s=None, ro_s=0, co_s=0):
    """B = alpha * submat(S) @ A for a ColMajor-natural operator
    (wide+Short or tall+Long), generated inside the kernel as S^T tiles.

    Counter mapping (fill_geometry, ColMajor): element (i, c) lives at
    counter c*ceil(D/4) + i//4, lane i%4, D = the TRUE parent height
    dist.n_rows. Column offsets co_s fold into the base counter; an
    unaligned ROW offset ro_s is reduced to the aligned case by
    generating from the previous lane boundary and slicing the extra
    output rows (pure compute padding — the counter stride still comes
    from the parent height, so values are bit-identical to slicing the
    full operator).

    Differentiable in A (jax.custom_vjp): the cotangent is the
    transposed sketch block^T @ g, itself computed by the RowMajor
    kernel on the transposed distribution — the operator is regenerated
    from counters, so the backward pass stores nothing but the seed.
    """
    rows_s = S.dist.n_rows if rows_s is None else rows_s
    cols_s = S.dist.n_cols if cols_s is None else cols_s
    A = jnp.asarray(A)
    if A.dtype != jnp.bfloat16:
        A = A.astype(jnp.float32)
    return _fused_colmajor_vjp(
        S.dist, S.seed_state.rng, float(alpha), bool(interpret),
        int(rows_s), int(cols_s), int(ro_s), int(co_s),
        S.seed_state.counter, S.seed_state.key, A)


def fused_sketch_colmajor_supported(dist, n_rows: int, n_cols: int,
                                    ro_s: int, co_s: int, op_s,
                                    dtype) -> bool:
    """Static eligibility for the ColMajor-natural fused kernel."""
    from ..base import Layout, Op
    from ..dense import DenseDistName, dist_to_layout
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                            jnp.dtype(jnp.bfloat16)):
        return False
    if dist.family not in (DenseDistName.Gaussian, DenseDistName.Uniform):
        return False
    if op_s != Op.NoTrans:
        return False
    if n_rows + ro_s > dist.n_rows or n_cols + co_s > dist.n_cols:
        return False
    if dist_to_layout(dist) != Layout.ColMajor:
        return False
    return True


def fused_sketch_supported(dist, n_rows: int, n_cols: int, ro_s: int,
                           co_s: int, op_s, dtype) -> bool:
    """Static eligibility check for the fused kernel path.

    Any submatrix is supported: an aligned column offset folds into the
    kernel's base counter directly; an UNALIGNED co_s is reduced to the
    aligned case by generating from the previous counter boundary and
    top-padding the data with co_s % 4 zero rows (the extra operator
    columns multiply zero data, so they vanish — and the counter stride
    still comes from the true parent width). Rows walk with the parent's
    counter stride, so ro_s is unconstrained.
    """
    from ..base import Layout, Op
    from ..dense import DenseDistName, dist_to_layout
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                            jnp.dtype(jnp.bfloat16)):
        return False
    if dist.family not in (DenseDistName.Gaussian, DenseDistName.Uniform):
        return False
    if op_s != Op.NoTrans:
        return False
    if n_rows + ro_s > dist.n_rows or n_cols + co_s > dist.n_cols:
        return False
    if dist_to_layout(dist) != Layout.RowMajor:
        return False
    return True


def _fused_rowmajor_primal(dist, state, A, alpha, interpret, rows_s,
                           cols_s, ro_s, co_s):
    """Primal body of fused_sketch (dist/state split out so the
    custom-VJP wrapper can rebuild the call from residual arrays)."""
    from ..base import Layout
    from ..dense import DenseDistName, dist_to_layout, major_axis_length

    ma_len = major_axis_length(dist)
    # NB: the ma_len check alone is trivially true for SQUARE dists,
    # whose Long major axis resolves to ColMajor-natural — check the
    # layout itself so a direct misuse fails loudly at trace time
    assert ma_len == dist.n_cols and \
        dist_to_layout(dist) == Layout.RowMajor, \
        "fused kernel requires natural-RowMajor operators"
    ctr_size = 4
    ctr_stride = (ma_len + ((-ma_len) % ctr_size)) // ctr_size
    fbs = co_s % ctr_size
    if fbs:
        # unaligned column offset: start at the previous counter boundary
        # and pad fbs zero rows on top of A — the fbs extra operator
        # columns multiply zero data and vanish.
        A = jnp.pad(A, ((fbs, 0), (0, 0)))
        co_s -= fbs
        cols_s += fbs
    n = A.shape[1]
    d_pad, m_pad, n_pad, ti, tk, tn = _plan(rows_s, cols_s, n)
    if n_pad != n or m_pad != cols_s:
        A = jnp.pad(A, ((0, m_pad - cols_s), (0, n_pad - n)))
    base = state.incr(ro_s * ctr_stride + co_s // ctr_size)
    gaussian = dist.family == DenseDistName.Gaussian
    out = _fused_call(_seed_words(base), A, d=d_pad, m=m_pad,
                      gaussian=gaussian,
                      alpha=float(alpha), ti=ti, tk=tk, tn=tn,
                      ctr_stride=ctr_stride, interpret=interpret,
                      rng=state.rng, **exec_opts(ti))
    if d_pad != rows_s or n_pad != n:
        out = out[:rows_s, :n]
    # accumulation is always f32 in-kernel; match the data dtype out
    return out.astype(A.dtype) if A.dtype == jnp.bfloat16 else out


def fused_sketch(S, A, alpha=1.0, interpret=False, rows_s=None,
                 cols_s=None, ro_s=0, co_s=0):
    """B = alpha * submat(S) @ A with the operator block generated inside
    the kernel.

    S: a lazy DenseSkOp satisfying fused_sketch_supported; A: (m, n) f32
    where m = cols_s (the block width). The submatrix base counter
    (ro_s * parent_stride + co_s / 4) folds into the kernel seed; rows
    walk with the parent's counter stride, so the block is bit-identical
    to slicing the full operator. interpret=True runs the Pallas
    interpreter (CPU CI coverage).

    Differentiable in A (jax.custom_vjp): the cotangent is the
    transposed sketch block^T @ g, itself computed by the ColMajor
    kernel on the transposed distribution — the operator is regenerated
    from counters, so the backward pass stores nothing but the seed.
    """
    rows_s = S.dist.n_rows if rows_s is None else rows_s
    cols_s = S.dist.n_cols if cols_s is None else cols_s
    A = jnp.asarray(A)
    if A.dtype != jnp.bfloat16:  # bf16 streams through uncast (half DMA)
        A = A.astype(jnp.float32)
    return _fused_rowmajor_vjp(
        S.dist, S.seed_state.rng, float(alpha), bool(interpret),
        int(rows_s), int(cols_s), int(ro_s), int(co_s),
        S.seed_state.counter, S.seed_state.key, A)


# ---------------------------------------------------------------------------
# Custom VJPs: the gradient of a sketch is a transposed sketch.
#
# B = alpha * block(S)[rows_s, cols_s; ro_s, co_s] @ A is linear in A, so
# dA = alpha * block^T @ g. By the fill-order autotranspose property
# (test_dense_fill.py; used the same way by skge._left_trans_fused_or_none),
# block(S, r, c, ro, co)^T == block(S_t, c, r, co, ro) for the transposed
# distribution with the same seed — and the transposed distribution has the
# OTHER natural layout, so each kernel's backward pass is the other kernel.
# Nothing is stored for the backward pass except the seed arrays: the
# operator block is regenerated from counters, exactly like the forward.
# (The reference has no autodiff; this is TPU-native surface, jax-only.)
# ---------------------------------------------------------------------------

def _transposed_cotangent(dist, rng, alpha, interpret, rows_s, cols_s,
                          ro_s, co_s, ctr, key, g):
    """dA = alpha * block(dist)^T @ g via the opposite fused kernel when
    supported, else the staged fill + GEMM (both regenerate from seed)."""
    from ..base import Layout, Op
    from ..dense import DenseDist, dist_to_layout
    from ..rng.state import RNGState

    dist_t = DenseDist(dist.n_cols, dist.n_rows, dist.family,
                       dist.major_axis)
    layout_t = dist_to_layout(dist_t)
    dt = g.dtype
    if dist.n_rows == dist.n_cols:
        # a SQUARE dist transposes to itself — the natural layout does
        # not flip, so the autotranspose identity block(S, ...)^T ==
        # block(S_t, ...) does NOT hold and the fused routes below would
        # compute block @ g instead of block^T @ g. Take the staged
        # fallback (materialize the block, transpose explicitly).
        layout_t = None
    if (layout_t == Layout.RowMajor
            and fused_sketch_supported(dist_t, cols_s, rows_s, co_s, ro_s,
                                       Op.NoTrans, dt)):
        return _fused_rowmajor_vjp(dist_t, rng, alpha, interpret,
                                   cols_s, rows_s, co_s, ro_s, ctr, key, g)
    if (layout_t == Layout.ColMajor
            and fused_sketch_colmajor_supported(dist_t, cols_s, rows_s,
                                                co_s, ro_s, Op.NoTrans,
                                                dt)):
        return _fused_colmajor_vjp(dist_t, rng, alpha, interpret,
                                   cols_s, rows_s, co_s, ro_s, ctr, key, g)
    # staged fallback: materialize the block (traced state is fine)
    from ..dense import fill_dense_submat
    state = RNGState(ctr, key, rng)
    blk = fill_dense_submat(dist, state, rows_s, cols_s, ro_s, co_s)
    g32 = g.astype(jnp.float32)
    out = jnp.asarray(alpha, jnp.float32) * jnp.matmul(
        blk.T, g32, preferred_element_type=jnp.float32)
    return out.astype(dt)


def _float0_like(x):
    import numpy as _np
    return _np.zeros(x.shape, jax.dtypes.float0)


def _make_fused_vjp(primal):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4,
                                                        5, 6, 7))
    def wrapped(dist, rng, alpha, interpret, rows_s, cols_s, ro_s, co_s,
                ctr, key, A):
        from ..rng.state import RNGState
        return primal(dist, RNGState(ctr, key, rng), A, alpha, interpret,
                      rows_s, cols_s, ro_s, co_s)

    def fwd(dist, rng, alpha, interpret, rows_s, cols_s, ro_s, co_s,
            ctr, key, A):
        from ..rng.state import RNGState
        out = primal(dist, RNGState(ctr, key, rng), A, alpha, interpret,
                     rows_s, cols_s, ro_s, co_s)
        return out, (ctr, key, jnp.zeros((0,), A.dtype))

    def bwd(dist, rng, alpha, interpret, rows_s, cols_s, ro_s, co_s,
            res, g):
        ctr, key, dtok = res
        dA = _transposed_cotangent(dist, rng, alpha, interpret, rows_s,
                                   cols_s, ro_s, co_s, ctr, key,
                                   g.astype(dtok.dtype))
        return _float0_like(ctr), _float0_like(key), dA

    wrapped.defvjp(fwd, bwd)
    return wrapped


def _fused_call_diff_primal(d, m, gaussian, alpha, ctr_stride, interpret,
                            rng, seed_words, a):
    n = a.shape[1]
    d_pad, m_pad, n_pad, ti, tk, tn = _plan(d, m, n)
    if m_pad != m or n_pad != n:
        a = jnp.pad(a, ((0, m_pad - m), (0, n_pad - n)))
    out = _fused_call(seed_words, a, d=d_pad, m=m_pad, gaussian=gaussian,
                      alpha=float(alpha), ti=ti, tk=tk, tn=tn,
                      ctr_stride=ctr_stride, interpret=interpret,
                      rng=rng, **exec_opts(ti))
    if d_pad != d or n_pad != n:
        out = out[:d, :n]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def fused_call_diff(d, m, gaussian, alpha, ctr_stride, interpret, rng,
                    seed_words, a):
    """alpha * G @ a for the RowMajor counter map G(i, c) at counter
    seed + i*ctr_stride + c//4, auto-planned/padded, differentiable in a.

    The kernel-level sibling of fused_sketch for callers that fold their
    own (possibly TRACED) submatrix offsets into seed_words — the
    distributed shard bodies (parallel/distributed.py). Linear in a, so
    the cotangent is G^T @ g, which is exactly the transposed-generation
    kernel with the SAME seed words and counter stride and (d, m)
    swapped: G^T(i, c) = G(c, i) lives at counter c*ctr_stride + i//4,
    the _fused_call_T addressing. Phantom padded rows/columns multiply
    zero data in both directions (the counter stride is the caller's
    TRUE parent stride throughout)."""
    return _fused_call_diff_primal(d, m, gaussian, alpha, ctr_stride,
                                   interpret, rng, seed_words, a)


def _fused_call_diff_fwd(d, m, gaussian, alpha, ctr_stride, interpret,
                         rng, seed_words, a):
    out = _fused_call_diff_primal(d, m, gaussian, alpha, ctr_stride,
                                  interpret, rng, seed_words, a)
    return out, (seed_words,)


def _fused_call_diff_bwd(d, m, gaussian, alpha, ctr_stride, interpret,
                         rng, res, g):
    (seed_words,) = res
    n = g.shape[1]
    # dA = alpha * G^T @ g: T-kernel out rows = m, contraction = d
    m_pad, d_pad, n_pad, ti, tk, tn = _plan_T(m, d, n)
    g_in = g
    if d_pad != d or n_pad != n:
        g_in = jnp.pad(g, ((0, d_pad - d), (0, n_pad - n)))
    da = _fused_call_T(seed_words, g_in.astype(g.dtype), d=m_pad,
                       m=d_pad, gaussian=gaussian, alpha=float(alpha),
                       ti=ti, tk=tk, tn=tn, ctr_stride=ctr_stride,
                       interpret=interpret, rng=rng, **exec_opts_T(ti))
    da = da[:m, :n].astype(g.dtype)
    return _float0_like(seed_words), da


fused_call_diff.defvjp(_fused_call_diff_fwd, _fused_call_diff_bwd)


_fused_rowmajor_vjp = _make_fused_vjp(_fused_rowmajor_primal)
_fused_colmajor_vjp = _make_fused_vjp(_fused_colmajor_primal)
