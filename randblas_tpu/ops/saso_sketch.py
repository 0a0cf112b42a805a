"""Pallas SASO sketch kernel: B = alpha * S @ A for wide sparse-sign
operators, one-hot panels built in VMEM.

The TPU fast path for the reference's "regular CSC" structure
(csc_spmm_impl.hh:68-88): a wide SASO has exactly ``k = vec_nnz`` signed
entries per data column, so S @ A is a one-hot-weighted reduction of A's
rows. The previous route (ops/coo_apply.py::onehot_panel_apply) builds
the one-hot panels with XLA compare-selects — correct, but the panels
round-trip through HBM between the compare and the GEMM, and every
panel element pays a compare against all k slot indices. Measured at
the config-3 shape (d=1024, m=65536, n=2048, k=8): 2.9 ms, slower than
the DENSE fused sketch (1.8 ms) despite 1/128th the math.

This kernel removes both costs:

* **panels never leave VMEM** — per (j, k-chunk) grid step the (d_pad,
  TK) one-hot panel is built in registers/VMEM and contracted
  immediately; the only HBM traffic is one pass over A, the tiny
  (k, m) index/sign tables, and the output.
* **hi/lo factored build** cuts the VPU work ~2.4x: with output rows
  split into blocks of 128 (r = 128*hi + lo), the slot compare runs
  against the 128-row *lo* iota only (8 compares + casts over (128,
  TK) instead of 8 over (d, TK)); the hi part collapses to (1, TK)
  sign masks ``w[s, rh] = sign_s * [hi_s == rh]`` that weight the
  shared eq planes into each 128-row panel with one fma each. Op
  count per data column: k*128*2 (eq) + k*d (fma) vs k*d*3 direct —
  at d=1024, k=8: ~10.2k vs ~24.6k VPU ops.

VPU and MXU costs are strictly additive on v5e (ROADMAP.md), so the
kernel's floor is eq/fma build + the (d, m, n) bf16 contraction; the
one-pass A read pipelines under both.

Semantics: indices/signs are PRECOMPUTED by the Fisher-Yates fill (the
counter-addressed stream contract lives there, sparse.py); this kernel
is a pure structured SpMM. Padding columns carry idx = -1, which
matches no hi block, so phantom columns contribute exactly zero
(the padding invariant: phantom rows/columns only ever multiply zero
data). Padded output rows (d_pad > d) are never indexed and are sliced
off by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..base import require

_LO = 128  # rows per hi-block (one f32 sublane tile of lanes)
_LO_SHIFT = _LO.bit_length() - 1  # idx >> _LO_SHIFT == idx // _LO for idx >= 0


def _pick_tn(d_pad: int, n: int) -> int:
    """Output-tile width: cover n when the (d_pad, TN) f32 out tile fits
    the VMEM budget, else shrink in 128-aligned steps (Mosaic requires
    the lane axis of every block to be a multiple of 128)."""
    tn = min(-(-n // 128) * 128, 2048)
    while d_pad * tn * 4 > (16 << 20) and tn > 128:
        tn = max(128, ((tn // 2) + 127) // 128 * 128)
    return tn


def _kernel(idx_ref, sgn_ref, a_ref, o_ref, *, k, n_rh, tk, alpha):
    """One (d_pad, TN) output step over a TK-column chunk of S/A.

    eq planes are shared across hi-blocks; the per-block panels are
    stacked along the row axis into one (d_pad, TK) bf16 operand for a
    single MXU dot per step (panels build in f32 — a bf16 build
    SIGABRTs the Mosaic compiler on this toolchain, see ell_spmm.py).
    """
    idx = idx_ref[:]                                  # (k, TK) int32
    lo = jnp.bitwise_and(idx, jnp.int32(_LO - 1))
    hi = jnp.right_shift(idx, jnp.int32(_LO_SHIFT))   # -1 -> -1 (no match)
    iota = jax.lax.broadcasted_iota(jnp.int32, (_LO, tk), 0)
    eq = [(iota == lo[s:s + 1, :]).astype(jnp.float32)
          for s in range(k)]                          # k x (LO, TK)
    sgn = sgn_ref[:]                                  # (k, TK) f32
    panels = []
    for rh in range(n_rh):
        panel = jnp.zeros((_LO, tk), jnp.float32)
        for s in range(k):
            w = jnp.where(hi[s:s + 1, :] == rh, sgn[s:s + 1, :],
                          jnp.float32(0.0))           # (1, TK)
            panel = panel + eq[s] * w
        panels.append(panel.astype(jnp.bfloat16))
    stacked = panels[0] if n_rh == 1 else jnp.concatenate(panels, axis=0)
    contrib = jax.lax.dot_general(
        stacked, a_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if alpha != 1.0:
        contrib = jnp.float32(alpha) * contrib

    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        o_ref[:] = contrib

    @pl.when(kk != 0)
    def _():
        o_ref[:] = o_ref[:] + contrib


@functools.partial(jax.jit, static_argnames=("d_pad", "tk", "tn", "alpha",
                                             "interpret"))
def _call(idx, sgn, a, *, d_pad, tk, tn, alpha, interpret):
    k, m_pad = idx.shape
    n_pad = a.shape[1]
    n_j, n_k = n_pad // tn, m_pad // tk
    kernel = functools.partial(_kernel, k=k, n_rh=d_pad // _LO, tk=tk,
                               alpha=alpha)
    return pl.pallas_call(
        kernel,
        grid=(n_j, n_k),
        interpret=interpret,
        in_specs=[
            # index-map zeros derived from grid indices: a literal 0
            # traces as i64 under jax_enable_x64 and Mosaic rejects the
            # mixed (i64, i32) index tuple ("failed to legalize
            # func.return") — memory/axon-tpu-quirks.md
            pl.BlockSpec((k, tk), lambda j, kk: (j - j, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tk), lambda j, kk: (j - j, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_pad, tn), lambda j, kk: (kk - kk, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, sgn, a)


def saso_sketch_supported(d: int, m: int, k: int, n: int) -> bool:
    """Shape gate: the (d_pad, TN) output tile must stay VMEM-resident
    (d_pad * TN * 4 + panel/eq scratch within budget) and the slot axis
    must be a legal sublane tile. Dispatch profit gates live in
    skge._sparse_left_apply."""
    d_pad = -(-d // _LO) * _LO
    return (1 <= k <= 16) and d_pad <= 4096 and m >= 1 and n >= 1


def saso_sketch(idxs_major, vals, a, d: int, alpha=1.0,
                interpret: bool = False) -> jax.Array:
    """alpha * S @ a for a wide SASO given per-column structure.

    idxs_major: (m, k) output-row index per data column per slot;
    vals: (m, k) signs; a: (m, n). Returns (d, n) f32. The a operand is
    pre-cast to bf16 once (the dot runs bf16 either way; A chunks are
    revisited n_j times).
    """
    m, k = idxs_major.shape
    require(a.shape[0] == m, "operand height must equal S.n_cols")
    n = a.shape[1]
    require(saso_sketch_supported(d, m, k, n), "shape outside kernel gate")
    d_pad = -(-d // _LO) * _LO

    idx = idxs_major.astype(jnp.int32).T              # (k, m)
    sgn = vals.astype(jnp.float32).T
    tk = 2048 if m >= 2048 else max(128, -(-m // 128) * 128)
    m_pad = -(-m // tk) * tk
    if m_pad != m:
        idx = jnp.pad(idx, ((0, 0), (0, m_pad - m)), constant_values=-1)
        sgn = jnp.pad(sgn, ((0, 0), (0, m_pad - m)))
    a = jnp.asarray(a)
    a_bf = a.astype(jnp.bfloat16) if a.dtype != jnp.bfloat16 else a
    # TN covers n whenever the (d_pad, TN) out tile fits VMEM: every A
    # chunk is then read ONCE (n_j > 1 re-reads all of A per j — the
    # probe measured that re-read as the kernel's whole margin at
    # config 3)
    tn = _pick_tn(d_pad, n)
    n_pad = -(-n // tn) * tn
    if m_pad != m or n_pad != n:
        a_bf = jnp.pad(a_bf, ((0, m_pad - m), (0, n_pad - n)))
    out = _call(idx, sgn, a_bf, d_pad=d_pad, tk=tk, tn=tn,
                alpha=float(alpha), interpret=interpret)
    return out[:d, :n]
