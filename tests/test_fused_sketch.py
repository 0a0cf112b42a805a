"""Fused Pallas kernel: interpreter-mode coverage on CPU.

The real kernel is exercised on TPU (see .claude/skills/verify); here the
kernel logic (counter addressing inside tiles, lane-split contraction,
accumulation) runs under the Pallas interpreter against the materialize
oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import DenseDist, DenseDistName, DenseSkOp, RNGState, Op
from randblas_tpu.ops.fused_sketch import (
    fused_sketch, fused_sketch_supported,
)


@pytest.mark.parametrize("family", [DenseDistName.Gaussian,
                                    DenseDistName.Uniform])
@pytest.mark.slow
def test_fused_interpret_matches_materialize(family):
    d, m, n = 16, 512, 128
    S = DenseSkOp(DenseDist(d, m, family), RNGState.from_key(3))
    A = jnp.asarray(
        np.random.default_rng(0).normal(size=(m, n)).astype(np.float32))
    got = np.asarray(fused_sketch(S, A, alpha=0.5, interpret=True))
    want = 0.5 * np.asarray(S.materialize()) @ np.asarray(A)
    # kernel contracts in bf16 x bf16 -> f32 (like XLA's f32 GEMM on TPU);
    # the CPU oracle matmul is true f32, so compare at bf16 input accuracy
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)


def test_fused_multi_panel_accumulation():
    # multiple k panels and j blocks
    d, m, n = 8, 2048, 256
    S = DenseSkOp(DenseDist(d, m), RNGState.from_key(9))
    A = jnp.asarray(
        np.random.default_rng(1).normal(size=(m, n)).astype(np.float32))
    got = np.asarray(fused_sketch(S, A, interpret=True))
    want = np.asarray(S.materialize()) @ np.asarray(A)
    # bf16 contraction inside the kernel vs f32 oracle
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)


def test_fused_submatrix_interpret():
    """Counter-aligned submatrix blocks generated in-kernel equal slices
    of the full operator."""
    big = DenseSkOp(DenseDist(32, 1024), RNGState.from_key(5))
    rows_s, cols_s, ro, co = 16, 512, 8, 256
    A = jnp.asarray(
        np.random.default_rng(2).normal(size=(cols_s, 128)).astype(
            np.float32))
    got = np.asarray(fused_sketch(big, A, interpret=True, rows_s=rows_s,
                                  cols_s=cols_s, ro_s=ro, co_s=co))
    blk = np.asarray(big.materialize())[ro:ro + rows_s, co:co + cols_s]
    want = blk @ np.asarray(A)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)


def test_fused_padded_shapes_interpret():
    """d and n padding: odd sketch size and non-128 data width."""
    S = DenseSkOp(DenseDist(13, 512), RNGState.from_key(8))
    A = jnp.asarray(
        np.random.default_rng(3).normal(size=(512, 100)).astype(
            np.float32))
    got = np.asarray(fused_sketch(S, A, interpret=True))
    want = np.asarray(S.materialize()) @ np.asarray(A)
    assert got.shape == (13, 100)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)


def test_supported_predicate():
    g = DenseDist(64, 1024)
    assert fused_sketch_supported(g, 64, 1024, 0, 0, Op.NoTrans,
                                  jnp.float32)
    # counter-aligned submatrices -> yes
    assert fused_sketch_supported(g, 32, 512, 4, 256, Op.NoTrans,
                                  jnp.float32)
    # unaligned column offset -> yes (reduced to the aligned case by
    # top-padding the data; round-2 coverage extension)
    assert fused_sketch_supported(g, 32, 512, 0, 2, Op.NoTrans,
                                  jnp.float32)
    # out of range -> no
    assert not fused_sketch_supported(g, 64, 1024, 4, 0, Op.NoTrans,
                                      jnp.float32)
    # transposed -> no
    assert not fused_sketch_supported(g, 1024, 64, 0, 0, Op.Trans,
                                      jnp.float32)
    # f64 -> no
    assert not fused_sketch_supported(g, 64, 1024, 0, 0, Op.NoTrans,
                                      jnp.float64)
    # tall Long operator (natural ColMajor) -> no
    tall = DenseDist(1024, 64)
    assert not fused_sketch_supported(tall, 1024, 64, 0, 0, Op.NoTrans,
                                      jnp.float32)

# ------------------------- Pallas fill kernel ------------------------------

class TestPallasFill:
    """pallas_fill_block vs the XLA fill: uint32-stream-identical by
    construction; Uniform floats exact, Gaussian floats within the
    documented ~1-ulp signed-view u01 tolerance (rng/transforms.py)."""

    @pytest.mark.parametrize("shape,ma", [
        ((64, 256), None),            # wide + Long: RowMajor natural
        ((256, 64), None),            # tall + Long: ColMajor natural
    ])
    @pytest.mark.parametrize("fam", [DenseDistName.Gaussian,
                                     DenseDistName.Uniform])
    @pytest.mark.slow
    def test_block_matches_xla_fill(self, shape, ma, fam):
        from randblas_tpu.dense import fill_dense_submat
        from randblas_tpu.ops import fused_sketch as fs
        R, C = shape
        dist = (DenseDist(R, C, fam) if ma is None
                else DenseDist(R, C, fam, ma))
        S = DenseSkOp(dist, RNGState.from_key(5))
        for (rs, cs, ro, co) in [(R, C, 0, 0), (32, 48, 8, 13),
                                 (17, 33, 3, 2)]:
            got = np.asarray(fs.pallas_fill_block(S, rs, cs, ro, co,
                                                  interpret=True))
            want = np.asarray(fill_dense_submat(dist, S.seed_state, rs,
                                                cs, ro, co))
            if fam == DenseDistName.Uniform:
                np.testing.assert_array_equal(got, want)
            else:
                np.testing.assert_allclose(got, want, rtol=1e-6,
                                           atol=1e-6)

    def test_staged_dispatch_uses_pallas_fill(self):
        """use_pallas_fill=True routes _dense_block through the kernel
        (interpret mode off-TPU) and the sketch matches the XLA-staged
        result within the fill tolerance."""
        import randblas_tpu.skge as skge
        from randblas_tpu import sketch_general
        d, m, n = 24, 96, 16
        S = DenseSkOp(DenseDist(d, m), RNGState.from_key(9))
        A = jnp.asarray(np.random.default_rng(0).normal(
            size=(m, n)).astype(np.float32))
        want = np.asarray(sketch_general(S, A))
        old = skge.use_pallas_fill
        try:
            skge.use_pallas_fill = True
            got = np.asarray(sketch_general(S, A))
        finally:
            skge.use_pallas_fill = old
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
