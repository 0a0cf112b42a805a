"""Right-side fused dispatch (autotranspose route), interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import DenseDist, DenseDistName, DenseSkOp, MajorAxis, \
    RNGState, sketch_general
from randblas_tpu import skge


@pytest.fixture
def force_fused(monkeypatch):
    monkeypatch.setattr(skge, "use_fused", True)
    # interpret-mode Pallas on CPU via fused_sketch's interpret flag:
    # patch through to keep the test hermetic
    from randblas_tpu.ops import fused_sketch as fs
    orig = fs.fused_sketch

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fs, "fused_sketch", interp)
    yield


def test_right_fused_notrans_tall_operator(force_fused):
    # A (8, 512) @ S (512, 64): operator (32K) >= 2x data (4K) -> fused
    n, m, d = 8, 512, 64
    S = DenseSkOp(DenseDist(m, d), RNGState.from_key(4))  # tall, Long
    A = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, m)).astype(np.float32))
    got = np.asarray(sketch_general(S, A, side="right"))
    want = np.asarray(A) @ np.asarray(S.materialize())
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)


def test_right_fused_trans_wide_operator(force_fused):
    # A (8, 512) @ S^T with S (64, 512) wide: stored operator is the
    # left operand directly
    n, m, d = 8, 512, 64
    S = DenseSkOp(DenseDist(d, m), RNGState.from_key(5))
    A = jnp.asarray(
        np.random.default_rng(1).normal(size=(n, m)).astype(np.float32))
    got = np.asarray(sketch_general(S, A, side="right", op_s="T"))
    want = np.asarray(A) @ np.asarray(S.materialize()).T
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)


def test_right_small_operator_falls_back():
    # operator smaller than data: must take the materialize path and be
    # exact f32 (no bf16 contraction)
    n, m, d = 512, 64, 8
    S = DenseSkOp(DenseDist(m, d), RNGState.from_key(6))
    A = jnp.asarray(
        np.random.default_rng(2).normal(size=(n, m)).astype(np.float32))
    got = np.asarray(sketch_general(S, A, side="right"))
    want = np.asarray(A) @ np.asarray(S.materialize())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
