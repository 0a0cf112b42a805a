"""Pallas SASO sketch kernel (ops/saso_sketch.py): interpret-mode
correctness vs the densified oracle, dispatch wiring, and padding
invariants. The compiled-kernel assertions live in the hardware tier
(tests/test_tpu_hardware.py::test_saso_kernel_on_hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import randblas_tpu as rb
from randblas_tpu.ops.saso_sketch import saso_sketch, saso_sketch_supported


def _bf16(x):
    return np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(
        jnp.float32))


def _case(d, m, n, k, seed, alpha=1.0):
    S = rb.SparseSkOp(rb.SparseDist(d, m, vec_nnz=k),
                      rb.RNGState.from_key(seed))
    s = S.filled()
    A = jnp.asarray(np.random.default_rng(seed).normal(
        size=(m, n)).astype(np.float32))
    got = np.asarray(saso_sketch(s.rows.reshape(m, k),
                                 s.vals.reshape(m, k), A, d, alpha,
                                 interpret=True))
    # the kernel's dots run bf16: oracle = bf16-rounded operands in f64
    want = alpha * (np.asarray(S.materialize(), np.float64)
                    @ _bf16(A).astype(np.float64))
    tol = 8 * np.finfo(np.float32).eps * k * np.abs(_bf16(A)).max() \
        * abs(alpha) + 1e-5
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=float(tol) + 2 ** -8 * np.abs(
                                   want).max())
    return S, A, got


@pytest.mark.parametrize("d,m,n,k", [
    (1024, 4096, 256, 8),     # config-3-like, aligned
    (100, 777, 65, 8),        # everything ragged
    (60, 500, 33, 3),         # d < one hi block
    (1000, 2048, 129, 16),    # max slot count, ragged n
    (513, 4096, 7, 1),        # single slot, skinny operand
])
def test_kernel_matches_oracle(d, m, n, k):
    _case(d, m, n, k, seed=d + k)


def test_kernel_alpha():
    _case(256, 2048, 64, 8, seed=9, alpha=-0.75)


def test_supported_gate():
    assert saso_sketch_supported(1024, 65536, 8, 2048)
    assert not saso_sketch_supported(8192, 65536, 8, 2048)  # out tile
    assert not saso_sketch_supported(1024, 65536, 32, 2048)  # slot axis


def test_dispatch_routes_wide_saso_through_kernel():
    """flags(use_saso_kernel='interp') must route sketch_general's wide
    full-SASO branch through the Pallas kernel; values must match the
    XLA panel route to bf16 accuracy (both contract in bf16)."""
    from randblas_tpu.ops import saso_sketch as mod

    d, m, n, k = 128, 1024, 64, 8
    S = rb.SparseSkOp(rb.SparseDist(d, m, vec_nnz=k),
                      rb.RNGState.from_key(4))
    A = jnp.asarray(np.random.default_rng(4).normal(
        size=(m, n)).astype(np.float32))
    base = np.asarray(rb.sketch_general(S, A))

    calls = {}
    orig = mod.saso_sketch

    def spy(*a, **kw):
        calls["interpret"] = kw.get("interpret")
        return orig(*a, **kw)

    mod.saso_sketch = spy
    try:
        with rb.flags(use_saso_kernel="interp"):
            got = np.asarray(rb.sketch_general(S, A))
    finally:
        mod.saso_sketch = orig
    assert calls.get("interpret") is True
    np.testing.assert_allclose(got, base, rtol=0,
                               atol=2 ** -7 * np.abs(base).max() + 1e-4)


def test_dispatch_submatrix_stays_on_coo_path():
    """Submatrix views must NOT take the kernel (its tables are the
    full canonical per-column structure)."""
    from randblas_tpu.ops import saso_sketch as mod

    d, m = 64, 512
    S = rb.SparseSkOp(rb.SparseDist(d, m, vec_nnz=4),
                      rb.RNGState.from_key(5))
    A = jnp.asarray(np.random.default_rng(5).normal(
        size=(256, 16)).astype(np.float32))

    called = []
    orig = mod.saso_sketch
    mod.saso_sketch = lambda *a, **kw: called.append(1) or orig(*a, **kw)
    try:
        with rb.flags(use_saso_kernel="interp"):
            got = np.asarray(rb.sketch_general(
                S, A, d=32, ro_s=8, co_s=100))
    finally:
        mod.saso_sketch = orig
    assert not called
    want = np.asarray(S.materialize())[8:40, 100:356] @ np.asarray(A)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestTransFastPaths:
    """Right-sketch reduction (op_s == Trans full operator): S^T of a
    tall-Short SASO is wide (fixed nnz per column -> one-hot routes,
    incl. the kernel); S^T of a wide-Short SASO is tall (pure gather).
    Previously both fell to the general COO path."""

    def test_right_sketch_tall_saso_matches_oracle(self):
        m, d, k = 2048, 96, 8
        S = rb.SparseSkOp(rb.SparseDist(m, d, vec_nnz=k),
                          rb.RNGState.from_key(6))
        A = jnp.asarray(np.random.default_rng(6).normal(
            size=(32, m)).astype(np.float32))
        got = np.asarray(rb.sketch_general(S, A, side="right"))
        want = np.asarray(A) @ np.asarray(S.materialize())
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_right_sketch_tall_saso_kernel_route(self):
        from randblas_tpu.ops import saso_sketch as mod
        m, d, k = 1024, 64, 4
        S = rb.SparseSkOp(rb.SparseDist(m, d, vec_nnz=k),
                          rb.RNGState.from_key(7))
        A = jnp.asarray(np.random.default_rng(7).normal(
            size=(16, m)).astype(np.float32))
        calls = []
        orig = mod.saso_sketch
        mod.saso_sketch = lambda *a, **kw: calls.append(1) or orig(*a, **kw)
        try:
            with rb.flags(use_saso_kernel="interp"):
                got = np.asarray(rb.sketch_general(S, A, side="right"))
        finally:
            mod.saso_sketch = orig
        assert calls
        want = np.asarray(A) @ np.asarray(S.materialize())
        np.testing.assert_allclose(got, want, rtol=0,
                                   atol=2 ** -7 * np.abs(want).max() + 1e-4)

    def test_right_sketch_wide_saso_gather(self):
        m, d, k = 64, 512, 4   # wide S: right sketch LIFTS columns
        S = rb.SparseSkOp(rb.SparseDist(m, d, vec_nnz=k),
                          rb.RNGState.from_key(8))
        A = jnp.asarray(np.random.default_rng(8).normal(
            size=(16, m)).astype(np.float32))
        got = np.asarray(rb.sketch_general(S, A, side="right"))
        want = np.asarray(A) @ np.asarray(S.materialize())
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_left_trans_equals_right(self):
        # left sketch with op_s='T' hits the same trans_full branch
        m, d, k = 512, 48, 8
        S = rb.SparseSkOp(rb.SparseDist(m, d, vec_nnz=k),
                          rb.RNGState.from_key(9))
        A = jnp.asarray(np.random.default_rng(9).normal(
            size=(m, 24)).astype(np.float32))
        got = np.asarray(rb.sketch_general(S, A, op_s="T"))
        want = np.asarray(S.materialize()).T @ np.asarray(A)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pick_tn_always_lane_aligned():
    """Regression: the VMEM-driven TN shrink must stay a multiple of 128
    (Mosaic block-shape rule) — a plain halve turned 1152 into 576 but
    2304x1920 into 960 with d_pad*tn still over budget history; sweep
    the whole gate-admissible space."""
    from randblas_tpu.ops.saso_sketch import _pick_tn
    for d_pad in (128, 512, 1024, 2304, 4096):
        for n in (1, 100, 512, 1100, 1153, 1900, 2048, 5000):
            tn = _pick_tn(d_pad, n)
            assert tn % 128 == 0 and tn >= 128, (d_pad, n, tn)
            assert d_pad * tn * 4 <= (16 << 20) or tn == 128, (d_pad, n)


def test_kernel_shrunk_tn_matches_oracle():
    """d_pad=2176 with n=1900 drives the TN-shrink path that used to
    produce a misaligned tile (2176*1920*4 > 16 MB -> old tn 960; the
    aligned shrink gives 1024). Wide operator so rows reshape (m, k)."""
    _case(2176, 2304, 1900, 4, seed=11)
