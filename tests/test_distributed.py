"""Multi-device sketching tests on the 8-device virtual CPU mesh.

The key property (mesh-shape invariance, the multi-chip generalization of
the reference's thread-count-invariance test, test_denseskop.cc:300-341):
the same seed produces bitwise-identical sketches on 1x1, 1x8, 2x4, 8x1
meshes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import DenseDist, DenseSkOp, RNGState, SparseDist, \
    SparseSkOp, sketch_general
from randblas_tpu.parallel import distributed_sketch, make_sketch_mesh
from randblas_tpu.parallel.distributed import distributed_sparse_sketch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

D, M, N = 16, 64, 8


def _setup(key=5):
    S = DenseSkOp(DenseDist(D, M), RNGState.from_key(key))
    A = jnp.asarray(
        np.random.default_rng(0).normal(size=(M, N)).astype(np.float32))
    return S, A


@pytest.mark.parametrize("model,data", [(1, 8), (2, 4), (4, 2), (8, 1),
                                        (1, 1)])
def test_mesh_shape_invariance(model, data):
    S, A = _setup()
    devices = jax.devices()[:model * data]
    mesh = make_sketch_mesh(model, data, devices)
    got = np.asarray(distributed_sketch(S, A, mesh))
    want = np.asarray(sketch_general(S, A))
    # generation is bitwise invariant (see the identity test below); the
    # psum contraction reassociates the f32 sum across shards, so the
    # product matches to reduction-order tolerance only.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_single_vs_multi_bitwise_generation():
    """Generation itself (no contraction) is bitwise identical across the
    mesh: check by sketching against identity."""
    S = DenseSkOp(DenseDist(D, M), RNGState.from_key(9))
    eye = jnp.eye(M, dtype=jnp.float32)
    mesh = make_sketch_mesh(2, 4)
    got = np.asarray(distributed_sketch(S, eye, mesh))
    want = np.asarray(S.materialize())
    np.testing.assert_array_equal(got, want)


def test_output_sharding():
    S, A = _setup()
    mesh = make_sketch_mesh(2, 4)
    out = distributed_sketch(S, A, mesh)
    assert out.shape == (D, N)
    # d axis sharded over 'model'
    shard_shapes = {tuple(s.data.shape) for s in out.addressable_shards}
    assert shard_shapes == {(D // 2, N)}


@pytest.mark.parametrize("model,data", [(2, 4), (1, 8)])
def test_distributed_right(model, data):
    m, d, rows = 64, 16, 10
    S = DenseSkOp(DenseDist(m, d), RNGState.from_key(13))  # tall, Long
    A = jnp.asarray(
        np.random.default_rng(2).normal(size=(rows, m)).astype(np.float32))
    from randblas_tpu.parallel import distributed_sketch_right
    mesh = make_sketch_mesh(model, data)
    got = np.asarray(distributed_sketch_right(S, A, mesh))
    want = np.asarray(sketch_general(S, A, side="right"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("model,data", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_distributed_sparse(model, data):
    """Canonical wide-SASO path: operator triplets sharded over 'data',
    output rows over 'model' (no replication of either)."""
    Ss = SparseSkOp(SparseDist(D, M, vec_nnz=4), RNGState.from_key(3))
    A = jnp.asarray(
        np.random.default_rng(1).normal(size=(M, N)).astype(np.float32))
    mesh = make_sketch_mesh(model, data)
    out = distributed_sparse_sketch(Ss, A, mesh)
    # output really is d-sharded over 'model'
    spec = out.sharding.spec
    assert spec[0] == ("model" if model > 1 else spec[0])
    got = np.asarray(out)
    want = np.asarray(sketch_general(Ss, A))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_distributed_sparse_noncanonical():
    """User-supplied COO order falls back to the replicated-triplet path
    (still model-sharded output) and stays correct."""
    Ss = SparseSkOp(SparseDist(D, M, vec_nnz=4), RNGState.from_key(3))
    s = Ss.filled()
    perm = np.random.default_rng(7).permutation(s.rows.shape[0])
    shuffled = SparseSkOp(
        Ss.dist, Ss.seed_state,
        rows=jnp.asarray(np.asarray(s.rows)[perm]),
        cols=jnp.asarray(np.asarray(s.cols)[perm]),
        vals=jnp.asarray(np.asarray(s.vals)[perm]))
    A = jnp.asarray(
        np.random.default_rng(1).normal(size=(M, N)).astype(np.float32))
    mesh = make_sketch_mesh(2, 4)
    got = np.asarray(distributed_sparse_sketch(shuffled, A, mesh))
    want = np.asarray(sketch_general(Ss, A))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_distributed_fused_interpret():
    """Per-shard fused kernel (Pallas interpret mode) produces the same
    global sketch as the XLA shard path."""
    S = DenseSkOp(DenseDist(D, 512), RNGState.from_key(21))
    A = jnp.asarray(
        np.random.default_rng(3).normal(size=(512, 8)).astype(np.float32))
    mesh = make_sketch_mesh(2, 4)
    got = np.asarray(distributed_sketch(S, A, mesh, use_fused=True,
                                        interpret=True))
    want = np.asarray(distributed_sketch(S, A, mesh, use_fused=False))
    scale = np.abs(want).max()
    # fused path contracts in bf16 (same as the TPU roofline GEMM)
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)


def test_jit_distributed():
    S, A = _setup()
    mesh = make_sketch_mesh(2, 4)

    import functools

    f = jax.jit(functools.partial(distributed_sketch, mesh=mesh))
    got = np.asarray(f(S, A))
    want = np.asarray(sketch_general(S, A))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("model,data", [(1, 8), (1, 4), (2, 4)])
def test_distributed_sketch_cols(model, data):
    """Column ("sequence") sharding: zero-collective layout — every
    device generates the same operator from counters and sketches its
    own columns; output stays column-sharded."""
    from randblas_tpu.parallel.distributed import distributed_sketch_cols
    S, A = _setup(key=17)
    devices = jax.devices()[:model * data]
    mesh = make_sketch_mesh(model, data, devices)
    out = distributed_sketch_cols(S, A, mesh)
    assert out.sharding.spec[1] == ("data" if data > 1
                                    else out.sharding.spec[1])
    want = np.asarray(sketch_general(S, A))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5,
                               atol=1e-5)
