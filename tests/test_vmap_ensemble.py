"""Ensemble sketching: jax.vmap over operator seeds.

RNGState/DenseSkOp are pytrees and every code path is traceable, so a
BATCH of independent sketching operators (e.g. for boosted/median-of-
sketches estimators) is one vmap over the seed arrays — no reference
analog (the C++ library is strictly one-operator-per-call)."""

import numpy as np

import pytest
import jax
import jax.numpy as jnp

import randblas_tpu as rb
from randblas_tpu.ops import fused_sketch as fs

DIST = rb.DenseDist(16, 64)
A = jnp.asarray(np.random.default_rng(0).normal(
    size=(64, 8)).astype(np.float32))


def _seeds(nb):
    ctrs = jnp.zeros((nb, 4), jnp.uint32)
    keys = jnp.zeros((nb, 2), jnp.uint32).at[:, 0].set(
        jnp.arange(nb, dtype=jnp.uint32))
    return ctrs, keys


def test_vmap_over_seeds_bitwise_staged():
    ctrs, keys = _seeds(3)

    def one(ctr, key):
        S = rb.DenseSkOp(DIST, rb.RNGState.from_arrays(ctr, key))
        return rb.sketch(S, A)

    batched = jax.vmap(one)(ctrs, keys)
    loop = jnp.stack([one(ctrs[i], keys[i]) for i in range(3)])
    np.testing.assert_array_equal(np.asarray(batched), np.asarray(loop))


def test_vmap_over_seeds_fused_interpret():
    ctrs, keys = _seeds(3)

    def one(ctr, key):
        S = rb.DenseSkOp(DIST, rb.RNGState.from_arrays(ctr, key))
        return fs.fused_sketch(S, A, interpret=True)

    batched = jax.vmap(one)(ctrs, keys)
    loop = jnp.stack([one(ctrs[i], keys[i]) for i in range(3)])
    np.testing.assert_array_equal(np.asarray(batched), np.asarray(loop))


def test_vmap_composes_with_grad():
    ctrs, keys = _seeds(3)

    def loss(a):
        ens = jax.vmap(lambda c, k: rb.sketch(
            rb.DenseSkOp(DIST, rb.RNGState.from_arrays(c, k)), a))(
            ctrs, keys)
        return jnp.sum(ens ** 2)

    g = jax.grad(loss)(A)
    # oracle: sum of per-operator staged gradients
    g_ref = sum(jax.grad(lambda a, i=i: jnp.sum((rb.DenseSkOp(
        DIST, rb.RNGState.from_arrays(ctrs[i], keys[i])).materialize()
        @ a) ** 2))(A) for i in range(3))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_vmap_sparse_operator_apply():
    """Batched SASO sketching: vmap over pre-filled triplet pytrees."""
    ops = [rb.SparseSkOp(rb.SparseDist(8, 64, vec_nnz=4),
                         rb.RNGState.from_key(k)).filled()
           for k in range(3)]
    rows = jnp.stack([o.rows for o in ops])
    cols = jnp.stack([o.cols for o in ops])
    vals = jnp.stack([o.vals for o in ops])

    from randblas_tpu.ops.coo_apply import coo_left_apply

    def one(r, c, v):
        return coo_left_apply(r, c, v, A, 8, 64)

    batched = jax.vmap(one)(rows, cols, vals)
    for i, o in enumerate(ops):
        want = np.asarray(o.materialize()) @ np.asarray(A)
        np.testing.assert_allclose(np.asarray(batched[i]), want,
                                   rtol=1e-5, atol=1e-5)
