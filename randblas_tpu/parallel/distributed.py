"""Distributed sketching: shard_map SPMD over a device mesh.

Sharding layout for B = S @ A (left sketch):

    mesh axes: ('model', 'data')            # either may be size 1
    A: P('data', None)        -- m (long) axis sharded over 'data'
    S: implicit               -- tile (ro, co) = f(axis_index) per device
    B: P('model', None)       -- d axis sharded over 'model'; contraction
                                 over m psum-reduced across 'data'

Each device fills exactly the (d/model x m/data) tile of the global
operator its coordinates dictate, via counter-addressed traced-offset fill
(dense.fill_dense_submat_traced) — zero communication for generation. The
only collective is the psum of partial products over 'data' (ICI
all-reduce), exactly where a sharded GEMM must reduce.

Determinism across mesh shapes (tests/test_distributed.py): operator
*generation* is bitwise invariant to the mesh (tile values depend only on
seed + global coordinates); the contraction's psum reassociates the f32
sum across 'data' shards, so full sketches agree to reduction-order
tolerance, like any sharded GEMM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..base import require
from ..dense import DenseSkOp, fill_dense_submat_traced
from ..sparse import SparseSkOp
from ..ops.coo_apply import coo_left_apply


def make_sketch_mesh(model: int = 1, data: Optional[int] = None,
                     devices=None) -> Mesh:
    """A ('model', 'data') mesh over the available devices."""
    devices = jax.devices() if devices is None else devices
    if data is None:
        data = len(devices) // model
    require(model * data == len(devices),
            f"mesh {model}x{data} != {len(devices)} devices")
    arr = np.array(devices).reshape(model, data)
    return Mesh(arr, ("model", "data"))


def distributed_sketch(
    S: DenseSkOp,
    A: jax.Array,
    mesh: Mesh,
    *,
    alpha=1.0,
) -> jax.Array:
    """B = alpha * S @ A with A m-sharded over 'data' and B d-sharded over
    'model'. Returns a global jax.Array with sharding P('model', None).

    Alignment: d must divide by mesh 'model' size, m by 'data' size, and
    the per-shard extent along the distribution's major axis must be a
    multiple of the counter width (4) — i.e. shard sizes stay MXU-friendly
    anyway.
    """
    require(isinstance(S, DenseSkOp), "distributed_sketch takes a DenseSkOp")
    d, m = S.shape
    n = A.shape[1]
    pm = mesh.shape["model"]
    pd = mesh.shape["data"]
    require(d % pm == 0, "d must divide the 'model' axis size")
    require(m % pd == 0, "m must divide the 'data' axis size")
    d_per, m_per = d // pm, m // pd
    require(A.shape[0] == m, "A row count must equal S.n_cols")

    dist, seed, dtype = S.dist, S.seed_state, S.dtype

    def shard_fn(a_blk):
        mi = jax.lax.axis_index("model")
        di = jax.lax.axis_index("data")
        ro = mi.astype(jnp.uint32) * jnp.uint32(d_per)
        co = di.astype(jnp.uint32) * jnp.uint32(m_per)
        s_blk = fill_dense_submat_traced(dist, seed, d_per, m_per, ro, co,
                                         dtype)
        part = jnp.matmul(s_blk, a_blk.astype(dtype),
                          preferred_element_type=dtype)
        return jax.lax.psum(jnp.asarray(alpha, dtype) * part, "data")

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=P("data", None),
        out_specs=P("model", None),
    )
    return fn(A)


def distributed_sketch_jit(S: DenseSkOp, A: jax.Array, mesh: Mesh,
                           *, alpha=1.0) -> jax.Array:
    """jit-wrapped distributed_sketch with sharded output layout."""
    f = jax.jit(functools.partial(distributed_sketch, mesh=mesh,
                                  alpha=alpha),
                static_argnames=())
    return f(S, A)


def distributed_sparse_sketch(
    S: SparseSkOp,
    A: jax.Array,
    mesh: Mesh,
    *,
    alpha=1.0,
) -> jax.Array:
    """B = alpha * S @ A for a sparse-sign operator, A m-sharded over
    'data'. The COO triplets are replicated (they are tiny: vec_nnz * m
    entries) and each shard masks to its column range; partials psum over
    'data'. Output replicated over 'model'."""
    require(isinstance(S, SparseSkOp), "takes a SparseSkOp")
    s = S.filled()
    d, m = S.shape
    pd = mesh.shape["data"]
    require(m % pd == 0, "m must divide the 'data' axis size")
    m_per = m // pd
    rows, cols, vals = s.rows, s.cols, s.vals

    def shard_fn(a_blk, rows, cols, vals):
        di = jax.lax.axis_index("data")
        co = di.astype(jnp.int32) * jnp.int32(m_per)
        part = coo_left_apply(rows, cols - co, vals.astype(a_blk.dtype),
                              a_blk, d, m_per, 0, 0, alpha)
        return jax.lax.psum(part, "data")

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data", None), P(), P(), P()),
        out_specs=P(),
    )
    return fn(A, rows, cols, vals)
