"""Embedding-family factory shared by the linalg tier.

Operator-layer helper (families live in dense.py / sparse.py / trig.py);
it sits in its own module so lstsq/qb/leverage can all import it at
module scope without creating cycles.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..base import require
from ..dense import DenseDist, DenseSkOp
from ..rng.state import RNGState
from ..sparse import SparseDist, SparseSkOp
from ..trig import TrigDist, TrigSkOp


def make_embedding(operator: str, d: int, m: int, state: RNGState, *,
                   vec_nnz: int = 8, dtype=jnp.float32):
    """A (d, m) sketching operator of the requested family:
    'saso' (sparse sign, cheap and general), 'gaussian' (dense), or
    'srht' (subsampled randomized Hadamard — O(mn log m) apply
    independent of d; dense data only)."""
    if operator == "saso":
        return SparseSkOp(SparseDist(d, m, vec_nnz=min(vec_nnz, d)), state)
    if operator == "gaussian":
        return DenseSkOp(DenseDist(d, m), state, dtype=dtype)
    if operator == "srht":
        return TrigSkOp(TrigDist(d, m), state, dtype=dtype)
    require(False, f"unknown embedding family {operator!r}; "
                   "expected 'saso', 'gaussian', or 'srht'")
