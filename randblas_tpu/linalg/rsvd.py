"""Randomized truncated SVD (Halko–Martinsson–Tropp) on top of QB.

The one-call form of the reference's svd_rank1_plus_noise.cc:217-300
pipeline (rangefinder -> QB -> small SVD), as a library function:
oversampled rangefinder with power iteration, then truncation to the
requested rank. Dense and sparse (COO/CSR/CSC) data both supported.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..base import require
from ..rng.state import RNGState
from .qb import qb_decompose, qb_to_svd


def rsvd(a, rank: int, state: RNGState, oversample: int = 8,
         power_iters: int = 2, dtype=jnp.float32,
         operator: str = "gaussian"
         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-``rank`` approximate SVD: returns (u, s, vt) with u (m, rank),
    s (rank,), vt (rank, n). ``oversample`` extra sketch columns and
    ``power_iters`` subspace iterations sharpen the tail (HMT 2011
    recommends 5-10 and 1-2 respectively). ``operator`` picks the
    rangefinder embedding ('gaussian' | 'saso' | 'srht'; see
    rangefinder)."""
    n_rows, n_cols = a.shape
    k = rank + oversample
    require(rank >= 1, "rank must be >= 1")
    require(k <= min(n_rows, n_cols),
            "rank + oversample must be <= min(A.shape)")
    q, b = qb_decompose(a, k, state, power_iters=power_iters, dtype=dtype,
                        operator=operator)
    u, s, vt = qb_to_svd(q, b)
    return u[:, :rank], s[:rank], vt[:rank, :]
