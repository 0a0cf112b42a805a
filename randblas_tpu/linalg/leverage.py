"""Sketched leverage-score estimation (Drineas–Magdon-Ismail–Mahoney–
Woodruff 2012).

Leverage scores l_i = ||Q[i, :]||^2 (Q an orthonormal basis for
range(A)) drive importance sampling for regression and low-rank
approximation; the reference ships the sampling side
(/root/reference/RandBLAS/util.hh:173-334, sample_indices_iid) and this
module supplies the scores with two sketches instead of a full QR:

  1. embed:  R from qr(S A), S a (d, m) embedding with d = O(n) —
     A R^{-1} has nearly-orthonormal columns, so rows of A R^{-1}
     approximate rows of Q.
  2. JL:     G (n, r) Gaussian, r << n — row norms of (A R^{-1}) G
     estimate row norms of A R^{-1} at O(mnr) instead of O(mn^2).

Both sketches ride the framework's implicit counter-addressed
operators; total cost is two sketched GEMMs + one n x n QR.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..base import require
from ..dense import DenseDist, DenseSkOp, isometry_scale_factor
from ..rng.state import RNGState
from ..skge import sketch_general


def exact_leverage_scores(a: jax.Array) -> jax.Array:
    """l_i = ||Q[i, :]||^2 via dense QR (test/debug reference)."""
    q, _ = jnp.linalg.qr(a)
    return jnp.sum(q * q, axis=1)


def leverage_scores(a: jax.Array, state: RNGState, embed_factor: int = 4,
                    jl_dim: int = 0, operator: str = "saso",
                    dtype=jnp.float32
                    ) -> Tuple[jax.Array, RNGState]:
    """Estimated leverage scores of tall ``a`` (m x n, m >= n).

    ``embed_factor``: embedding rows d = embed_factor * n (4 gives
    ~ +-50% relative error bounds; raise for tighter estimates).
    ``jl_dim``: columns of the second JL sketch; 0 disables it and
    computes exact row norms of A R^{-1} (still sketched in stage 1).
    ``operator``: the stage-1 embedding family — 'saso' (sparse sign,
    vec_nnz=8, default), 'gaussian', or 'srht'.

    Returns (scores (m,), next_state).
    """
    m, n = a.shape
    require(m >= n, "leverage_scores expects a tall matrix (m >= n)")
    require(jl_dim < n, "jl_dim must be < n (a JL sketch must reduce the "
                        "column count; use jl_dim=0 for exact row norms)")
    d = min(embed_factor * n, m)
    require(d >= n, "embedding dimension must be >= n")

    a = a.astype(dtype)
    from .embed import make_embedding
    S = make_embedding(operator, d, m, state, vec_nnz=8, dtype=dtype)
    dist = S.dist
    # isometry scaling matters here: scores = row norms of A R^{-1}
    # scale as 1/c^2 under S -> cS, so S must satisfy E[S^T S] = I.
    sa = sketch_general(S, a, alpha=isometry_scale_factor(dist))  # (d, n)
    r = jnp.linalg.qr(sa, mode="r")               # (n, n)

    if jl_dim:
        G = DenseSkOp(DenseDist(n, jl_dim), S.next_state, dtype=dtype)
        nxt = G.next_state
        # A (R^{-1} G): solve the small system first, one m x n GEMM
        rg = jax.scipy.linalg.solve_triangular(
            r, G.materialize() / jnp.sqrt(jnp.asarray(jl_dim, dtype)),
            lower=False)
        scores = jnp.sum((a @ rg) ** 2, axis=1)
    else:
        nxt = S.next_state
        ar = jax.scipy.linalg.solve_triangular(r.T, a.T, lower=True).T
        scores = jnp.sum(ar * ar, axis=1)
    return scores, nxt
