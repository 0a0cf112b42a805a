"""Randomized Nyström approximation of PSD matrices.

Single-pass sketch-based low-rank eigendecomposition A ~= U diag(L) U^T
for symmetric positive semidefinite A, with the shifted-Cholesky
stabilization of Tropp–Yurtsever–Udell–Cevher (SIAM J. Matrix Anal.
2017, alg. 16 / Martinsson–Tropp 2020 alg. 14). Library-tier consumer
of the sketching core (the reference's examples tier builds the same
kind of pipelines on lskge3, e.g.
/root/reference/examples/sparse-low-rank-approx/svd_rank1_plus_noise.cc:217-300).

TPU notes: the (n, d) sketch Y = A @ S rides sketch_general's fused /
staged dispatch (the operator is never materialized for large A); the
d x d Cholesky + triangular solve are the only non-MXU-shaped steps and
run at O(d^2 n) <<< the sketch cost.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..base import require
from ..dense import DenseDist, DenseSkOp
from ..rng.state import RNGState
from ..skge import sketch_general
from .qb import _apply, _is_sparse


def nystrom(a, d: int, state: RNGState, dtype=jnp.float32
            ) -> Tuple[jax.Array, jax.Array, RNGState]:
    """Rank-d Nyström approximation of PSD ``a`` (n x n).

    Returns ``(u, lam, next_state)`` with ``u`` (n, d) orthonormal and
    ``lam`` (d,) nonnegative, so that A ~= u @ diag(lam) @ u.T. For A of
    exact rank r <= d the approximation is exact up to the stabilizing
    shift (~ eps * ||Y||_F).
    """
    n = a.shape[0]
    require(a.shape[0] == a.shape[1], "nystrom needs a square PSD A")
    require(1 <= d <= n, "sketch size d must be in [1, n]")

    S = DenseSkOp(DenseDist(n, d), state, dtype=dtype)
    if _is_sparse(a):
        y = _apply(a, S.materialize())
    else:
        y = sketch_general(S, a.astype(dtype), side="right", op_s="N")

    # Shifted Cholesky: nu ~ machine-eps scale of Y keeps the Gram
    # factor positive definite when A is numerically rank-deficient.
    eps = jnp.finfo(dtype).eps
    nu = eps * jnp.sqrt(jnp.float32(n)) * jnp.linalg.norm(y)
    omega = S.materialize()
    y_nu = y + nu * omega
    gram = omega.T @ y_nu                       # (d, d), symmetric PD
    gram = 0.5 * (gram + gram.T)
    c = jnp.linalg.cholesky(gram)
    # B = Y_nu C^{-T}  via triangular solve on the right
    b = jax.scipy.linalg.solve_triangular(c, y_nu.T, lower=True).T
    u, s, _ = jnp.linalg.svd(b, full_matrices=False)
    lam = jnp.maximum(s * s - nu, 0.0)
    return u, lam, S.next_state


def nystrom_apply(u: jax.Array, lam: jax.Array, x: jax.Array) -> jax.Array:
    """(u diag(lam) u^T) @ x — apply the Nyström approximation."""
    return u @ (lam[:, None] * (u.T @ x))
