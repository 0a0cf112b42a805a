"""QB decomposition / randomized rangefinder with power iteration.

TPU-native counterpart of the reference's sparse-low-rank-approx examples
(svd_rank1_plus_noise.cc:217-300, qrcp_matrixmarket.cc:220-283): sketch the
range of A with an implicit Gaussian operator, stabilize with QR between
power-iteration passes, then compress. Works for dense (jnp array) and
sparse (COO/CSR/CSC) data.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..base import require
from ..dense import DenseDist, DenseSkOp
from ..rng.state import RNGState
from ..skge import sketch_general
from ..sparse_data.spmm import left_spmm


def _is_sparse(a) -> bool:
    from ..sparse_data.coo import COOMatrix
    from ..sparse_data.csc import CSCMatrix
    from ..sparse_data.csr import CSRMatrix
    return isinstance(a, (COOMatrix, CSRMatrix, CSCMatrix))


def _apply(a, x):
    """a @ x for dense or sparse a. Dense f64 products route through the
    int8-sliced MXU GEMM on TPU (skge._matmul / use_hiprec_f64 policy) —
    XLA's emulated f64 matmul is orders of magnitude off the MXU, and
    the iterative consumers here (CGLS, power iteration) are exactly the
    f64-on-TPU workloads."""
    if _is_sparse(a):
        return left_spmm(a, x)
    from ..skge import _matmul
    return _matmul(a, x, x.dtype)


def _apply_t(a, x):
    """a.T @ x for dense or sparse a (same f64 routing as _apply)."""
    if _is_sparse(a):
        return left_spmm(a, x, op_a="T")
    from ..skge import _matmul
    return _matmul(a.T, x, x.dtype)


def rangefinder(a, k: int, state: RNGState, power_iters: int = 2,
                dtype=jnp.float32, operator: str = "gaussian") -> jax.Array:
    """Orthonormal Q (m x k) approximating range(A) via sketch + power
    iteration with QR re-orthonormalization each pass.

    ``operator`` picks the rangefinder's embedding family ('gaussian' |
    'saso' | 'srht', dense data only for the latter two): the initial
    sketch becomes A @ S^T with S a (k, n) operator, so 'srht' costs
    O(mn log n) instead of the dense 2mnk — cheaper whenever
    k > log2(n)/2, i.e. essentially always."""
    n_rows, n_cols = a.shape
    require(k <= min(n_rows, n_cols), "rank must be <= min dim")
    if operator == "gaussian" or _is_sparse(a):
        require(operator == "gaussian",
                "sparse data supports only the 'gaussian' rangefinder "
                "(materialized thin operator through the SpMM dispatcher)")
        S = DenseSkOp(DenseDist(n_cols, k), state, dtype=dtype)
        y = _apply(a, S.materialize())          # (m, k)
    else:
        from .embed import make_embedding
        S = make_embedding(operator, k, n_cols, state, dtype=dtype)
        y = sketch_general(S, a.astype(dtype), side="right", op_s="T")
    q, _ = jnp.linalg.qr(y)
    for _ in range(power_iters):
        z = _apply_t(a, q)
        w, _ = jnp.linalg.qr(z)
        y = _apply(a, w)
        q, _ = jnp.linalg.qr(y)
    return q


def qb_decompose(a, k: int, state: RNGState, power_iters: int = 2,
                 dtype=jnp.float32, operator: str = "gaussian"
                 ) -> Tuple[jax.Array, jax.Array]:
    """A ~= Q @ B with Q (m x k) orthonormal, B = Q^T A (k x n)."""
    q = rangefinder(a, k, state, power_iters, dtype, operator)
    b = _apply_t(a, q).T if _is_sparse(a) else jnp.matmul(
        q.T, a, preferred_element_type=dtype)
    return q, b


def qb_to_svd(q: jax.Array, b: jax.Array):
    """SVD of A from its QB factorization (svd_rank1_plus_noise.cc:264-300):
    svd(B) on the small k x n factor, then U = Q Ub."""
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = jnp.matmul(q, ub)
    return u, s, vt


def range_error_estimate(a, q: jax.Array, state: RNGState, *,
                         probes: int = 10, alpha: float = 10.0,
                         dtype=None) -> Tuple[jax.Array, RNGState]:
    """A-posteriori certificate for a rangefinder basis: a bound on
    ``||(I - Q Q^T) A||_2`` that holds with probability at least
    ``1 - alpha**(-probes)`` (Halko-Martinsson-Tropp 2011, alg. 4.3 /
    eq. 4.3):

        bound = alpha * sqrt(2/pi) * max_j ||(I - Q Q^T) A w_j||

    over ``probes`` iid Gaussian probe vectors ``w_j`` (counter-addressed
    and seed-chained like every estimator in this tier). Defaults give a
    1 - 1e-10 certificate from 10 extra matvecs. The reference's QB
    example iterates blindly to a fixed depth; this is the cheap check
    that lets adaptive pipelines stop when the range is captured.
    Returns ``(bound, next_state)``.
    """
    m, n = a.shape
    require(q.shape[0] == m, "q must have A's row count")
    require(probes >= 1, "probes must be >= 1")
    dtype = dtype or q.dtype
    W = DenseSkOp(DenseDist(n, probes), state, dtype=dtype)
    y = _apply(a, W.materialize())                  # (m, probes)
    r = y - q @ (q.T @ y)
    norms = jnp.linalg.norm(r, axis=0)
    bound = alpha * jnp.sqrt(2.0 / jnp.pi) * jnp.max(norms)
    return bound.astype(dtype), W.next_state
