"""Sketch-based QRCP, column interpolative decomposition (ID), and CUR.

Library form of the reference's sparse-low-rank-approx QRCP example
(/root/reference/examples/sparse-low-rank-approx/
qrcp_matrixmarket.cc:220-283): a randomized rangefinder compresses A to
a k x n factor, column-pivoted QR on that small factor reveals a
well-conditioned column subset, and the ID/CUR factorizations follow
from small solves. The only non-XLA step is LAPACK geqp3 on the (k, n)
factor — column pivoting is inherently sequential, so it runs on host
(SciPy), like the reference calls LAPACK. Everything else (the sketch,
power iteration, coefficient solves) is JAX, and A is only ever touched
through matvec-shaped products — dense and sparse (COO/CSR/CSC) data
both work without densifying A.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..base import require
from ..rng.state import RNGState
from .qb import _apply, _apply_t, _is_sparse, rangefinder


def sketch_qrcp(a, k: int, state: RNGState, power_iters: int = 2,
                dtype=jnp.float32, operator: str = "gaussian",
                stabilizer: str = None
                ) -> Tuple[jax.Array, jax.Array, np.ndarray]:
    """Rank-k sketched column-pivoted QR.

    Returns ``(q, b, piv)``: ``q`` (m, k) orthonormal from the
    rangefinder, ``b = q^T A`` (k, n), and ``piv`` (n,) the LAPACK
    pivot order of b's columns — ``piv[:k]`` indexes a well-conditioned
    rank-k column subset of A (qrcp_matrixmarket.cc's pipeline).
    ``stabilizer`` picks the power iteration's between-pass scheme
    ('cholqr' | 'qr' | 'lu' | 'none' — the variant menu the reference's
    example walks through, qrcp_matrixmarket.cc:220-283; see
    qb._stabilize and the variant study in examples/qrcp_low_rank.py).
    """
    import scipy.linalg
    q = rangefinder(a, k, state, power_iters, dtype, operator,
                    stabilizer=stabilizer)
    b = _apply_t(a, q).T                        # (k, n) = q^T A
    _, _, piv = scipy.linalg.qr(np.asarray(b), pivoting=True,
                                mode="economic")
    return q, b, piv


def column_id(a, k: int, state: RNGState, power_iters: int = 2,
              dtype=jnp.float32, operator: str = "gaussian"
              ) -> Tuple[np.ndarray, jax.Array]:
    """One-sided (column) interpolative decomposition: A ~= A[:, J] @ Z.

    Returns ``(J, Z)`` with ``J`` (k,) the selected column indices and
    ``Z`` (k, n) interpolation coefficients satisfying
    ``Z[:, J] == I_k`` up to solve roundoff. Built on sketch_qrcp: with
    A ~= Q B, the coefficients solve B[:, J] Z = B — a k x k system,
    never an m-sized one.
    """
    _, b, piv = sketch_qrcp(a, k, state, power_iters, dtype, operator)
    j = np.asarray(piv[:k])
    z = jnp.linalg.solve(b[:, j], b)            # (k, n)
    return j, z


def _onehot(idx, length: int, dtype) -> jax.Array:
    """(length, k) selection matrix with columns e_{idx[t]}."""
    idx = jnp.asarray(idx)
    return (jnp.arange(length)[:, None] == idx[None, :]).astype(dtype)


def cur(a, k: int, state: RNGState, power_iters: int = 2,
        dtype=jnp.float32, operator: str = "gaussian"
        ) -> Tuple[np.ndarray, np.ndarray, jax.Array]:
    """CUR decomposition: A ~= C @ U @ R with C = A[:, J] (actual
    columns), R = A[I, :] (actual rows), U (k, k).

    Column subset from sketch_qrcp on A; row subset from the same
    pipeline on A^T (seed-chained: the row stage consumes the stream
    AFTER the column stage, so one seed reproduces the whole
    factorization). U = pinv(C) A pinv(R) is assembled through k-sized
    normal equations — pivoting selects a well-conditioned skeleton, so
    the squared conditioning of the k x k Gram systems stays benign —
    and A is only touched via (transposed) products.

    Returns ``(I, J, U)``.
    """
    require(k >= 1, "rank must be >= 1")
    m, n = a.shape
    _, _, piv_c = sketch_qrcp(a, k, state, power_iters, dtype, operator)
    j = np.asarray(piv_c[:k])
    # rows of A = columns of A^T; chain the stream past the column
    # stage's ACTUAL embedding (the rangefinder consumes DenseDist(n, k)
    # for 'gaussian'/sparse data, make_embedding(operator, k, n)'s
    # stream otherwise — chaining must follow the same distribution or
    # the row stage is irreproducible from the seed-chaining contract)
    if operator == "gaussian" or _is_sparse(a):
        from ..dense import DenseDist, compute_next_state
        chained = compute_next_state(DenseDist(n, k), state)
    else:
        from .embed import make_embedding
        chained = make_embedding(operator, k, n, state, dtype=dtype
                                 ).next_state
    if _is_sparse(a):
        from ..sparse_data.conversions import to_coo
        at = to_coo(a).transpose()
    else:
        at = a.T
    _, _, piv_r = sketch_qrcp(at, k, chained, power_iters, dtype,
                              operator)
    i = np.asarray(piv_r[:k])

    if _is_sparse(a):
        # no fancy indexing on the sparse containers: extract the
        # skeletons as one-hot products (two thin SpMMs)
        c = _apply(a, _onehot(j, n, dtype))      # (m, k) = A[:, J]
        r = _apply_t(a, _onehot(i, m, dtype)).T  # (k, n) = A[I, :]
    else:
        # dense data: direct gathers, not O(mnk) one-hot matmuls; match
        # the one-hot product's dtype promotion
        out_dt = jnp.result_type(a.dtype, dtype)
        c = jnp.asarray(a)[:, j].astype(out_dt)
        r = jnp.asarray(a)[i, :].astype(out_dt)
    # W = pinv(C) A from the normal equations: (C^T C) W = C^T A,
    # with C^T A = (A^T C)^T — one transposed product, A never densified.
    cta = _apply_t(a, c).T                       # (k, n)
    w = jnp.linalg.solve(c.T @ c, cta)           # (k, n)
    # U = W pinv(R) = W R^T (R R^T)^{-1}
    u = jnp.linalg.solve(r @ r.T, (w @ r.T).T).T
    return i, j, u
