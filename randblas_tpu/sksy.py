"""sketch_symmetric: SYMM-like sketching (counterpart of RandBLAS/sksy.hh).

A is a symmetric matrix stored as a general (n, n) array. The optional
symmetry check mirrors require_symmetric (util.hh:166-188) with the same
relative tolerance rule, performed host-side at trace time when possible.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import require
from .skge import SkOp, sketch_general


def require_symmetric(A, tol: float = 0.0):
    """Raise if |A - A^T| exceeds (|Aij| + |Aji| + 1) * tol elementwise.

    Counterpart of util.hh:166-188. tol < 0 skips the check. Works on
    concrete arrays only (a traced A inside jit skips the check, matching
    the reference's posture that validation is a host-side concern).
    """
    if tol < 0:
        return
    try:
        a = np.asarray(A)
    except Exception:
        return  # traced value: cannot check at runtime inside jit
    viol = np.abs(a - a.T)
    rel = (np.abs(a) + np.abs(a.T) + 1.0) * max(tol, 0.0)
    if (viol > rel).any():
        i, j = np.unravel_index(np.argmax(viol - rel), a.shape)
        raise ValueError(
            f"symmetry check failed: |A({i},{j}) - A({j},{i})| = "
            f"{viol[i, j]} exceeds tolerance {rel[i, j]}")


def sketch_symmetric(
    S: SkOp,
    A: jax.Array,
    *,
    side="left",
    alpha=1.0,
    beta=0.0,
    out: Optional[jax.Array] = None,
    d: Optional[int] = None,
    ro_s: int = 0,
    co_s: int = 0,
    sym_check_tol: float = 0.0,
) -> jax.Array:
    """B = alpha * submat(S) @ A + beta * B (left) or A @ submat(S) (right),
    with A symmetric in general storage (sksy.hh:166-537).

    No op arguments: symmetry makes them redundant, exactly as in the
    reference (all four overloads pass NoTrans/NoTrans).
    """
    A = jnp.asarray(A)
    require(A.ndim == 2 and A.shape[0] == A.shape[1],
            "A must be square (symmetric, general storage)")
    require_symmetric(A, sym_check_tol)
    return sketch_general(S, A, side=side, op_s="N", op_a="N", alpha=alpha,
                          beta=beta, out=out, d=d, ro_s=ro_s, co_s=co_s)
