"""Randomized eigendecomposition of symmetric (possibly indefinite)
matrices via Rayleigh–Ritz on a sketched range basis.

Completes the eigensolver family next to the PSD-only Nyström tier
(nystrom.py): for symmetric A with a mixed-sign spectrum, range(A) is
spanned by the dominant-|lambda| eigenvectors, so the QB rangefinder
basis Q captures them and the k x k projection T = Q^T A Q delivers
signed Ritz values (HMT 2011, alg. 5.3 / Martinsson–Tropp 2020 §11.7).
Same consumer shape as the reference's examples tier pipelines
(/root/reference/examples/sparse-low-rank-approx/svd_rank1_plus_noise.cc:217-300),
upgraded from SVD to a one-sided symmetric factorization.

TPU notes: the rangefinder rides sketch_general's fused/staged dispatch;
the only non-MXU-shaped steps are the k x k eigh and the final thin
products.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..base import require
from ..rng.state import RNGState
from .qb import _apply, rangefinder


def rand_eigh(a, k: int, state: RNGState, power_iters: int = 2,
              dtype=jnp.float32, operator: str = "gaussian"
              ) -> Tuple[jax.Array, jax.Array]:
    """Rank-k randomized symmetric eigendecomposition:
    ``A ~= u @ diag(w) @ u.T`` with signed eigenvalues.

    ``a`` is symmetric (n, n), dense or sparse (COO/CSR/CSC); symmetry is
    assumed, not checked (use util.require_symmetric beforehand if
    unsure). Returns ``(w, u)`` with ``w`` (k,) ascending (eigh
    convention) and ``u`` (n, k) orthonormal. For A of exact rank
    r <= k the factorization is exact; in general the Ritz values
    approximate the k dominant-|lambda| eigenvalues with rangefinder
    accuracy. ``operator`` picks the rangefinder embedding family
    ('gaussian' | 'saso' | 'srht', dense data only for the latter two).
    """
    n, n2 = a.shape
    require(n == n2, "rand_eigh needs a square symmetric A")
    require(1 <= k <= n, "rank must be in [1, n]")
    q = rangefinder(a, k, state, power_iters, dtype, operator)
    aq = _apply(a, q)                                  # (n, k)
    t = jnp.matmul(q.T, aq, preferred_element_type=dtype)
    t = 0.5 * (t + t.T)                                # Rayleigh quotient
    w, v = jnp.linalg.eigh(t)
    u = jnp.matmul(q, v, preferred_element_type=dtype)
    return w, u
