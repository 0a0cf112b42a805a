"""Stochastic trace estimation: Girard–Hutchinson and Hutch++.

Library-tier consumers of the sketching core, in the spirit of the
reference's examples tier (RandBLAS ships the sketching primitives;
trace estimation is the canonical downstream use, cf. the sampling
utilities in /root/reference/RandBLAS/util.hh:173-334). Probe vectors
are Rademacher signs derived from the framework's counter-addressed
Uniform streams, so estimates are reproducible and seed-chainable like
every other operator.

All estimators accept either a dense jnp array, a sparse container
(COO/CSR/CSC), or a callable ``matvec(X) -> A @ X`` acting on (n, k)
blocks — the matrix itself never has to exist.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax
import jax.numpy as jnp

from ..base import require
from ..dense import DenseDist, DenseDistName, DenseSkOp
from ..rng.state import RNGState
from .qb import _apply, _is_sparse


def _as_matvec(a, n: int):
    """Normalize A to a block matvec X -> A @ X on (n, k) blocks."""
    if callable(a) and not hasattr(a, "shape"):
        return a
    require(a.shape == (n, n), "trace estimation needs a square A")
    return lambda x: _apply(a, x)


def rademacher_probes(n: int, k: int, state: RNGState,
                      dtype=jnp.float32) -> Tuple[jax.Array, RNGState]:
    """(n, k) block of i.i.d. +-1 probes from the Uniform stream.

    Signs of counter-addressed uneg11 draws: the probe block is a pure
    function of (state, n, k), so any estimator built on it inherits
    the library's reproducibility contract.
    """
    S = DenseSkOp(DenseDist(n, k, family=DenseDistName.Uniform), state,
                  dtype=dtype)
    u = S.materialize()
    return jnp.where(u >= 0, jnp.ones((), dtype), -jnp.ones((), dtype)), \
        S.next_state


def hutchinson(a, n: int, num_probes: int, state: RNGState,
               dtype=jnp.float32) -> Tuple[jax.Array, RNGState]:
    """Girard–Hutchinson estimate of tr(A): mean_j v_j^T A v_j over
    Rademacher probes. Returns (estimate, next_state).

    Variance ~ 2 * ||A_offdiag||_F^2 / num_probes; use :func:`hutchpp`
    when A has decaying spectrum.
    """
    require(num_probes >= 1, "need at least one probe")
    mv = _as_matvec(a, n)
    v, nxt = rademacher_probes(n, num_probes, state, dtype)
    est = jnp.sum(v * mv(v)) / num_probes
    return est, nxt


def hutchpp(a, n: int, num_matvecs: int, state: RNGState,
            dtype=jnp.float32) -> Tuple[jax.Array, RNGState]:
    """Hutch++ (Meyer–Musco–Musco–Woodruff 2021) trace estimate with a
    total budget of ``num_matvecs`` A-applications, split 1/3 sketch,
    1/3 range projection, 1/3 residual Hutchinson.

    tr(A) = tr(Q^T A Q) + E[v^T (I-QQ^T) A (I-QQ^T) v], Q = orth(A S).
    Error decays like 1/num_matvecs for PSD A (vs 1/sqrt for plain
    Hutchinson). Returns (estimate, next_state).
    """
    require(num_matvecs >= 3, "hutchpp needs a budget of >= 3 matvecs")
    k = num_matvecs // 3
    mv = _as_matvec(a, n)

    s, st1 = rademacher_probes(n, k, state, dtype)
    q, _ = jnp.linalg.qr(mv(s))                    # (n, k) orthonormal
    t_low = jnp.trace(q.T @ mv(q))

    g, nxt = rademacher_probes(n, k, st1, dtype)
    g = g - q @ (q.T @ g)                          # project out range(Q)
    ag = mv(g)                                     # one application, reused
    t_resid = jnp.sum(g * (ag - q @ (q.T @ ag))) / k
    return t_low + t_resid, nxt


def exact_trace(a) -> jax.Array:
    """tr(A) for dense or sparse containers (test/debug helper)."""
    if _is_sparse(a):
        from ..sparse_data.conversions import to_coo
        coo = to_coo(a)
        on_diag = coo.rows == coo.cols
        return jnp.sum(jnp.where(on_diag, coo.vals,
                                 jnp.zeros((), coo.vals.dtype)))
    return jnp.trace(a)
