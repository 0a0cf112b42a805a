"""beta-accumulation with the reference's safe_scal semantics.

util.hh:52-59: beta == 0 must OVERWRITE the output, never multiply it —
0 * NaN/Inf would otherwise poison the result. The check happens on the
static python value when available (the overwhelmingly common case); a
traced beta zeroes `out` under a jnp.where BEFORE the multiply, so
beta == 0 cannot propagate non-finite values from out.
"""

from __future__ import annotations

import jax.numpy as jnp


def accumulate(prod, beta, out):
    """prod + beta * out, except beta == 0 returns prod exactly
    (safe_scal semantics), including for traced beta."""
    if out is None:
        return prod
    dtype = prod.dtype
    if isinstance(beta, (int, float)) and beta == 0:
        return prod
    beta = jnp.asarray(beta, dtype)
    out = jnp.asarray(out, dtype)
    # finiteness-safe select: when beta == 0, the multiplicand is zeroed
    # first so NaN/Inf in out never reaches the product.
    safe_out = jnp.where(beta == 0, jnp.zeros_like(out), out)
    return prod + beta * safe_out
