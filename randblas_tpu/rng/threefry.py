"""Threefry counter-based RNGs (Threefry4x32, Threefry2x32) in pure JAX.

Independent implementation of the Threefry algorithm (Salmon et al., SC'11),
validated against the upstream Random123 known-answer vectors used by the
reference (test/test_basic_rng/r123_kat_vectors.txt).
"""

from __future__ import annotations

import jax.numpy as jnp

from .bits import rotl32

_PARITY32 = 0x1BD11BDA

# Rotation schedules (public algorithm constants from the Threefish/Threefry
# specification).
_R_2x32 = (13, 15, 26, 6, 17, 29, 16, 24)
_R_4x32 = ((10, 26), (11, 21), (13, 27), (23, 5),
           (6, 20), (17, 11), (25, 10), (18, 20))


def threefry2x32(ctr, key, rounds: int = 20):
    """Threefry-2x32. ctr: uint32[..., 2], key: uint32[..., 2]."""
    ctr = jnp.asarray(ctr, dtype=jnp.uint32)
    key = jnp.asarray(key, dtype=jnp.uint32)
    ks = [key[..., 0], key[..., 1]]
    ks.append(jnp.uint32(_PARITY32) ^ ks[0] ^ ks[1])
    x0 = ctr[..., 0] + ks[0]
    x1 = ctr[..., 1] + ks[1]
    for r in range(rounds):
        x0 = x0 + x1
        x1 = rotl32(x1, _R_2x32[r % 8])
        x1 = x1 ^ x0
        if (r + 1) % 4 == 0:
            s = (r + 1) // 4
            x0 = x0 + ks[s % 3]
            x1 = x1 + ks[(s + 1) % 3] + jnp.uint32(s)
    return jnp.stack([x0, x1], axis=-1)


def threefry4x32_words(x0, x1, x2, x3, k0, k1, k2, k3, rounds: int = 20):
    """Threefry-4x32 on separate u32 word arrays (shared by the jitted
    JAX path and Pallas kernels, which cannot stack lanes)."""
    ks = [k0, k1, k2, k3,
          jnp.uint32(_PARITY32) ^ k0 ^ k1 ^ k2 ^ k3]
    x = [x0 + k0, x1 + k1, x2 + k2, x3 + k3]
    for r in range(rounds):
        r0, r2 = _R_4x32[r % 8]
        if r % 2 == 0:
            x[0] = x[0] + x[1]
            x[1] = rotl32(x[1], r0) ^ x[0]
            x[2] = x[2] + x[3]
            x[3] = rotl32(x[3], r2) ^ x[2]
        else:
            x[0] = x[0] + x[3]
            x[3] = rotl32(x[3], r0) ^ x[0]
            x[2] = x[2] + x[1]
            x[1] = rotl32(x[1], r2) ^ x[2]
        if (r + 1) % 4 == 0:
            s = (r + 1) // 4
            for i in range(4):
                x[i] = x[i] + ks[(s + i) % 5]
            x[3] = x[3] + jnp.uint32(s)
    return x[0], x[1], x[2], x[3]


def threefry4x32(ctr, key, rounds: int = 20):
    """Threefry-4x32. ctr: uint32[..., 4], key: uint32[..., 4]."""
    ctr = jnp.asarray(ctr, dtype=jnp.uint32)
    key = jnp.asarray(key, dtype=jnp.uint32)
    ks = [key[..., i] for i in range(4)]
    k4 = jnp.uint32(_PARITY32) ^ ks[0] ^ ks[1] ^ ks[2] ^ ks[3]
    ks.append(k4)
    x = [ctr[..., i] + ks[i] for i in range(4)]
    for r in range(rounds):
        r0, r2 = _R_4x32[r % 8]
        if r % 2 == 0:
            x[0] = x[0] + x[1]
            x[1] = rotl32(x[1], r0) ^ x[0]
            x[2] = x[2] + x[3]
            x[3] = rotl32(x[3], r2) ^ x[2]
        else:
            x[0] = x[0] + x[3]
            x[3] = rotl32(x[3], r0) ^ x[0]
            x[2] = x[2] + x[1]
            x[1] = rotl32(x[1], r2) ^ x[2]
        if (r + 1) % 4 == 0:
            s = (r + 1) // 4
            for i in range(4):
                x[i] = x[i] + ks[(s + i) % 5]
            x[3] = x[3] + jnp.uint32(s)
    return jnp.stack(x, axis=-1)
