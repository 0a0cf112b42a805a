"""Randomized ST-HOSVD (linalg/tucker.py): exact multilinear-rank
recovery, quasi-optimality vs the deterministic ST-HOSVD oracle,
stream contracts, jit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from randblas_tpu import RNGState
from randblas_tpu.linalg import tucker_from_dense, tucker_full


def st_hosvd_oracle(x, ranks):
    """Deterministic ST-HOSVD in f64 numpy."""
    x = np.asarray(x, np.float64)
    p = x.ndim
    ranks = (ranks,) * p if isinstance(ranks, int) else tuple(ranks)
    cur = x.copy()
    fac = []
    for k in range(p):
        mat = np.moveaxis(cur, k, 0).reshape(cur.shape[k], -1)
        u = np.linalg.svd(mat, full_matrices=False)[0]
        r = min(ranks[k], u.shape[1])
        uk = u[:, :r]
        fac.append(uk)
        cur = np.moveaxis((uk.T @ mat).reshape(
            (r,) + cur.shape[:k] + cur.shape[k + 1:]), 0, k)
    rec = cur
    for k, u in enumerate(fac):
        rec = np.moveaxis(np.tensordot(u, rec, axes=(1, k)), 0, k)
    return rec


def decaying_tensor(rng, shape, terms=10, decay=0.5):
    x = np.zeros(shape, np.float64)
    for t in range(terms):
        vs = [rng.standard_normal(n) for n in shape]
        x += (decay ** t) * np.einsum(
            "i,j,k->ijk" if len(shape) == 3 else "i,j,k,l->ijkl", *vs)
    return x


class TestTucker:
    def test_exact_multilinear_rank_recovery(self):
        rng = np.random.default_rng(0)
        core = rng.standard_normal((3, 4, 2)).astype(np.float32)
        us = [np.linalg.qr(rng.standard_normal((n, r)))[0].astype(
            np.float32) for n, r in zip((10, 12, 9), (3, 4, 2))]
        x = jnp.asarray(np.einsum("abc,ia,jb,kc->ijk", core, *us))
        c, f, _ = tucker_from_dense(x, (3, 4, 2), RNGState.from_key(1))
        rec = tucker_full(c, f)
        rel = float(jnp.linalg.norm(rec - x) / jnp.linalg.norm(x))
        assert rel < 1e-4, rel
        assert c.shape == (3, 4, 2)
        for u in f:     # orthonormal factors
            g = np.asarray(u.T @ u)
            np.testing.assert_allclose(g, np.eye(g.shape[0]), atol=1e-4)

    def test_quasi_optimal_vs_st_hosvd(self):
        rng = np.random.default_rng(2)
        x = decaying_tensor(rng, (12, 13, 14))
        c, f, _ = tucker_from_dense(jnp.asarray(x.astype(np.float32)),
                                    4, RNGState.from_key(2),
                                    power_iters=2)
        got = np.linalg.norm(
            np.asarray(tucker_full(c, f), np.float64) - x)
        base = np.linalg.norm(st_hosvd_oracle(x, 4) - x)
        assert got < 1.5 * base + 1e-6, (got, base)

    def test_rank_clipping(self):
        x = jnp.asarray(np.random.default_rng(3).standard_normal(
            (5, 6, 7)).astype(np.float32))
        c, f, _ = tucker_from_dense(x, 50, RNGState.from_key(3))
        assert c.shape == (5, 6, 7)       # clipped to full: lossless
        rel = float(jnp.linalg.norm(tucker_full(c, f) - x)
                    / jnp.linalg.norm(x))
        assert rel < 1e-4

    def test_next_state_is_f_of_shape_and_ranks(self):
        """The only stream consumers are the per-mode Gaussian
        sketches — replay must be value-independent."""
        rng = np.random.default_rng(4)
        st = RNGState.from_key(9)
        a = jnp.asarray(rng.standard_normal((8, 9, 10)).astype(
            np.float32))
        b = jnp.asarray(rng.standard_normal((8, 9, 10)).astype(
            np.float32))
        _, _, n1 = tucker_from_dense(a, (2, 3, 4), st)
        _, _, n2 = tucker_from_dense(b, (2, 3, 4), st)
        assert n1.to_dict() == n2.to_dict()
        assert n1.to_dict() != st.to_dict()

    def test_jit(self):
        x = jnp.asarray(np.random.default_rng(5).standard_normal(
            (8, 8, 8)).astype(np.float32))
        st = RNGState.from_key(10)
        ce, fe, _ = tucker_from_dense(x, 3, st)
        f = jax.jit(lambda a, s: tucker_from_dense(a, 3, s)[:2])
        cj, fj = f(x, st)
        rec_e, rec_j = tucker_full(ce, fe), tucker_full(cj, fj)
        rel = float(jnp.linalg.norm(rec_j - rec_e)
                    / jnp.linalg.norm(rec_e))
        assert rel < 1e-4, rel

    def test_validates(self):
        st = RNGState.from_key(0)
        x = jnp.zeros((4, 4))
        with pytest.raises(ValueError):
            tucker_from_dense(x, (2, 2, 2), st)    # rank length
        with pytest.raises(ValueError):
            tucker_from_dense(x, 0, st)
        with pytest.raises(ValueError):
            tucker_full(jnp.zeros((2, 2)), [jnp.eye(2)])
