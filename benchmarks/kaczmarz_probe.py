"""Probe: where do block_kaczmarz / block_gauss_seidel spend time on
the chip, and does batching the Gram factorizations out of the scan
(possible because all sampling happens upfront) fix it?

Variants measured in ONE run (tunnel drifts +-5% between runs):
  chol-in-scan   — current library form: cho_factor+cho_solve per step
  chol-batched   — vmap cho_factor over all steps upfront; scan does
                   only cho_solve (two triangular solves) per step
  inv-batched    — vmap (cho_factor + cho_solve vs I) upfront; scan
                   step is one (s, s) GEMV
  no-solve       — Gram + rhs computed, solve replaced by a diagonal
                   scale: isolates the solve's cost from panel traffic
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from randblas_tpu.bench_util import time_loop

_HI = jax.lax.Precision.HIGHEST


def probe_chol_latency():
    """48 sequential (512, 512) cho_factor+cho_solve in a scan vs one
    batched factor + sequential solves vs batched inverse + GEMVs."""
    s, steps = 512, 48
    rng = np.random.default_rng(0)
    g0 = rng.standard_normal((steps, s, 2 * s)).astype(np.float32)
    grams = jnp.asarray(np.einsum("bij,bkj->bik", g0, g0)
                        + 1e-3 * np.eye(s, dtype=np.float32))
    rhs = jnp.asarray(rng.standard_normal(s).astype(np.float32))

    def seq(i, carry, g_all, r0):
        def step(r, g):
            cf = jax.scipy.linalg.cho_factor(g, lower=True)
            y = jax.scipy.linalg.cho_solve(cf, r)
            return r + y * 1e-20, None
        r, _ = jax.lax.scan(step, r0 + carry * 0.0, g_all)
        return carry + r[0] * 1e-20 + jnp.float32(i) * 0.0

    def batched_factor(i, carry, g_all, r0):
        cfs = jax.vmap(lambda g: jax.scipy.linalg.cho_factor(
            g, lower=True)[0])(g_all + carry * 0.0)
        def step(r, c):
            y = jax.scipy.linalg.cho_solve((c, True), r)
            return r + y * 1e-20, None
        r, _ = jax.lax.scan(step, r0, cfs)
        return carry + r[0] * 1e-20 + jnp.float32(i) * 0.0

    def batched_inv(i, carry, g_all, r0):
        eye = jnp.eye(s, dtype=g_all.dtype)
        invs = jax.vmap(lambda g: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(g + carry * 0.0, lower=True),
            eye))(g_all)
        def step(r, gi):
            y = jnp.matmul(gi, r, precision=_HI)
            return r + y * 1e-20, None
        r, _ = jax.lax.scan(step, r0, invs)
        return carry + r[0] * 1e-20 + jnp.float32(i) * 0.0

    for name, fn in [("chol-in-scan", seq),
                     ("chol-batched", batched_factor),
                     ("inv-batched", batched_inv)]:
        t = time_loop(fn, grams, rhs, iters_small=1, iters_large=5,
                      repeats=2)
        print(f"  48x(512,512) solve chain [{name}]: {t*1e3:.2f} ms")


def probe_gs_variants():
    """Full Gauss-Seidel shuffle solve: current vs precomputed
    per-block inverses (nblocks Grams computed ONCE, reused every
    sweep) vs no-solve floor."""
    m, n, block, steps = 65536, 1024, 512, 48
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    xt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = a @ xt
    nblocks = n // block

    def current(i, carry, a_op, b_op):
        from randblas_tpu.linalg import block_gauss_seidel
        from randblas_tpu.rng.state import RNGState
        x, _ = block_gauss_seidel(a_op, b_op + carry * 0.0,
                                  RNGState.from_key(5), block=block,
                                  steps=steps)
        return carry + x[0] * 1e-20 + jnp.float32(i) * 0.0

    def precomputed(i, carry, a_op, b_op):
        at = (a_op + carry * 0.0).T                      # (n, m)
        panels = at.reshape(nblocks, block, m)
        grams = jnp.einsum("bij,bkj->bik", panels, panels,
                           preferred_element_type=a_op.dtype)
        lam = (jnp.finfo(a_op.dtype).eps * 8.0 / block
               * jnp.einsum("bii->b", grams))
        grams = grams + lam[:, None, None] * jnp.eye(block, dtype=a_op.dtype)
        eye = jnp.eye(block, dtype=a_op.dtype)
        invs = jax.vmap(lambda g: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(g, lower=True), eye))(grams)
        x0 = jnp.zeros((n,), a_op.dtype)
        r0 = b_op.astype(a_op.dtype)
        order = jnp.arange(steps, dtype=jnp.int32) % nblocks

        def step(carry2, bi):
            x, r = carry2
            panel = panels[bi]
            rhs = jnp.matmul(panel, r, precision=_HI)
            dx = jnp.matmul(invs[bi], rhs, precision=_HI)
            x = jax.lax.dynamic_update_slice(
                x, jax.lax.dynamic_slice(x, (bi * block,), (block,))
                + dx, (bi * block,))
            r = r - jnp.matmul(panel.T, dx, precision=_HI)
            return (x, r), None

        (x, _), _ = jax.lax.scan(step, (x0, r0), order)
        return carry + x[0] * 1e-20 + jnp.float32(i) * 0.0

    def no_solve(i, carry, a_op, b_op):
        at = (a_op + carry * 0.0).T
        panels = at.reshape(nblocks, block, m)
        x0 = jnp.zeros((n,), a_op.dtype)
        r0 = b_op.astype(a_op.dtype)
        order = jnp.arange(steps, dtype=jnp.int32) % nblocks

        def step(carry2, bi):
            x, r = carry2
            panel = panels[bi]
            g = jnp.matmul(panel, panel.T,
                           preferred_element_type=a_op.dtype)
            rhs = jnp.matmul(panel, r, precision=_HI)
            dx = rhs / (jnp.diagonal(g) + 1.0)
            x = jax.lax.dynamic_update_slice(
                x, jax.lax.dynamic_slice(x, (bi * block,), (block,))
                + dx, (bi * block,))
            r = r - jnp.matmul(panel.T, dx, precision=_HI)
            return (x, r), None

        (x, _), _ = jax.lax.scan(step, (x0, r0), order)
        return carry + x[0] * 1e-20 + jnp.float32(i) * 0.0

    for name, fn in [("current", current), ("precomputed", precomputed),
                     ("no-solve floor", no_solve)]:
        t = time_loop(fn, a, b, iters_small=1, iters_large=3, repeats=2)
        print(f"  gs-shuffle 65536x1024 b512 s48 [{name}]: "
              f"{t*1e3:.1f} ms")

    # accuracy spot-check of the precomputed variant
    at = a.T
    panels = at.reshape(nblocks, block, m)
    grams = jnp.einsum("bij,bkj->bik", panels, panels,
                       preferred_element_type=a.dtype)
    lam = (jnp.finfo(a.dtype).eps * 8.0 / block
           * jnp.einsum("bii->b", grams))
    grams = grams + lam[:, None, None] * jnp.eye(block, dtype=a.dtype)
    eye = jnp.eye(block, dtype=a.dtype)
    invs = jax.vmap(lambda g: jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(g, lower=True), eye))(grams)
    x = jnp.zeros((n,), a.dtype)
    r = b
    for t_i in range(steps):
        bi = t_i % nblocks
        panel = panels[bi]
        rhs = jnp.matmul(panel, r, precision=_HI)
        dx = jnp.matmul(invs[bi], rhs, precision=_HI)
        x = x.at[bi * block:(bi + 1) * block].add(dx)
        r = r - jnp.matmul(panel.T, dx, precision=_HI)
    err = float(jnp.linalg.norm(x - xt) / jnp.linalg.norm(xt))
    print(f"  precomputed-inv rel err: {err:.2e}")


def probe_kaczmarz_variants():
    m, n, block, steps = 65536, 1024, 512, 48
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    xt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = a @ xt

    def current(i, carry, a_op, b_op):
        from randblas_tpu.linalg import block_kaczmarz
        from randblas_tpu.rng.state import RNGState
        x, _ = block_kaczmarz(a_op, b_op + carry * 0.0,
                              RNGState.from_key(7), block=block,
                              steps=steps)
        return carry + x[0] * 1e-20 + jnp.float32(i) * 0.0

    def batched(i, carry, a_op, b_op):
        from randblas_tpu.linalg.kaczmarz import _sample_blocks
        from randblas_tpu.rng.state import RNGState
        w = jnp.einsum("ij,ij->i", a_op, a_op, precision=_HI)
        idx, _ = _sample_blocks(w, m, steps, block, RNGState.from_key(7))
        rows_all = (a_op + carry * 0.0)[idx.reshape(-1)].reshape(
            steps, block, n)
        grams = jnp.einsum("bij,bkj->bik", rows_all, rows_all,
                           precision=_HI)
        lam = (jnp.finfo(a_op.dtype).eps * 8.0 / block
               * jnp.einsum("bii->b", grams))
        grams = grams + lam[:, None, None] * jnp.eye(block, dtype=a_op.dtype)
        eye = jnp.eye(block, dtype=a_op.dtype)
        invs = jax.vmap(lambda g: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(g, lower=True), eye))(grams)
        bs = b_op[idx]                                   # (steps, block)
        x0 = jnp.zeros((n,), a_op.dtype)

        def step(x, inp):
            rows, gi, bt = inp
            rr = bt - jnp.matmul(rows, x, precision=_HI)
            y = jnp.matmul(gi, rr, precision=_HI)
            return x + jnp.matmul(rows.T, y, precision=_HI), None

        x, _ = jax.lax.scan(step, x0, (rows_all, invs, bs))
        return carry + x[0] * 1e-20 + jnp.float32(i) * 0.0

    for name, fn in [("current", current), ("batched-inv", batched)]:
        t = time_loop(fn, a, b, iters_small=1, iters_large=3, repeats=2)
        print(f"  kaczmarz 65536x1024 b512 s48 [{name}]: {t*1e3:.1f} ms")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    print("chol latency chain:")
    probe_chol_latency()
    print("gauss-seidel shuffle variants:")
    probe_gs_variants()
    print("kaczmarz variants:")
    probe_kaczmarz_variants()
