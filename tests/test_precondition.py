"""Sketch-and-precondition property: QR of a SASO sketch of A gives a
right preconditioner with cond(A R^-1) = O(1), independent of cond(A)
(the subspace-embedding guarantee driving
examples/sketch_precondition_lsq.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from randblas_tpu import RNGState, SparseDist, SparseSkOp, sketch


@pytest.mark.parametrize("cond_target", [1e4, 1e6])
# (cond 1e8 requires sketching in f64 — the example enables x64 for
# exactly this reason; in f32 the small singular directions sit below
# eps and the R factor cannot see them)
@pytest.mark.slow
def test_saso_qr_preconditioner_conditioning(cond_target):
    m, n, d = 4000, 64, 256
    rng = np.random.default_rng(int(np.log10(cond_target)))
    u, _ = np.linalg.qr(rng.normal(size=(m, n)))
    v, _ = np.linalg.qr(rng.normal(size=(n, n)))
    sv = np.logspace(0, -np.log10(cond_target), n)
    A64 = (u * sv) @ v.T

    S = SparseSkOp(SparseDist(d, m, vec_nnz=8), RNGState.from_key(3))
    SA = np.asarray(sketch(S, jnp.asarray(A64, jnp.float32)),
                    dtype=np.float64)
    R = np.linalg.qr(SA, mode="r")
    M = np.linalg.solve(R.T, A64.T).T        # A R^-1 without explicit inverse
    s = np.linalg.svd(M, compute_uv=False)
    # d/n = 4 oversampling: distortion well under 2 with high probability
    assert s[0] / s[-1] < 4.0, (cond_target, s[0] / s[-1])
