"""TensorSketch: exact equivalence with the combined CountSketch
construction, unbiasedness of sketched inner products, polynomial kernel
features, state chaining."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from randblas_tpu.rng.state import RNGState
from randblas_tpu.tensor import _countsketch
from randblas_tpu.tensor import (polynomial_kernel_features, tensor_sketch,
                                 tensor_sketch_explicit,
                                 tensor_sketch_vectors)


def _hash_sign(d, m, state):
    """Recover the (hash, sign) pair of the CountSketch component the
    module constructs for a (d, m) factor, via its dense form."""
    mat = np.asarray(_countsketch(d, m, state).materialize())
    h = np.abs(mat).argmax(axis=0)
    s = mat[h, np.arange(m)]
    assert np.all(np.abs(s) == 1.0)
    return h, s


@pytest.mark.slow
def test_matches_combined_countsketch_exactly():
    # FFT identity: TS(A1 (kr) A2) == CountSketch with hash (h1+h2) % d
    # and sign s1*s2 applied to the explicit Khatri-Rao product.
    d, m1, m2, n = 8, 7, 5, 3
    rng = np.random.default_rng(0)
    a1 = jnp.asarray(rng.standard_normal((m1, n)), jnp.float32)
    a2 = jnp.asarray(rng.standard_normal((m2, n)), jnp.float32)
    st = RNGState.from_key(3)
    out, nxt = tensor_sketch([a1, a2], d, st)

    h1, s1 = _hash_sign(d, m1, st)
    C1 = _countsketch(d, m1, st)
    h2, s2 = _hash_sign(d, m2, C1.next_state)
    oracle = np.zeros((d, n))
    for i1 in range(m1):
        for i2 in range(m2):
            r = (h1[i1] + h2[i2]) % d
            oracle[r] += (s1[i1] * s2[i2]
                          * np.asarray(a1)[i1] * np.asarray(a2)[i2])
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-5)
    assert nxt.to_dict() == _countsketch(d, m2, C1.next_state).next_state.to_dict()


def test_matches_combined_countsketch_d_below_m():
    # d <= m exercises the MajorAxis.Short branch of _countsketch (the
    # large-factor case the branch exists for — ADVICE r3); verify both
    # the one-nonzero-per-column CountSketch structure and exact oracle
    # equivalence against the combined hash/sign construction.
    d, m1, m2, n = 8, 16, 12, 3
    rng = np.random.default_rng(6)
    a1 = jnp.asarray(rng.standard_normal((m1, n)), jnp.float32)
    a2 = jnp.asarray(rng.standard_normal((m2, n)), jnp.float32)
    st = RNGState.from_key(17)
    for m in (m1, m2):
        mat = np.asarray(_countsketch(d, m, st).materialize())
        assert np.all(np.sum(mat != 0, axis=0) == 1)
        assert set(np.unique(mat[mat != 0])) <= {-1.0, 1.0}
    out, _ = tensor_sketch([a1, a2], d, st)

    h1, s1 = _hash_sign(d, m1, st)
    C1 = _countsketch(d, m1, st)
    h2, s2 = _hash_sign(d, m2, C1.next_state)
    oracle = np.zeros((d, n))
    for i1 in range(m1):
        for i2 in range(m2):
            r = (h1[i1] + h2[i2]) % d
            oracle[r] += (s1[i1] * s2[i2]
                          * np.asarray(a1)[i1] * np.asarray(a2)[i2])
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-4)


def test_odd_d_and_three_factors():
    d, m, n = 13, 6, 2
    rng = np.random.default_rng(1)
    facs = [jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
            for _ in range(3)]
    st = RNGState.from_key(5)
    out, _ = tensor_sketch(facs, d, st)
    hs = []
    cur = st
    for _ in range(3):
        hs.append(_hash_sign(d, m, cur))
        cur = _countsketch(d, m, cur).next_state
    oracle = np.zeros((d, n))
    f_np = [np.asarray(f) for f in facs]
    for i1 in range(m):
        for i2 in range(m):
            for i3 in range(m):
                r = (hs[0][0][i1] + hs[1][0][i2] + hs[2][0][i3]) % d
                oracle[r] += (hs[0][1][i1] * hs[1][1][i2] * hs[2][1][i3]
                              * f_np[0][i1] * f_np[1][i2] * f_np[2][i3])
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-4)


def test_single_factor_is_countsketch():
    d, m, n = 16, 10, 4
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    st = RNGState.from_key(7)
    out, nxt = tensor_sketch([a], d, st)
    C = _countsketch(d, m, st)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(C.materialize() @ a), atol=1e-5)
    assert nxt.to_dict() == C.next_state.to_dict()


@pytest.mark.slow
def test_inner_product_unbiased():
    # E[<TS(x), TS(y)>] = <x (x) x', y (x) y'> over sketch draws
    m1, m2, d = 8, 6, 64
    rng = np.random.default_rng(3)
    x1, x2 = rng.standard_normal(m1), rng.standard_normal(m2)
    y1, y2 = rng.standard_normal(m1), rng.standard_normal(m2)
    exact = float(np.dot(np.kron(x1, x2), np.kron(y1, y2)))
    st = RNGState.from_key(11)
    vals = []
    for _ in range(200):
        tx, st2 = tensor_sketch_vectors(
            [jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)],
            d, st)
        ty, _ = tensor_sketch_vectors(
            [jnp.asarray(y1, jnp.float32), jnp.asarray(y2, jnp.float32)],
            d, st)
        vals.append(float(jnp.dot(tx, ty)))
        st = st2.incr_key(1)
    mean = np.mean(vals)
    sem = np.std(vals) / np.sqrt(len(vals))
    assert abs(mean - exact) < 4 * sem + 0.05 * abs(exact) + 1e-3


@pytest.mark.slow
def test_polynomial_kernel_features():
    m, n, d, p = 10, 6, 256, 2
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    exact = np.asarray(x).T @ np.asarray(x)                    # <xi, xj>
    exact = exact ** p
    st = RNGState.from_key(13)
    acc = np.zeros((n, n))
    reps = 60
    for _ in range(reps):
        z, st2 = polynomial_kernel_features(x, p, d, st)
        z_np = np.asarray(z)
        acc += z_np.T @ z_np
        st = st2.incr_key(1)
    approx = acc / reps
    scale = np.abs(exact).max()
    assert np.max(np.abs(approx - exact)) < 0.15 * scale


def test_jit_and_validation():
    import pytest
    rng = np.random.default_rng(5)
    a1 = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
    a2 = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    fn = jax.jit(lambda x, y, s: tensor_sketch([x, y], 8, s)[0])
    eager, _ = tensor_sketch([a1, a2], 8, RNGState.from_key(1))
    np.testing.assert_allclose(np.asarray(fn(a1, a2, RNGState.from_key(1))),
                               np.asarray(eager), atol=1e-5)
    with pytest.raises(ValueError):
        tensor_sketch([], 8, RNGState.from_key(0))
    with pytest.raises(ValueError):
        tensor_sketch([a1, a2[:, :2]], 8, RNGState.from_key(0))


class TestExplicitApply:
    """tensor_sketch_explicit must apply the SAME operator as
    tensor_sketch: one combined-hash segment-sum over explicit rows."""

    def _kr(self, mats):
        out = mats[0]
        for m in mats[1:]:
            out = np.einsum("ik,jk->ijk", out, m).reshape(-1, out.shape[1])
        return out

    def test_matches_structured_apply(self):
        d, dims, n = 64, (9, 7), 4
        rng = np.random.default_rng(20)
        mats = [jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
                for m in dims]
        st = RNGState.from_key(21)
        want, nxt_s = tensor_sketch(mats, d, st)
        big = jnp.asarray(self._kr([np.asarray(m) for m in mats]))
        got, nxt_e = tensor_sketch_explicit(big, dims, d, st)
        # FFT convolution vs direct segment-sum of the same operator
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        assert nxt_s.to_dict() == nxt_e.to_dict()

    def test_three_modes_odd_d(self):
        d, dims, n = 13, (4, 3, 5), 2
        rng = np.random.default_rng(22)
        mats = [jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
                for m in dims]
        st = RNGState.from_key(23)
        want, _ = tensor_sketch(mats, d, st)
        big = jnp.asarray(self._kr([np.asarray(m) for m in mats]))
        got, _ = tensor_sketch_explicit(big, dims, d, st)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_single_mode_is_exact_countsketch(self):
        d, m, n = 16, 40, 3
        rng = np.random.default_rng(24)
        x = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
        st = RNGState.from_key(25)
        got, _ = tensor_sketch_explicit(x, (m,), d, st)
        want = np.asarray(_countsketch(d, m, st).materialize()) @ \
            np.asarray(x)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                                   atol=1e-6)

    def test_jit(self):
        d, dims = 32, (6, 5)
        rng = np.random.default_rng(26)
        x = jnp.asarray(rng.standard_normal((30, 4)).astype(np.float32))
        st = RNGState.from_key(27)
        eager, _ = tensor_sketch_explicit(x, dims, d, st)
        fn = jax.jit(lambda xx, ss: tensor_sketch_explicit(
            xx, dims, d, ss)[0])
        np.testing.assert_allclose(np.asarray(fn(x, st)),
                                   np.asarray(eager), rtol=1e-5,
                                   atol=1e-5)

    def test_validates(self):
        st = RNGState.from_key(0)
        with pytest.raises(ValueError):
            tensor_sketch_explicit(jnp.zeros((10, 2)), (3, 4), 8, st)
        with pytest.raises(ValueError):
            tensor_sketch_explicit(jnp.zeros((12, 2)), (), 8, st)


class TestKFJLT:
    """Kronecker FJLT (kfjlt_sketch / kfjlt_sketch_explicit): the
    low-variance sibling of TensorSketch — oracle against the
    materialized sampled-Kronecker operator, structured == explicit,
    stream contracts, embedding quality."""

    def _kr(self, mats):
        out = mats[0]
        for m in mats[1:]:
            out = np.einsum("ik,jk->ijk", out, m).reshape(-1, out.shape[1])
        return out

    def _materialize(self, mode_dims, d, state):
        """Dense (d, prod m_pad-restricted-to-m) oracle built from the
        SAME streams: per mode H D rows at the sampled indices,
        kron-multiplied, scaled."""
        from randblas_tpu.ops.hadamard import hadamard_matrix, next_pow2
        from randblas_tpu.tensor import _kfjlt_sample, kfjlt_scale
        import jax.numpy as jnp
        parts, _ = _kfjlt_sample(mode_dims, d, state, jnp.float32)
        rows = None
        for m, (sgn, m_pad, idx) in zip(mode_dims, parts):
            h = np.asarray(hadamard_matrix(m_pad))
            blk = h[np.asarray(idx), :m] * np.asarray(sgn)[None, :]
            rows = blk if rows is None else \
                (rows[:, :, None] * blk[:, None, :]).reshape(d, -1)
        return kfjlt_scale(mode_dims, d) * rows

    def test_matches_materialized_two_modes(self):
        from randblas_tpu.tensor import kfjlt_sketch
        d, dims, n = 32, (12, 10), 4          # non-pow2: padding path
        rng = np.random.default_rng(30)
        mats = [jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
                for m in dims]
        st = RNGState.from_key(31)
        got, _ = kfjlt_sketch(mats, d, st)
        want = self._materialize(dims, d, st) @ self._kr(
            [np.asarray(m) for m in mats])
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-5)

    def test_explicit_matches_structured_three_modes(self):
        from randblas_tpu.tensor import kfjlt_sketch, kfjlt_sketch_explicit
        d, dims, n = 16, (5, 8, 3), 2
        rng = np.random.default_rng(32)
        mats = [jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
                for m in dims]
        st = RNGState.from_key(33)
        want, nxt_s = kfjlt_sketch(mats, d, st)
        big = jnp.asarray(self._kr([np.asarray(m) for m in mats]))
        got, nxt_e = kfjlt_sketch_explicit(big, dims, d, st)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)
        assert nxt_s.to_dict() == nxt_e.to_dict()

    def test_next_state_counter_arithmetic(self):
        from randblas_tpu.tensor import _kfjlt_sample
        st = RNGState.from_key(7)
        dims, d = (10, 20), 32
        _, nxt = _kfjlt_sample(dims, d, st, jnp.float32)
        len_c = st.len_c
        blocks = sum((-(-m // len_c)) + (-(-d // len_c)) for m in dims)
        np.testing.assert_array_equal(np.asarray(nxt.counter),
                                      np.asarray(st.incr(blocks).counter))

    def test_isometry_in_expectation(self):
        """E |S x|^2 = |x|^2 over draws; KFJLT's constant has no 3^p
        blowup, so 48 draws at d = 64 concentrate tightly."""
        from randblas_tpu.tensor import kfjlt_sketch
        dims, n = (16, 12), 1
        rng = np.random.default_rng(34)
        mats = [jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
                for m in dims]
        target = float((self._kr([np.asarray(m) for m in mats]) ** 2).sum())
        vals = []
        for seed in range(48):
            sx, _ = kfjlt_sketch(mats, 64, RNGState.from_key(seed))
            vals.append(float((np.asarray(sx) ** 2).sum()))
        assert abs(np.mean(vals) - target) / target < 0.2

    def test_jit(self):
        from randblas_tpu.tensor import kfjlt_sketch
        dims, d, n = (8, 8), 16, 3
        rng = np.random.default_rng(35)
        mats = [jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
                for m in dims]
        st = RNGState.from_key(36)
        eager, _ = kfjlt_sketch(mats, d, st)
        fn = jax.jit(lambda ms, ss: kfjlt_sketch(ms, d, ss)[0])
        np.testing.assert_allclose(np.asarray(fn(mats, st)),
                                   np.asarray(eager), rtol=1e-5, atol=1e-5)

    def test_validates(self):
        from randblas_tpu.tensor import kfjlt_sketch, kfjlt_sketch_explicit
        st = RNGState.from_key(0)
        with pytest.raises(ValueError):
            kfjlt_sketch([], 8, st)
        with pytest.raises(ValueError):
            kfjlt_sketch_explicit(jnp.zeros((10, 2)), (3, 4), 8, st)

    @pytest.mark.slow
    def test_subspace_distortion(self):
        """Singular values of S U near 1 for a random orthonormal U of
        the product domain — the KFJLT analog of the SRHT/dense/SASO
        distortion tests (test_distortion.cc:49-116); scale is built
        in, so no external isometry factor."""
        from randblas_tpu.tensor import kfjlt_sketch_explicit
        dims, n, d = (64, 32), 8, 512
        rng = np.random.default_rng(40)
        u, _ = np.linalg.qr(rng.normal(size=(dims[0] * dims[1], n)))
        su, _ = kfjlt_sketch_explicit(
            jnp.asarray(u, jnp.float32), dims, d, RNGState.from_key(41))
        sv = np.linalg.svd(np.asarray(su), compute_uv=False)
        assert sv.max() < 1.5 and sv.min() > 0.5, sv
