"""Native-f64 stream parity via the x64 CBRNGs (VERDICT r4 item 5).

The reference's fill engine instantiated with a 64-bit-counter CBRNG
produces native double streams (random_gen.hh:121-173 — float width
deduced from the counter word size; dense_skops.hh:97-170). These tests
mirror the reference's dense-operator suite (test_denseskop.cc:
submatrix sweep :171-296, autotranspose :349-403, next_state :442-465,
chaining :409-440) for x64-seeded f64 operators, plus the
numpy-vs-native cross-checks that pin the host implementations against
each other (uniform is exact float arithmetic on both sides; Box-Muller
may differ by 1 ulp where numpy's vectorized sin/cos and libm disagree).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import DenseDist, DenseDistName, DenseSkOp, RNGState
from randblas_tpu import sketch_general
from randblas_tpu.base import MajorAxis
from randblas_tpu.dense import compute_next_state, fill_dense_submat
from randblas_tpu.rng import x64

X64_RNGS = ["philox4x64", "threefry4x64"]
X64_RNGS_ALL = X64_RNGS + ["philox2x64", "threefry2x64"]


# ---------------------------------------------------------------------------
# generators / state plumbing
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", X64_RNGS_ALL)
def test_numpy_matches_native_blocks(name):
    from randblas_tpu import native
    if not native.available():
        pytest.skip("native engine unavailable")
    fn, w, kw, rounds = x64.GENERATORS_X64[name]
    rng = np.random.default_rng(7)
    ctrs = rng.integers(0, 2 ** 64, size=(200, w), dtype=np.uint64)
    key = rng.integers(0, 2 ** 64, size=(kw,), dtype=np.uint64)
    np.testing.assert_array_equal(fn(ctrs, key, rounds),
                                  native.cbrng64(name, ctrs, key, rounds))


def test_kat_replay_numpy():
    """Replay the vendored Random123 x64 vectors through the NUMPY
    implementations (the native engine replay lives in test_rng_kat)."""
    from tests.test_rng_kat import _FILE_VECTORS_64, _hex_words64
    assert len(_FILE_VECTORS_64) >= 30
    for gen, rounds, ctr, key, expected in _FILE_VECTORS_64:
        fn = x64.GENERATORS_X64[gen][0]
        out = fn(_hex_words64(ctr)[None, :], _hex_words64(key), rounds)
        np.testing.assert_array_equal(
            out.reshape(-1), _hex_words64(expected),
            err_msg=f"{gen} rounds={rounds} ctr={ctr}")


@pytest.mark.parametrize("name", X64_RNGS_ALL)
def test_state_limb_incr_matches_word_math(name):
    """RNGState.incr on the uint32 limb storage == Random123 ctr.incr
    over the uint64 words (little-endian carries across words)."""
    st = RNGState.from_key(5, name)
    # drive the low word to the carry boundary, then step across it
    st2 = st.incr(2 ** 32 - 1).incr(2 ** 32 - 1).incr(5)
    words = x64.limbs_to_words(np.asarray(st2.counter))
    total = 2 * (2 ** 32 - 1) + 5
    assert int(words[0]) == total
    assert all(int(w) == 0 for w in words[1:])
    # 64-bit word rollover: counter word 0 at 2^64-1, +2 carries to word 1
    near = x64.words_to_limbs(
        np.array([2 ** 64 - 1] + [0] * (len(words) - 1), np.uint64))
    st3 = RNGState.from_arrays(near, np.asarray(st.key), name).incr(2)
    words3 = x64.limbs_to_words(np.asarray(st3.counter))
    assert int(words3[0]) == 1 and int(words3[1]) == 1


def test_from_key_full_64bit_key_word():
    st = RNGState.from_key(0x123456789ABCDEF0, "philox4x64")
    key_w = x64.limbs_to_words(np.asarray(st.key))
    assert int(key_w[0]) == 0x123456789ABCDEF0 and int(key_w[1]) == 0


def test_x64_state_has_no_traced_generator():
    st = RNGState.from_key(0, "philox4x64")
    assert st.is_x64 and st.block_width == 4 and st.len_c == 8
    with pytest.raises(ValueError, match="host"):
        _ = st.generate


# ---------------------------------------------------------------------------
# fill semantics (mirrors test_denseskop.cc for the f64 streams)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", X64_RNGS)
@pytest.mark.parametrize("family", [DenseDistName.Gaussian,
                                    DenseDistName.Uniform])
@pytest.mark.parametrize("shape", [(8, 30), (30, 8)])  # wide + tall
def test_submat_equals_slice_of_full(name, family, shape):
    d = DenseDist(*shape, family=family)
    st = RNGState.from_key(99, name)
    full = np.asarray(fill_dense_submat(d, st, *shape, 0, 0, jnp.float64))
    for ro, co, nr, nc in [(0, 0, 3, 5), (2, 3, 5, 9), (1, 0, 7, 30 if
                           shape[0] == 8 else 8), (5, 1, 2, 2)]:
        nr = min(nr, shape[0] - ro)
        nc = min(nc, shape[1] - co)
        blk = np.asarray(fill_dense_submat(d, st, nr, nc, ro, co,
                                           jnp.float64))
        np.testing.assert_array_equal(blk, full[ro:ro + nr, co:co + nc])


@pytest.mark.parametrize("name", X64_RNGS)
def test_autotranspose(name):
    """Wide and tall dists with the same seed and complementary major
    axes are exact transposes (test_denseskop.cc:349-403)."""
    st = RNGState.from_key(11, name)
    wide = DenseDist(6, 20, major_axis=MajorAxis.Long)
    tall = DenseDist(20, 6, major_axis=MajorAxis.Long)
    a = np.asarray(fill_dense_submat(wide, st, 6, 20, 0, 0, jnp.float64))
    b = np.asarray(fill_dense_submat(tall, st, 20, 6, 0, 0, jnp.float64))
    np.testing.assert_array_equal(a, b.T)


@pytest.mark.parametrize("name", X64_RNGS)
def test_next_state_and_chaining(name):
    """next_state = f(distribution) by counter arithmetic; seed-chained
    concatenation == one taller operator (test_denseskop.cc:409-465)."""
    st = RNGState.from_key(3, name)
    d1 = DenseDist(4, 25)          # wide, Long -> RowMajor natural
    d2 = DenseDist(5, 25)
    s1 = DenseSkOp(d1, st)
    s2 = DenseSkOp(d2, s1.next_state)
    cat = np.concatenate([np.asarray(s1.materialize()),
                          np.asarray(s2.materialize())], axis=0)
    tall = DenseSkOp(DenseDist(9, 25), st)
    np.testing.assert_array_equal(cat, np.asarray(tall.materialize()))
    # next_state arithmetic matches the x32 formula with w = words
    w = st.block_width
    expect = st.incr((-(-25 // w)) * 9)
    got = compute_next_state(DenseDist(9, 25), st)
    np.testing.assert_array_equal(np.asarray(got.counter),
                                  np.asarray(expect.counter))


@pytest.mark.parametrize("name", X64_RNGS)
@pytest.mark.parametrize("gaussian", [False, True])
def test_fill_matches_native_engine(name, gaussian):
    from randblas_tpu import native
    if not native.available():
        pytest.skip("native engine unavailable")
    st = RNGState.from_key(0xFEEDFACE, name)
    tr = "boxmul" if gaussian else "uneg11"
    a = x64.fill_rowmajor64(37, 15, 21, 3 * 37 + 2, st, tr)
    b = native.fill_rowmajor64(
        37, 15, 21, 3 * 37 + 2,
        x64.limbs_to_words(np.asarray(st.counter)),
        x64.limbs_to_words(np.asarray(st.key)), gaussian, name)
    if gaussian:
        # numpy's vectorized sin/cos may differ from libm by 1 ulp
        np.testing.assert_allclose(a, b, rtol=0, atol=4e-16)
    else:
        np.testing.assert_array_equal(a, b)


def test_f64_values_are_not_f32_representable():
    """The point of the exercise: x64 streams carry full double
    mantissas (an f32-promoted stream would round-trip through f32
    exactly)."""
    d = DenseDist(16, 16)
    vals = np.asarray(fill_dense_submat(d, RNGState.from_key(1,
                      "philox4x64"), 16, 16, 0, 0, jnp.float64))
    assert vals.dtype == np.float64
    roundtrip = vals.astype(np.float32).astype(np.float64)
    assert np.mean(roundtrip != vals) > 0.9


def test_moments_sanity():
    d = DenseDist(64, 256)
    st = RNGState.from_key(42, "philox4x64")
    g = np.asarray(fill_dense_submat(d, st, 64, 256, 0, 0, jnp.float64))
    assert abs(g.mean()) < 0.03 and abs(g.std() - 1.0) < 0.02
    u = np.asarray(fill_dense_submat(DenseDist(
        64, 256, family=DenseDistName.Uniform), st, 64, 256, 0, 0,
        jnp.float64))
    assert abs(u.mean()) < 0.03 and abs(u.std() - 1.0) < 0.02
    assert np.abs(u).max() <= np.sqrt(3.0)


# ---------------------------------------------------------------------------
# operator / sketch surface
# ---------------------------------------------------------------------------

def test_denseskop_dtype_deduction():
    s32 = DenseSkOp(DenseDist(4, 8), RNGState.from_key(0))
    assert s32.dtype == jnp.float32
    s64 = DenseSkOp(DenseDist(4, 8), RNGState.from_key(0, "philox4x64"))
    assert s64.dtype == jnp.float64
    assert np.asarray(s64.materialize()).dtype == np.float64


def test_sketch_general_f64_end_to_end():
    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64 mode")
    S = DenseSkOp(DenseDist(8, 40), RNGState.from_key(21, "philox4x64"))
    A = jnp.asarray(np.random.default_rng(5).normal(size=(40, 6)))
    assert A.dtype == jnp.float64
    got = sketch_general(S, A)
    assert got.dtype == jnp.float64
    want = np.asarray(S.materialize()) @ np.asarray(A)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-13)


def test_x64_fill_under_jit_raises():
    S = DenseSkOp(DenseDist(4, 8), RNGState.from_key(0, "philox4x64"))

    def f(s):
        return s.materialize()

    with pytest.raises(ValueError, match="host"):
        jax.jit(f)(S)


@pytest.mark.parametrize("family,exact", [
    (DenseDistName.Uniform, True), (DenseDistName.Gaussian, False)])
def test_fill_dispatches_native_engine(family, exact):
    """The dense fill path really reaches the OpenMP engine when built
    (advisor r5): 'auto' vs the forced-numpy flag agree exactly for
    Uniform, <= 1 ulp for Box-Muller (vectorized sin/cos)."""
    from randblas_tpu import native
    if not native.available():
        pytest.skip("native engine unavailable")
    from randblas_tpu.flags import flags
    d = DenseDist(12, 33, family=family)
    st = RNGState.from_key(7, "threefry4x64")
    with flags(use_native_x64=False):
        a = np.asarray(fill_dense_submat(d, st, 12, 33, 0, 0, jnp.float64))
    b = np.asarray(fill_dense_submat(d, st, 12, 33, 0, 0, jnp.float64))
    if exact:
        np.testing.assert_array_equal(a, b)
    else:
        np.testing.assert_allclose(a, b, rtol=0, atol=4e-16)
