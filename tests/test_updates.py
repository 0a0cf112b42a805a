"""Streaming sketch-update scenarios 1-4 (rtd/source/tutorial/updates.rst).

The seed-chaining contract: using S1.next_state as S2's seed makes
[S1; S2] (or [S1, S2]) exactly equal to the one-shot operator with S1's
seed, for the appropriate fill order. Scenarios:

1. wide, row-wise (Long):    grow d      -> B = [S1 A; S2 A]
2. wide, column-wise (Short): grow m     -> B = B1 + S2 A2
3. tall, column-wise (Long): grow d      -> B = [A S1, A S2]
4. tall, row-wise (Short):   grow n      -> B = B1 + A2 S2
"""

import jax.numpy as jnp
import numpy as np

from randblas_tpu import (
    DenseDist, DenseDistName, DenseSkOp, MajorAxis, RNGState,
    sketch_general,
)

RNG = np.random.default_rng(7)


def _op(n_rows, n_cols, ma, state):
    return DenseSkOp(DenseDist(n_rows, n_cols, DenseDistName.Gaussian, ma),
                     state)


def test_scenario_1_grow_sketch_size_left():
    m, n, d1, d2 = 24, 5, 4, 3
    A = jnp.asarray(RNG.normal(size=(m, n)).astype(np.float32))
    c = RNGState.from_key(1)
    S1 = _op(d1, m, MajorAxis.Long, c)
    S2 = _op(d2, m, MajorAxis.Long, S1.next_state)
    S = _op(d1 + d2, m, MajorAxis.Long, c)
    two_step = np.vstack([np.asarray(sketch_general(S1, A)),
                          np.asarray(sketch_general(S2, A))])
    one_shot = np.asarray(sketch_general(S, A))
    np.testing.assert_array_equal(two_step, one_shot)


def test_scenario_2_new_data_left():
    d, n, m1, m2 = 4, 5, 16, 12
    c = RNGState.from_key(2)
    A1 = jnp.asarray(RNG.normal(size=(m1, n)).astype(np.float32))
    A2 = jnp.asarray(RNG.normal(size=(m2, n)).astype(np.float32))
    S1 = _op(d, m1, MajorAxis.Short, c)
    S2 = _op(d, m2, MajorAxis.Short, S1.next_state)
    S = _op(d, m1 + m2, MajorAxis.Short, c)
    B1 = sketch_general(S1, A1)
    B = np.asarray(sketch_general(S2, A2, beta=1.0, out=B1))
    one_shot = np.asarray(sketch_general(S, jnp.vstack([A1, A2])))
    np.testing.assert_allclose(B, one_shot, rtol=1e-5, atol=1e-5)


def test_scenario_3_grow_sketch_size_right():
    n, rows, d1, d2 = 20, 6, 3, 4
    A = jnp.asarray(RNG.normal(size=(rows, n)).astype(np.float32))
    c = RNGState.from_key(3)
    S1 = _op(n, d1, MajorAxis.Long, c)       # tall, column-wise
    S2 = _op(n, d2, MajorAxis.Long, S1.next_state)
    S = _op(n, d1 + d2, MajorAxis.Long, c)
    two_step = np.hstack([np.asarray(sketch_general(S1, A, side="right")),
                          np.asarray(sketch_general(S2, A, side="right"))])
    one_shot = np.asarray(sketch_general(S, A, side="right"))
    np.testing.assert_array_equal(two_step, one_shot)


def test_scenario_4_new_data_right():
    d, rows, n1, n2 = 5, 6, 14, 10
    c = RNGState.from_key(4)
    A1 = jnp.asarray(RNG.normal(size=(rows, n1)).astype(np.float32))
    A2 = jnp.asarray(RNG.normal(size=(rows, n2)).astype(np.float32))
    S1 = _op(n1, d, MajorAxis.Short, c)      # tall, row-wise
    S2 = _op(n2, d, MajorAxis.Short, S1.next_state)
    S = _op(n1 + n2, d, MajorAxis.Short, c)
    B1 = sketch_general(S1, A1, side="right")
    B = np.asarray(sketch_general(S2, A2, side="right", beta=1.0, out=B1))
    one_shot = np.asarray(
        sketch_general(S, jnp.hstack([A1, A2]), side="right"))
    np.testing.assert_allclose(B, one_shot, rtol=1e-5, atol=1e-5)
