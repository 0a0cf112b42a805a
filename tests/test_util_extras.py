"""Functional counterparts of the remaining util.hh helpers
(transpose_square, safe_scal, omatcopy, flip_layout, sort_coo_data)."""

import jax.numpy as jnp
import numpy as np
import pytest

import randblas_tpu as rb
from randblas_tpu.compat import flip_layout, omatcopy
from randblas_tpu.base import Layout
from randblas_tpu.sparse_data import COOMatrix
from randblas_tpu.sparse_data.base import NonzeroSort
from randblas_tpu.sparse_data.conversions import sort_coo_data

RNG = np.random.default_rng(3)


def test_transpose_square():
    a = jnp.asarray(RNG.normal(size=(5, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(rb.transpose_square(a)),
                                  np.asarray(a).T)
    with pytest.raises(ValueError):
        rb.transpose_square(jnp.zeros((3, 4)))


def test_safe_scal_zero_overwrites():
    x = jnp.asarray([np.inf, np.nan, 2.0], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(rb.safe_scal(0.0, x)),
                                  np.zeros(3, np.float32))
    np.testing.assert_allclose(np.asarray(rb.safe_scal(2.0, x))[2], 4.0)
    # traced zero alpha also overwrites
    out = rb.safe_scal(jnp.float32(0.0), x)
    np.testing.assert_array_equal(np.asarray(out), np.zeros(3, np.float32))


def test_omatcopy_strided():
    m, n = 3, 4
    a = np.arange(40, dtype=np.float32)
    b = np.zeros(64, dtype=np.float32)
    # read col-major-ish strides, write row-major with ld 5
    omatcopy(m, n, a, 1, 10, b, 5, 1)
    want = a[np.arange(m)[:, None] * 1 + np.arange(n)[None, :] * 10]
    got = b[np.arange(m)[:, None] * 5 + np.arange(n)[None, :] * 1]
    np.testing.assert_array_equal(got, want)


def test_flip_layout_roundtrip():
    m, n, lda, ldb = 3, 4, 6, 7
    a = np.zeros(lda * n, dtype=np.float32)   # col-major, ld=6
    mat = RNG.normal(size=(m, n)).astype(np.float32)
    from randblas_tpu.compat import write_mat
    write_mat(Layout.ColMajor, a, mat, lda)
    b = np.zeros(m * ldb, dtype=np.float32)   # row-major, ld=7
    flip_layout(Layout.ColMajor, m, n, a, lda, b, ldb)
    from randblas_tpu.compat import read_mat
    got = read_mat(Layout.RowMajor, b, m, n, ldb)
    np.testing.assert_array_equal(np.asarray(got), mat)


def test_sort_coo_data_free_function():
    rows = jnp.asarray([2, 0, 1, 0], jnp.int32)
    cols = jnp.asarray([1, 2, 0, 0], jnp.int32)
    vals = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
    coo = COOMatrix(rows, cols, vals, 3, 3)
    s = sort_coo_data(coo, NonzeroSort.CSR)
    r = np.asarray(s.rows)
    assert (np.diff(r) >= 0).all()
    np.testing.assert_array_equal(np.asarray(s.to_dense()),
                                  np.asarray(coo.to_dense()))
