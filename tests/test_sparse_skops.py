"""Sparse-sign operator tests.

Ports the semantics of test_datastructures/test_sparseskop.cc (SASO/LASO
structure, index types) and cross-checks the vectorized Fisher-Yates
against the serial numpy oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from randblas_tpu import (
    MajorAxis, RNGState, SparseDist, SparseSkOp, fill_sparse,
    repeated_fisher_yates,
)
from randblas_tpu.sparse import compute_next_state, sparse_nnz

from oracle import fisher_yates_oracle


def _np_state(key):
    return [np.uint32(0)] * 4, [np.uint32(key), np.uint32(0)]


@pytest.mark.parametrize("vec_nnz,dim_major,dim_minor", [
    (1, 5, 4), (3, 7, 6), (7, 7, 3), (8, 100, 20), (4, 10, 1),
])
def test_fisher_yates_vs_oracle(vec_nnz, dim_major, dim_minor):
    state = RNGState.from_key(17)
    idxs, vals = repeated_fisher_yates(state, vec_nnz, dim_major, dim_minor)
    ctr, key = _np_state(17)
    idxs_o, vals_o = fisher_yates_oracle(ctr, key, vec_nnz, dim_major,
                                         dim_minor)
    np.testing.assert_array_equal(np.asarray(idxs), idxs_o)
    np.testing.assert_array_equal(np.asarray(vals), vals_o)


def test_fisher_yates_submatrix_reproducible():
    """First r vectors of a bigger draw equal the smaller draw (the
    work-vector restore trick, sparse_skops.hh:97-103)."""
    state = RNGState.from_key(3)
    big_i, big_v = repeated_fisher_yates(state, 4, 20, 10)
    small_i, small_v = repeated_fisher_yates(state, 4, 20, 6)
    np.testing.assert_array_equal(np.asarray(big_i)[:6], np.asarray(small_i))
    np.testing.assert_array_equal(np.asarray(big_v)[:6], np.asarray(small_v))


def test_no_duplicate_indices_per_vector():
    idxs, _ = repeated_fisher_yates(RNGState.from_key(9), 8, 30, 50)
    idxs = np.asarray(idxs)
    for row in idxs:
        assert len(set(row.tolist())) == 8
    assert (idxs >= 0).all() and (idxs < 30).all()


@pytest.mark.parametrize("n_rows,n_cols", [(7, 20), (20, 7)])
def test_saso_structure(n_rows, n_cols):
    """SASO: exactly vec_nnz nonzeros per short-axis vector, no dup indices
    (test_sparseskop.cc:48-76)."""
    k = 3
    dist = SparseDist(n_rows, n_cols, vec_nnz=k, major_axis=MajorAxis.Short)
    S = fill_sparse(SparseSkOp(dist, RNGState.from_key(1)))
    dense = np.asarray(S.materialize())
    wide = n_rows < n_cols
    per_vec = (dense != 0).sum(axis=0 if wide else 1)
    assert (per_vec == k).all()
    assert set(np.unique(dense)) <= {-1.0, 0.0, 1.0}


@pytest.mark.parametrize("n_rows,n_cols", [(7, 20), (20, 7)])
def test_laso_structure(n_rows, n_cols):
    """LASO: at most vec_nnz per long-axis vector (duplicated COO entries
    can overlap when densified) (test_sparseskop.cc:78-104)."""
    k = 5
    dist = SparseDist(n_rows, n_cols, vec_nnz=k, major_axis=MajorAxis.Long)
    S = fill_sparse(SparseSkOp(dist, RNGState.from_key(2)))
    # per long-axis vector, the stored COO has exactly k entries with
    # distinct major indices
    idxs_major = np.asarray(S.cols if n_rows < n_cols else S.rows)
    idxs_minor = np.asarray(S.rows if n_rows < n_cols else S.cols)
    short_len = min(n_rows, n_cols)
    for i in range(short_len):
        sel = idxs_major[idxs_minor == i]
        assert len(sel) == k
        assert len(set(sel.tolist())) == k


def test_nnz_counts():
    assert sparse_nnz(SparseDist(7, 20, 3, MajorAxis.Short)) == 60
    assert sparse_nnz(SparseDist(7, 20, 3, MajorAxis.Long)) == 21
    assert sparse_nnz(SparseDist(20, 7, 3, MajorAxis.Short)) == 60
    assert sparse_nnz(SparseDist(20, 7, 3, MajorAxis.Long)) == 21


def test_next_state_reference_formula():
    """Replicates sparse::compute_next_state exactly (including min() for
    Short), sparse_skops.hh:116-126."""
    s = RNGState.from_key(0)
    st = compute_next_state(SparseDist(7, 20, 3, MajorAxis.Short), s)
    assert st.counter_as_int() == 7 * 3
    st = compute_next_state(SparseDist(7, 20, 3, MajorAxis.Long), s)
    assert st.counter_as_int() == 20 * 3


def test_transpose_view():
    S = fill_sparse(SparseSkOp(SparseDist(6, 15, 2), RNGState.from_key(4)))
    St = S.transpose()
    np.testing.assert_array_equal(np.asarray(St.materialize()),
                                  np.asarray(S.materialize()).T)


def test_index_dtype_int64():
    S = fill_sparse(SparseSkOp(SparseDist(6, 15, 2), RNGState.from_key(4),
                               index_dtype=jnp.int64))
    assert np.asarray(S.rows).dtype == np.int64
    S32 = fill_sparse(SparseSkOp(SparseDist(6, 15, 2), RNGState.from_key(4)))
    np.testing.assert_array_equal(np.asarray(S.rows),
                                  np.asarray(S32.rows).astype(np.int64))


def test_sparse_pytree_jit():
    import jax

    S = fill_sparse(SparseSkOp(SparseDist(6, 15, 2), RNGState.from_key(4)))

    @jax.jit
    def densify(S):
        return S.materialize()

    np.testing.assert_array_equal(np.asarray(densify(S)),
                                  np.asarray(S.materialize()))
