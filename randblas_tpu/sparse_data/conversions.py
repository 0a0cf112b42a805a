"""Format conversions and transpose views
(counterpart of RandBLAS/sparse_data/conversions.hh)."""

from __future__ import annotations

import jax.numpy as jnp

from .base import NonzeroSort, indices_to_ptr, ptr_to_indices
from .coo import COOMatrix
from .csc import CSCMatrix
from .csr import CSRMatrix


def coo_to_csr(a: COOMatrix) -> CSRMatrix:
    """(conversions.hh:44-64) — sorts CSR-style first; jittable."""
    s = a.sorted(NonzeroSort.CSR)
    rowptr = indices_to_ptr(s.rows, a.n_rows, a.nnz)
    return CSRMatrix(rowptr, s.cols, s.vals, a.n_rows, a.n_cols)


def csr_to_coo(a: CSRMatrix) -> COOMatrix:
    """(conversions.hh:67-83)."""
    return COOMatrix(a.row_indices(), a.colidxs, a.vals, a.n_rows, a.n_cols,
                     NonzeroSort.CSR)


def coo_to_csc(a: COOMatrix) -> CSCMatrix:
    """(conversions.hh:86-106)."""
    s = a.sorted(NonzeroSort.CSC)
    colptr = indices_to_ptr(s.cols, a.n_cols, a.nnz)
    return CSCMatrix(colptr, s.rows, s.vals, a.n_rows, a.n_cols)


def csc_to_coo(a: CSCMatrix) -> COOMatrix:
    """(conversions.hh:109-123)."""
    return COOMatrix(a.rowidxs, a.col_indices(), a.vals, a.n_rows, a.n_cols,
                     NonzeroSort.CSC)


def transpose_as_csc(a: CSRMatrix) -> CSCMatrix:
    """Zero-copy: a CSR matrix's arrays reinterpreted as its transpose in
    CSC (conversions.hh:126-141)."""
    return CSCMatrix(a.rowptr, a.colidxs, a.vals, a.n_cols, a.n_rows)


def transpose_as_csr(a: CSCMatrix) -> CSRMatrix:
    """Zero-copy inverse (conversions.hh:144-159)."""
    return CSRMatrix(a.colptr, a.rowidxs, a.vals, a.n_cols, a.n_rows)


def to_coo(a) -> COOMatrix:
    """Normalize any supported sparse container (or a sparse sketching
    operator) to COO triplets without copying values."""
    from ..sparse import SparseSkOp
    from .ell import ELLMatrix, ell_to_coo
    if isinstance(a, COOMatrix):
        return a
    if isinstance(a, CSRMatrix):
        return csr_to_coo(a)
    if isinstance(a, CSCMatrix):
        return csc_to_coo(a)
    if isinstance(a, ELLMatrix):
        return ell_to_coo(a)
    if isinstance(a, SparseSkOp):
        s = a.filled()
        return COOMatrix(s.rows.astype(jnp.int32),
                         s.cols.astype(jnp.int32), s.vals,
                         s.n_rows, s.n_cols, NonzeroSort.NONE)
    raise TypeError(f"not a sparse matrix: {type(a)!r}")


def sort_coo_data(a, order) -> "COOMatrix":
    """Free-function name parity with sort_coo_data
    (coo_matrix.hh:268-318): returns a COOMatrix with triplets in CSR-
    or CSC-style order (functional; see COOMatrix.sorted)."""
    return a.sorted(order)
