"""COO sparse matrices (counterpart of RandBLAS/sparse_data/coo_matrix.hh)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import require
from .base import IndexBase, NonzeroSort, detect_coo_sort, nnz_in_dense


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class COOMatrix:
    """COO triplets with static shape/nnz and sort-order tracking.

    rows/cols: int32[nnz]; vals: float[nnz]. Always zero-based internally.
    """
    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    n_rows: int = dataclasses.field(metadata={"static": True})
    n_cols: int = dataclasses.field(metadata={"static": True})
    sort: NonzeroSort = dataclasses.field(default=NonzeroSort.NONE,
                                          metadata={"static": True})

    @property
    def nnz(self) -> int:
        return self.rows.shape[0]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_arrays(n_rows: int, n_cols: int, rows, cols, vals,
                    index_base: IndexBase = IndexBase.Zero,
                    detect_sort: bool = True) -> "COOMatrix":
        rows = jnp.asarray(rows)
        cols = jnp.asarray(cols)
        vals = jnp.asarray(vals)
        require(rows.shape == cols.shape == vals.shape,
                "rows/cols/vals must have equal length")
        if index_base == IndexBase.One:
            rows = rows - 1
            cols = cols - 1
        sort = NonzeroSort.NONE
        if detect_sort:
            try:
                sort = detect_coo_sort(rows, cols)
            except jax.errors.TracerArrayConversionError:
                sort = NonzeroSort.NONE
        return COOMatrix(rows.astype(jnp.int32), cols.astype(jnp.int32),
                         vals, n_rows, n_cols, sort)

    @staticmethod
    def from_dense(mat, abs_tol: float = 0.0) -> "COOMatrix":
        """Host-side densify inverse (dense_to_coo, coo_matrix.hh:383-408).
        nnz becomes static, so this runs on concrete arrays only."""
        a = np.asarray(mat)
        require(a.ndim == 2, "dense input must be 2-D")
        r, c = np.nonzero(np.abs(a) > abs_tol)
        return COOMatrix(jnp.asarray(r, dtype=jnp.int32),
                         jnp.asarray(c, dtype=jnp.int32),
                         jnp.asarray(a[r, c]),
                         a.shape[0], a.shape[1], NonzeroSort.CSR)

    # -- ops -----------------------------------------------------------------

    def to_dense(self) -> jax.Array:
        """Jittable densify (coo_to_dense, coo_matrix.hh:350-380)."""
        dense = jnp.zeros(self.shape, dtype=self.vals.dtype)
        return dense.at[self.rows, self.cols].add(self.vals)

    def transpose(self) -> "COOMatrix":
        """Zero-copy transpose view (coo_matrix.hh:339-347)."""
        sort = {NonzeroSort.CSR: NonzeroSort.CSC,
                NonzeroSort.CSC: NonzeroSort.CSR,
                NonzeroSort.NONE: NonzeroSort.NONE}[self.sort]
        return COOMatrix(self.cols, self.rows, self.vals,
                         self.n_cols, self.n_rows, sort)

    def sorted(self, order: NonzeroSort) -> "COOMatrix":
        """Return a copy with triplets sorted CSR- or CSC-style
        (sort_coo_data, coo_matrix.hh:268-318). Jittable (static nnz)."""
        require(order in (NonzeroSort.CSR, NonzeroSort.CSC),
                "sort order must be CSR or CSC")
        if self.sort == order:
            return self
        if order == NonzeroSort.CSR:
            perm = jnp.lexsort((self.cols, self.rows))
        else:
            perm = jnp.lexsort((self.rows, self.cols))
        return COOMatrix(self.rows[perm], self.cols[perm], self.vals[perm],
                         self.n_rows, self.n_cols, order)
