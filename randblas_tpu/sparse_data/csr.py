"""CSR sparse matrices (counterpart of RandBLAS/sparse_data/csr_matrix.hh)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base import require
from .base import IndexBase, ptr_to_indices


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CSRMatrix:
    """rowptr: int32[n_rows+1]; colidxs: int32[nnz]; vals: float[nnz]."""
    rowptr: jax.Array
    colidxs: jax.Array
    vals: jax.Array
    n_rows: int = dataclasses.field(metadata={"static": True})
    n_cols: int = dataclasses.field(metadata={"static": True})

    @property
    def nnz(self) -> int:
        return self.colidxs.shape[0]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @staticmethod
    def from_arrays(n_rows: int, n_cols: int, rowptr, colidxs, vals,
                    index_base: IndexBase = IndexBase.Zero) -> "CSRMatrix":
        rowptr = jnp.asarray(rowptr)
        colidxs = jnp.asarray(colidxs)
        vals = jnp.asarray(vals)
        require(rowptr.shape[0] == n_rows + 1, "rowptr must be n_rows+1 long")
        require(colidxs.shape == vals.shape, "colidxs/vals length mismatch")
        if index_base == IndexBase.One:
            colidxs = colidxs - 1
        return CSRMatrix(rowptr.astype(jnp.int32),
                         colidxs.astype(jnp.int32), vals, n_rows, n_cols)

    @staticmethod
    def from_dense(mat, abs_tol: float = 0.0) -> "CSRMatrix":
        """Host-side (dense_to_csr, csr_matrix.hh:228-261)."""
        a = np.asarray(mat)
        r, c = np.nonzero(np.abs(a) > abs_tol)
        ptr = np.zeros(a.shape[0] + 1, dtype=np.int32)
        np.add.at(ptr, r + 1, 1)
        ptr = np.cumsum(ptr)
        return CSRMatrix(jnp.asarray(ptr, dtype=jnp.int32),
                         jnp.asarray(c, dtype=jnp.int32),
                         jnp.asarray(a[r, c]), a.shape[0], a.shape[1])

    def row_indices(self) -> jax.Array:
        """Per-nonzero row indices (jittable pointer expansion)."""
        return ptr_to_indices(self.rowptr, self.nnz)

    def to_dense(self) -> jax.Array:
        dense = jnp.zeros(self.shape, dtype=self.vals.dtype)
        return dense.at[self.row_indices(), self.colidxs].add(self.vals)
