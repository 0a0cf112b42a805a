"""CSC sparse matrices (counterpart of RandBLAS/sparse_data/csc_matrix.hh)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..base import require
from .base import IndexBase, ptr_to_indices


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CSCMatrix:
    """colptr: int32[n_cols+1]; rowidxs: int32[nnz]; vals: float[nnz]."""
    colptr: jax.Array
    rowidxs: jax.Array
    vals: jax.Array
    n_rows: int = dataclasses.field(metadata={"static": True})
    n_cols: int = dataclasses.field(metadata={"static": True})

    @property
    def nnz(self) -> int:
        return self.rowidxs.shape[0]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @staticmethod
    def from_arrays(n_rows: int, n_cols: int, colptr, rowidxs, vals,
                    index_base: IndexBase = IndexBase.Zero) -> "CSCMatrix":
        colptr = jnp.asarray(colptr)
        rowidxs = jnp.asarray(rowidxs)
        vals = jnp.asarray(vals)
        require(colptr.shape[0] == n_cols + 1, "colptr must be n_cols+1 long")
        require(rowidxs.shape == vals.shape, "rowidxs/vals length mismatch")
        if index_base == IndexBase.One:
            rowidxs = rowidxs - 1
        return CSCMatrix(colptr.astype(jnp.int32),
                         rowidxs.astype(jnp.int32), vals, n_rows, n_cols)

    @staticmethod
    def from_dense(mat, abs_tol: float = 0.0) -> "CSCMatrix":
        """Host-side (dense_to_csc, csc_matrix.hh:214-247)."""
        a = np.asarray(mat)
        c, r = np.nonzero(np.abs(a.T) > abs_tol)  # column-major walk
        ptr = np.zeros(a.shape[1] + 1, dtype=np.int32)
        np.add.at(ptr, c + 1, 1)
        ptr = np.cumsum(ptr)
        return CSCMatrix(jnp.asarray(ptr, dtype=jnp.int32),
                         jnp.asarray(r, dtype=jnp.int32),
                         jnp.asarray(a[r, c]), a.shape[0], a.shape[1])

    def col_indices(self) -> jax.Array:
        """Per-nonzero column indices (jittable pointer expansion)."""
        return ptr_to_indices(self.colptr, self.nnz)

    def to_dense(self) -> jax.Array:
        dense = jnp.zeros(self.shape, dtype=self.vals.dtype)
        return dense.at[self.rowidxs, self.col_indices()].add(self.vals)
