"""Data IO: MatrixMarket readers (the reference examples' input pathway,
examples/sparse-low-rank-approx/qrcp_matrixmarket.cc &
svd_matrixmarket.cc use fast_matrix_market; here scipy.io provides the
parser and we land directly in the framework's containers)."""

from __future__ import annotations

from .base import require


def load_matrix_market(path: str, format: str = "coo"):
    """Read a MatrixMarket file into a sparse container ('coo', 'csr',
    'csc', 'ell') or a dense jnp array ('dense')."""
    try:
        from scipy.io import mmread  # noqa
    except ImportError as e:
        raise ImportError(
            "load_matrix_market needs scipy (pip extra: test)") from e
    import jax.numpy as jnp
    import numpy as np

    from .sparse_data import (COOMatrix, coo_to_csr, coo_to_csc,
                              coo_to_ell)

    mat = mmread(path)
    fmt = format.lower()
    if fmt == "dense":
        return jnp.asarray(np.asarray(mat.todense()
                                      if hasattr(mat, "todense") else mat,
                                      dtype=np.float32))
    sp = mat.tocoo() if hasattr(mat, "tocoo") else None
    require(sp is not None, "file does not contain a sparse matrix")
    coo = COOMatrix.from_arrays(sp.shape[0], sp.shape[1], sp.row, sp.col,
                                sp.data.astype(np.float32))
    if fmt == "coo":
        return coo
    if fmt == "csr":
        return coo_to_csr(coo)
    if fmt == "csc":
        return coo_to_csc(coo)
    if fmt == "ell":
        return coo_to_ell(coo)
    raise ValueError(f"unknown format {format!r}")


def save_matrix_market(path: str, a) -> None:
    """Write a sparse container (or dense array) to a MatrixMarket file."""
    try:
        from scipy.io import mmwrite
        from scipy.sparse import coo_matrix
    except ImportError as e:
        raise ImportError(
            "save_matrix_market needs scipy (pip extra: test)") from e
    import numpy as np

    from .sparse_data import to_coo

    if hasattr(a, "nnz"):
        coo = to_coo(a)
        sp = coo_matrix((np.asarray(coo.vals),
                         (np.asarray(coo.rows), np.asarray(coo.cols))),
                        shape=coo.shape)
        mmwrite(path, sp)
    else:
        mmwrite(path, np.asarray(a))
