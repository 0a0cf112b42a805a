"""Shared enums and small helpers (counterpart of RandBLAS/base.hh L1/L3).

JAX arrays carry their own shape and are logically row-major, so the
reference's stride/ld plumbing collapses to plain 2-D arrays here. The
``Layout`` and ``Op`` enums survive in two roles:

- ``Layout`` as *fill order* metadata for dense distributions (it changes
  which entries receive which random values — dist_to_layout,
  dense_skops.hh:297-310), and for the BLAS-compatibility API (compat.py)
  used to port the reference test matrix verbatim.
- ``Op`` as transposition flags in the sketching entry points.
"""

from __future__ import annotations

import enum


class MajorAxis(enum.Enum):
    """Fill-order / sparsity-structure selector (base.hh:138-150)."""
    Short = "S"
    Long = "L"
    Undefined = "U"


class Layout(enum.Enum):
    ColMajor = "C"
    RowMajor = "R"


class Op(enum.Enum):
    NoTrans = "N"
    Trans = "T"


class Side(enum.Enum):
    Left = "L"
    Right = "R"


def flip_op(op: Op) -> Op:
    return Op.Trans if op == Op.NoTrans else Op.NoTrans


def flip_layout(layout: Layout) -> Layout:
    return (Layout.RowMajor if layout == Layout.ColMajor
            else Layout.ColMajor)


def dims_before_op(m: int, n: int, op: Op):
    """Shape of the stored matrix X when op(X) is m-by-n (base.hh:91-97)."""
    return (m, n) if op == Op.NoTrans else (n, m)


def require(cond: bool, msg: str):
    """Host-side validation (counterpart of randblas_require,
    exceptions.hh:135-161). Shape/flag checks happen at trace time, so a
    plain python raise is the right tool."""
    if not cond:
        raise ValueError(f"randblas_tpu requirement failed: {msg}")
