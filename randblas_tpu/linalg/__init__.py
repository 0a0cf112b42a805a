"""Sketching-based linear algebra building blocks (the reference's
examples/ tier, as a library)."""

from .qb import qb_decompose, qb_to_svd, rangefinder
from .tls import sketched_tls, tls_via_svd

__all__ = ["qb_decompose", "qb_to_svd", "rangefinder", "sketched_tls",
           "tls_via_svd"]
