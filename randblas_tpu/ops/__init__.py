"""Compute kernels: counter-addressed fill, COO apply, fused Pallas sketch."""
