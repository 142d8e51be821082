"""Rasterization backends: shared formulas, jnp fallback, Pallas TPU kernels."""
