"""Geometry pipeline stages (vertex/clip/setup), shared numpy<->jax.

Importing this package pins jax's default matmul precision to float32
("highest"): TPU matmuls otherwise downcast to bf16, which would break the
8-bit golden tolerance for vertex transforms (SURVEY.md §7.3.3).
"""
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
