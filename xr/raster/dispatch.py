"""Visibility-backend dispatch shared by the renderer and the sharded path.

Backends (all bit-identical results):
  jnp          — portable (CPU mesh tests, fallback)
  pallas_smem  — Pallas TPU kernel, SMEM record windows + scalar loads
  pallas_stream — Pallas TPU kernel over block-aligned sorted segments with
                scalar-prefetch-driven index maps (default on TPU: no
                per-tile capacity, cost scales with actual bin entries)

(The round-1 VMEM masked-reduce kernel was retired in round 3: dispatch
never chose it — pallas_stream is strictly better at every scale it
served, including the big-bin-capacity case that exceeds pallas_smem's
SMEM budget.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xr.core.types import RenderConfig
from xr.raster import jnp_backend


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _pad128(n: int) -> int:
    return (n + 127) // 128 * 128


def _smem_bytes(config: RenderConfig) -> int:
    """SMEM footprint of the pallas_smem kernel's record windows."""
    from xr.raster.pallas_smem import NFIELDS

    small = NFIELDS * 4 * _pad128(config.bin_capacity) * 2  # double-buffered
    large = NFIELDS * 4 * _pad128(config.large_capacity)
    return small + large


def visibility(tri, config: RenderConfig, capacity: int, y_offset=0):
    """Returns (tid, zbuf, bin_overflow) via the configured backend."""
    path = config.raster_path
    if path == "auto":
        path = "brute" if capacity <= 2048 else "binned"
    if path == "brute":
        tid, zbuf = jnp_backend.visibility_brute(tri, config, y_offset=y_offset)
        return tid, zbuf, jnp.int32(0) + 0 * jnp.asarray(y_offset, jnp.int32)

    backend = config.backend
    if backend == "auto":
        backend = "pallas_stream" if on_tpu() else "jnp"
    if backend == "pallas_smem" and _smem_bytes(config) > 900_000:
        # v5e has ~1MB of SMEM; bin capacities past the budget stream
        # instead (no per-tile capacity at all)
        backend = "pallas_stream"
    interp = config.pallas_interpret
    if backend == "pallas_stream":
        from xr.raster import pallas_stream

        return pallas_stream.visibility_binned(
            tri, config, y_offset=y_offset, interpret=interp
        )
    if backend == "pallas_smem":
        from xr.raster import pallas_smem

        return pallas_smem.visibility_binned(
            tri, config, y_offset=y_offset, interpret=interp
        )
    return jnp_backend.visibility_binned(tri, config, y_offset=y_offset)
