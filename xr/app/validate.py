"""Debug validation — the renderer's "sanitizer build" (SURVEY.md §5.2a).

The reference relies on the D3D12 debug layer + GPU-based validation; the
TPU analogs here are finite-value checks on every pipeline product, scene
invariant checks, and (for kernels) Pallas interpret mode plus the
determinism tests in tests/test_determinism.py.
"""

from __future__ import annotations

import numpy as np

from xr.core.types import Frame, RenderConfig, Scene


def check_scene(scene: Scene) -> None:
    """Raise on malformed scenes (bad indices, non-finite data, shape drift)."""
    m = scene.mesh
    pos = np.asarray(m.positions)
    idx = np.asarray(m.indices)
    if not np.isfinite(pos).all():
        raise ValueError("mesh positions contain non-finite values")
    if not np.isfinite(np.asarray(m.normals)).all():
        raise ValueError("mesh normals contain non-finite values")
    if idx.size and (idx.min() < 0 or idx.max() >= pos.shape[0]):
        raise ValueError(
            f"indices out of range [0, {pos.shape[0]}): "
            f"[{idx.min()}, {idx.max()}]"
        )
    mid = np.asarray(m.material_id)
    nmat = np.asarray(scene.materials.base_color).shape[0]
    if mid.size and (mid.min() < 0 or mid.max() >= nmat):
        raise ValueError(f"material_id out of range [0, {nmat})")
    tid = np.asarray(m.transform_id)
    nxf = np.asarray(scene.model_matrices).shape[0]
    if tid.size and (tid.min() < 0 or tid.max() >= nxf):
        raise ValueError(f"transform_id out of range [0, {nxf})")
    if scene.textures is not None:
        texid = np.asarray(scene.materials.tex_id)
        if (texid >= scene.textures.num_textures).any():
            raise ValueError("material tex_id exceeds texture count")


def check_frame(frame: Frame, config: RenderConfig) -> None:
    """Raise on non-finite depth, out-of-range depth, or overflow stats."""
    depth = np.asarray(frame.depth)
    if not np.isfinite(depth).all():
        raise ValueError("frame depth contains non-finite values")
    if depth.min() < 0.0 or depth.max() > 1.0:
        raise ValueError(
            f"depth outside [0,1]: [{depth.min()}, {depth.max()}]"
        )
    for k in ("clip_overflow", "bin_overflow"):
        v = int(np.asarray(frame.stats.get(k, 0)))
        if v:
            raise ValueError(f"{k}={v}: triangles were dropped")
    assert np.asarray(frame.color).shape == (config.height, config.width, 3)
