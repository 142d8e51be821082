"""Shadow-pass setup: directional-light view/projection fitting.

Host-side (numpy) on purpose: both the CPU oracle and the device renderer
take the SAME light matrices as inputs, so the two-pass frame (config 4,
BASELINE.json:10) compares pixel-exact. The depth-only pass itself is just
the normal pipeline in MODE_DEPTH_ONLY rendered from the light's camera.
"""

from __future__ import annotations

import numpy as np

from xr.core import math3d as m3
from xr.core.types import Scene


def scene_world_bounds(scene: Scene):
    """(center (3,), radius) of the scene in world space (host numpy)."""
    pos = np.asarray(scene.mesh.positions, np.float32)
    tid = np.asarray(scene.mesh.transform_id, np.int32)
    mats = np.asarray(scene.model_matrices, np.float32)
    p4 = np.concatenate([pos, np.ones((pos.shape[0], 1), np.float32)], axis=1)
    world = np.einsum("vij,vj->vi", mats[tid], p4)[:, :3]
    lo = world.min(axis=0)
    hi = world.max(axis=0)
    center = (lo + hi) * 0.5
    radius = float(np.linalg.norm(hi - center)) + 1e-3
    return center.astype(np.float32), radius


def light_matrices_for_scene(scene: Scene, pad: float = 1.05):
    """Orthographic (view, proj) for directional light 0, fit to the scene.

    The light camera sits at 2*radius along -light_dir from the scene center
    and sees the whole bounding sphere.
    """
    d = np.asarray(scene.lights.dir_dirs, np.float32)
    assert d.shape[0] >= 1, "shadow pass needs a directional light"
    d = d[0] / max(np.linalg.norm(d[0]), 1e-12)
    center, radius = scene_world_bounds(scene)
    r = radius * pad
    eye = center - d * (2.0 * r)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    if abs(float(np.dot(up, d))) > 0.95:
        up = np.array([1.0, 0.0, 0.0], np.float32)
    view = m3.look_at(eye, center, up, np)
    proj = m3.orthographic(-r, r, -r, r, r, 3.0 * r, np)
    return view.astype(np.float32), proj.astype(np.float32)
