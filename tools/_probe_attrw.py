"""Probe: does TriBuf.attr_w carry zero normal columns on the real TPU?

Splits the config4b ambient-only bug (ISSUES.md): runs ONLY the geometry
stage (no raster, no Pallas, no deferred pass) under jit on the default
device and prints per-attr-column abs-max for live records, vs the numpy
oracle geometry. Small program -> fast remote compile.
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from xr.scene.presets import config4_phong, small_preset
from xr.pipeline.geometry import geometry
from xr.core import math3d as m3

p = small_preset(config4_phong(), 480, 270)

for xp in (np, jnp):
    cam, mm = p.animate(0.0, xp)
    scene = p.scene if xp is np else jax.tree_util.tree_map(jnp.asarray, p.scene)
    scene = scene.replace(model_matrices=mm)

    aspect = p.config.width / p.config.height

    def run(scene, cam):
        view, proj = m3.camera_matrices(cam, aspect, xp)
        return geometry(scene, view, proj, p.config, xp=xp)

    if xp is jnp:
        run = jax.jit(run)
    tri = run(scene, cam)
    aw = np.asarray(tri.attr_w)      # (C, 3, A)
    iw = np.asarray(tri.inv_w)
    live = np.asarray(tri.mat_id) >= 0 if hasattr(tri, "mat_id") else None
    # live records: inv_w > 0 is a decent liveness proxy; also count
    n_live = int((np.abs(iw).max(axis=-1) > 0).sum())
    colmax = np.abs(aw).reshape(aw.shape[0], -1).max(axis=0)  # (3A,)
    per_attr = np.abs(aw).max(axis=(0, 1))                    # (A,)
    print(f"[{xp.__name__}] capacity {aw.shape[0]} live~{n_live} "
          f"attr abs-max per column: {np.array2string(per_attr, precision=3)}",
          flush=True)
