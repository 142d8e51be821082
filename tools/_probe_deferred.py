"""Decisive probe for the TPU ambient-only Phong bug (ISSUES.md).

Runs the REAL deferred pass (shade_deferred) on a full 480x270 pixel grid
with a SYNTHETIC visibility buffer (every pixel assigned a live record id,
cycling through all of them) — no raster, no Pallas, no shadow pass. This
reproduces the exact per-pixel (N,)-index row gather + column-consumer
lowering the frame program uses (a single-row table[TID] fetch would
lower to dynamic-slice instead and could hide the bug).

Stage B re-runs the same gather and prints per-stage intermediates
(edge values, barycentrics, interpolated attr groups) so the first
diverging stage is visible directly.
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from xr.core import math3d as m3
from xr.core import fixedpoint as fp
from xr.scene.presets import config4_phong, small_preset
from xr.pipeline.geometry import geometry
from xr.shading.deferred import shade_deferred, _pack_records, _bits_to_i32

p = small_preset(config4_phong(), 480, 270)
cfg = p.config
A = cfg.attr_width
H, W = cfg.height, cfg.width

cam_np, mm_np = p.animate(0.0, np)
scene_np = p.scene.replace(model_matrices=mm_np)
aspect = W / H

# live record ids from the numpy geometry (same ids are valid on device:
# geometry is deterministic and parity-tested)
view_n, proj_n = m3.camera_matrices(cam_np, aspect, np)
tri_np = geometry(scene_np, view_n, proj_n, cfg, xp=np)
live = np.nonzero(np.asarray(tri_np.valid))[0].astype(np.int32)
print(f"live records: {live.size} of capacity {tri_np.capacity}", flush=True)
TID2D = live[np.arange(H * W) % live.size].reshape(H, W)

captured = {}


def hook(color, scene, mat_id, xp, frag=None):
    # stash the G-buffer the deferred pass computed (world/normal)
    captured["normal"] = frag.normal
    captured["world"] = frag.world
    return color


def full(scene, cam, xp):
    view, proj = m3.camera_matrices(cam, aspect, xp)
    tri = geometry(scene, view, proj, cfg, xp=xp)
    rgb = shade_deferred(
        tri, xp.asarray(TID2D), scene, cfg, eye=cam.eye, xp=xp,
        shade_hook=hook,
    )
    return rgb, captured["normal"], captured["world"]


def stages(scene, cam, xp):
    """Stage B: the same (N,) row gather, intermediates exposed."""
    from xr.raster.common import pixel_grids

    view, proj = m3.camera_matrices(cam, aspect, xp)
    tri = geometry(scene, view, proj, cfg, xp=xp)
    table, lod_base = _pack_records(tri, A, xp, cfg, None)
    t = xp.asarray(TID2D).reshape(-1)
    px, py = pixel_grids(W, H, cfg.subpixel, xp)
    px, py = px.reshape(-1), py.reshape(-1)
    rec = table[t]
    xs = _bits_to_i32(rec[..., 0:3], xp)
    ys = _bits_to_i32(rec[..., 3:6], xp)
    _, (e0, e1, e2) = fp.coverage(xs, ys, px, py, xp)
    l0, l1, l2 = fp.barycentrics_f32(e0, e1, e2, xp)
    att0 = lod_base

    def interp(g):
        c = att0 + 3 * g
        return (l0 * rec[..., c] + l1 * rec[..., c + 1]) + l2 * rec[..., c + 2]

    groups = xp.stack([interp(g) for g in range(A + 1)])  # (A+1, N)
    return (
        xp.max(xp.abs(table), axis=0),                     # (K,) table colmax
        xp.stack([xp.max(xp.abs(v)) for v in (xs, ys)]),   # unpack colmax
        xp.stack([xp.max(xp.abs(v.astype(xp.float32))) for v in (e0, e1, e2)]),
        xp.stack([xp.max(xp.abs(v)) for v in (l0, l1, l2)]),
        xp.max(xp.abs(groups), axis=1),                    # (A+1,) interp colmax
    )


# ---- numpy reference ----------------------------------------------------
rgb_n, nrm_n, wld_n = full(scene_np, cam_np, np)
st_n = stages(scene_np, cam_np, np)

# ---- device -------------------------------------------------------------
scene_j = jax.tree_util.tree_map(jnp.asarray, p.scene)
cam_j, mm_j = p.animate(0.0, jnp)
scene_j = scene_j.replace(model_matrices=mm_j)

rgb_d, nrm_d, wld_d = map(
    np.asarray, jax.jit(lambda s, c: full(s, c, jnp))(scene_j, cam_j)
)
st_d = [np.asarray(x) for x in jax.jit(lambda s, c: stages(s, c, jnp))(scene_j, cam_j)]

print("[A] color  max|d|:", np.abs(rgb_d - np.asarray(rgb_n)).max())
print("[A] normal colmax np :", np.abs(np.asarray(nrm_n)).max(axis=0))
print("[A] normal colmax dev:", np.abs(nrm_d).max(axis=0))
print("[A] world  colmax np :", np.abs(np.asarray(wld_n)).max(axis=0))
print("[A] world  colmax dev:", np.abs(wld_d).max(axis=0), flush=True)

names = ["table colmax", "xs/ys max", "edge max", "lam max", "interp colmax"]
for nm, a, b in zip(names, st_n, st_d):
    a = np.asarray(a)
    d = np.abs(a - b).max()
    print(f"[B] {nm}: max|np-dev| = {d:.6g}")
    if d > 1e-3 * max(1.0, np.abs(a).max()):
        print(f"    np : {np.array2string(a, precision=4, threshold=40)}")
        print(f"    dev: {np.array2string(b, precision=4, threshold=40)}")
print("done", flush=True)
