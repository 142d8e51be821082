"""Bisect the record-table path for the TPU ambient-only Phong bug.

Run AFTER tools/_probe_deferred.py reproduces (ISSUES.md). Builds the
config4 geometry once, then compares numpy vs device for VALUE-IDENTICAL
variants of the per-pixel record fetch, isolating which construct
mis-lowers:

  V1 baseline  — _pack_records as deployed (bitcast ints + transposed
                 attr block + concat), (N,) row gather, column slices.
  V2 no-transpose — same table values but the attr block built by
                 stacking (C,) columns (no (C,3,A)->(C,A,3) transpose).
  V3 floats-only — table of just attr_w|inv_w (C, 27), no bitcast int
                 columns in front.
  V4 direct     — no table at all: per-field gathers tri.attr_w[:, v, g][t]
                 (the blend pass's access pattern, known-good on device).

Each prints per-attr-group interp column maxima; a variant whose device
values go to zero while numpy's are finite reproduces the corruption.
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from xr.core import math3d as m3
from xr.scene.presets import config4_phong, small_preset
from xr.pipeline.geometry import geometry
from xr.shading.deferred import _i32_to_bits

p = small_preset(config4_phong(), 480, 270)
cfg = p.config
A = cfg.attr_width
H, W = cfg.height, cfg.width
aspect = W / H

cam_np, mm_np = p.animate(0.0, np)
scene_np = p.scene.replace(model_matrices=mm_np)
view_n, proj_n = m3.camera_matrices(cam_np, aspect, np)
tri_n = geometry(scene_np, view_n, proj_n, cfg, xp=np)
live = np.nonzero(np.asarray(tri_n.valid))[0].astype(np.int32)
T_IDX = live[np.arange(H * W) % live.size]  # (N,) synthetic winners


def variants(tri, t, xp):
    C = tri.capacity
    aw_t = xp.transpose(tri.attr_w, (0, 2, 1)).reshape(C, 3 * A)
    aw_s = xp.stack(
        [tri.attr_w[:, v, g] for g in range(A) for v in range(3)], axis=-1
    )
    ints = xp.concatenate(
        [
            _i32_to_bits(tri.xs, xp),
            _i32_to_bits(tri.ys, xp),
            _i32_to_bits(tri.mat_id.reshape(C, 1), xp),
        ],
        axis=1,
    )
    iw = tri.inv_w.astype(xp.float32)

    out = {}
    # V1: deployed shape
    tab1 = xp.concatenate([ints, aw_t.astype(xp.float32), iw], axis=1)
    r = tab1[t]
    out["V1_packed_transpose"] = xp.stack(
        [xp.max(xp.abs(r[:, 7 + j])) for j in range(3 * A + 3)]
    )
    # V2: same values, no transposed block
    tab2 = xp.concatenate([ints, aw_s.astype(xp.float32), iw], axis=1)
    r2 = tab2[t]
    out["V2_packed_stack"] = xp.stack(
        [xp.max(xp.abs(r2[:, 7 + j])) for j in range(3 * A + 3)]
    )
    # V3: floats only, no bitcast ints in front
    tab3 = xp.concatenate([aw_t.astype(xp.float32), iw], axis=1)
    r3 = tab3[t]
    out["V3_floats_only"] = xp.stack(
        [xp.max(xp.abs(r3[:, j])) for j in range(3 * A + 3)]
    )
    # V4: the blend pass's direct access pattern (known-good on device)
    out["V4_direct_fields"] = xp.stack(
        [
            xp.max(xp.abs(tri.attr_w[:, v, g][t]))
            for g in range(A)
            for v in range(3)
        ]
        + [xp.max(xp.abs(tri.inv_w[:, v][t])) for v in range(3)]
    )
    return out


def run(scene, cam, xp):
    view, proj = m3.camera_matrices(cam, aspect, xp)
    tri = geometry(scene, view, proj, cfg, xp=xp)
    return variants(tri, xp.asarray(T_IDX), xp)


ref = run(scene_np, cam_np, np)

scene_j = jax.tree_util.tree_map(jnp.asarray, p.scene)
cam_j, mm_j = p.animate(0.0, jnp)
scene_j = scene_j.replace(model_matrices=mm_j)
dev = jax.jit(lambda s, c: run(s, c, jnp))(scene_j, cam_j)

for k in ref:
    a, b = np.asarray(ref[k]), np.asarray(dev[k])
    d = np.abs(a - b).max()
    flag = "OK " if d <= 1e-3 * max(1.0, np.abs(a).max()) else "DIVERGES"
    print(f"{flag} {k}: max|np-dev| = {d:.6g}")
    if flag == "DIVERGES":
        print("   np :", np.array2string(a, precision=3, threshold=40))
        print("   dev:", np.array2string(b, precision=3, threshold=40))
print("done", flush=True)
