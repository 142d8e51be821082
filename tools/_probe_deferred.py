"""Decisive probe for the TPU ambient-only Phong bug (ISSUES.md).

ONE small jit program, no raster, no Pallas: geometry -> _pack_records ->
gather one known-covered pixel's record row -> edge values -> barycentrics
-> interpolated attrs. Prints each intermediate on numpy and on the
device so the first diverging stage is visible directly.

The covered pixel + its winning tid come from the CPU oracle (coverage is
bit-exact on device per ISSUES.md, so the same tid is valid there).
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from xr.core import math3d as m3
from xr.core import fixedpoint as fp
from xr.scene.presets import config4_phong, small_preset
from xr.pipeline.geometry import geometry
from xr.shading.deferred import _pack_records, _bits_to_i32
from xr.cpu_ref import render_frame
from xr.raster.common import pixel_grids

p = small_preset(config4_phong(), 480, 270)
cfg = p.config
A = cfg.attr_width

# --- oracle: find a covered pixel and its winning record id -------------
cam_np, mm_np = p.animate(0.0, np)
of = render_frame(p.scene.replace(model_matrices=mm_np), cam_np, cfg)
cov = np.asarray(of.depth) < 1.0
ys_c, xs_c = np.nonzero(cov)
k = ys_c.size // 2
Y, X = int(ys_c[k]), int(xs_c[k])
print(f"probe pixel y={Y} x={X} (of {ys_c.size} covered)", flush=True)

pxg, pyg = pixel_grids(cfg.width, cfg.height, cfg.subpixel, np)
PX, PY = int(pxg[Y, X]), int(pyg[Y, X])

aspect = cfg.width / cfg.height


def stage(scene, cam, xp):
    view, proj = m3.camera_matrices(cam, aspect, xp)
    tri = geometry(scene, view, proj, cfg, xp=xp)
    table, lod_base = _pack_records(tri, A, xp, cfg, None)
    # the oracle's tid at (Y, X) is found below on numpy; here return the
    # full per-stage data for ALL records so one jit serves any tid.
    aw_colmax = xp.max(xp.abs(tri.attr_w), axis=(0, 1))      # (A,)
    iw_max = xp.max(xp.abs(tri.inv_w))
    tab_colmax = xp.max(xp.abs(table), axis=0)               # (K,)
    return tri, table, aw_colmax, iw_max, tab_colmax


def at_pixel(table, tid, xp):
    rec = table[tid]
    xs = _bits_to_i32(rec[0:3][None], xp)[0]
    ysv = _bits_to_i32(rec[3:6][None], xp)[0]
    px = xp.asarray(PX, xp.int32)
    py = xp.asarray(PY, xp.int32)
    _, (e0, e1, e2) = fp.coverage(xs, ysv, px, py, xp)
    l0, l1, l2 = fp.barycentrics_f32(e0, e1, e2, xp)
    att0 = 7

    def interp(g):
        c = att0 + 3 * g
        return (l0 * rec[c] + l1 * rec[c + 1]) + l2 * rec[c + 2]

    vals = xp.stack([interp(g) for g in range(A + 1)])
    return rec, xp.stack([e0, e1, e2]), xp.stack([l0, l1, l2]), vals


# numpy pass first (also finds tid via oracle internals: recompute winner)
scene_np = p.scene.replace(model_matrices=mm_np)
tri_np, table_np, awm_np, iwm_np, tcm_np = stage(scene_np, cam_np, np)

# find a record covering (Y, X) by brute-force (any covering record works:
# we compare numpy vs device for the SAME tid)
m_all, _ = fp.coverage(
    tri_np.xs, tri_np.ys, np.int32(PX), np.int32(PY), np
)
m_all = m_all & np.asarray(tri_np.valid)
assert m_all.any(), "probe pixel not covered by any record?!"
ids = np.nonzero(m_all)[0]
TID = int(ids[0])
print(f"record id {TID} covers the pixel ({ids.size} candidates)", flush=True)

rec_n, e_n, l_n, v_n = at_pixel(table_np, TID, np)
print("[numpy ] aw colmax", np.array2string(awm_np, precision=3))
print("[numpy ] tab colmax", np.array2string(tcm_np, precision=2, threshold=50))
print("[numpy ] e", e_n, "l", l_n)
print("[numpy ] interp", np.array2string(v_n, precision=4), flush=True)

# --- device pass --------------------------------------------------------
scene_j = jax.tree_util.tree_map(jnp.asarray, p.scene)
cam_j, mm_j = p.animate(0.0, jnp)
scene_j = scene_j.replace(model_matrices=mm_j)


@jax.jit
def dev(scene, cam):
    tri, table, awm, iwm, tcm = stage(scene, cam, jnp)
    rec, e, l, v = at_pixel(table, TID, jnp)
    return awm, iwm, tcm, rec, e, l, v


awm, iwm, tcm, rec_d, e_d, l_d, v_d = map(np.asarray, dev(scene_j, cam_j))
print("[device] aw colmax", np.array2string(awm, precision=3))
print("[device] tab colmax", np.array2string(tcm, precision=2, threshold=50))
print("[device] e", e_d, "l", l_d)
print("[device] interp", np.array2string(v_d, precision=4))
print("[device] rec row vs numpy max|d|:", np.abs(rec_d - rec_n).max(), flush=True)
