"""Near-tie margin analysis for config4_blend's golden scene (CPU-only).

The device-parity test demands <=1 LSB at every pixel, which is only
well-posed when no per-pixel comparison in the pipeline sits within f32
backend-noise of flipping (measured device band: per-triangle |dz| up to
~3.6e-7 vs numpy — ISSUES.md). This tool measures, on the CURRENT preset
scene, every such margin:

  1. opaque visibility winner vs runner-up z gap (per covered pixel)
  2. blend pass read-only depth test:  |zf_transparent - opaque_depth|
  3. pane-vs-pane z ordering margins inside the blend set

Run after any preset change that moves geometry; a margin below ~1e-5
means the parity test can fail on a correct pipeline.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from xr.core import fixedpoint as fp
from xr.pipeline.geometry import geometry
from xr.raster import common as rc
from xr.scene.presets import config4_blend, small_preset
from xr.shading import blend
from xr.core import math3d as m3


def main():
    p = small_preset(config4_blend(), 480, 270)
    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)
    cfg = p.config
    H, W = cfg.height, cfg.width
    aspect = cfg.width / cfg.height
    view, proj = m3.camera_matrices(cam, aspect, np)
    tri = geometry(scene, view, proj, cfg, xp=np)
    tmask = blend.transparent_mask(tri, scene, np)
    ovalid = tri.valid & ~tmask
    print(f"records: valid={int(tri.valid.sum())} transparent={int(tmask.sum())}")

    px, py = rc.pixel_grids(W, H, cfg.subpixel, np)

    best = np.full((H, W), np.inf, np.float32)
    second = np.full((H, W), np.inf, np.float32)
    bid = np.full((H, W), -1, np.int32)
    bmat = np.full((H, W), -1, np.int32)
    smat = np.full((H, W), -1, np.int32)
    C = tri.valid.shape[0]
    CH = 64
    for c0 in range(0, C, CH):
        sl = slice(c0, min(c0 + CH, C))
        ok = ovalid[sl]
        if not ok.any():
            continue
        xs = tri.xs[sl][:, None, None, :]
        ys = tri.ys[sl][:, None, None, :]
        z = tri.z[sl][:, None, None, :]
        cov, (e0, e1, e2) = fp.coverage(xs, ys, px[None], py[None], np)
        zf = rc.fragment_depth(e0, e1, e2, z, np)
        zf = np.where(
            cov & rc.depth_range_mask(zf, np) & ok[:, None, None], zf, np.inf
        ).astype(np.float32)
        for j in range(zf.shape[0]):
            zj = zf[j]
            mid = int(tri.mat_id[c0 + j])
            w = zj < best
            second = np.where(w, best, np.minimum(second, zj))
            smat = np.where(w, bmat, np.where(zj < second, mid, smat))
            bmat = np.where(w, mid, bmat)
            bid = np.where(w, c0 + j, bid)
            best = np.where(w, zj, best)

    covered = np.isfinite(best)
    gap = np.where(np.isfinite(second), second - best, np.inf)
    g = gap[covered]
    print(f"opaque winner/runner-up z gap: min={g.min():.3e}")
    # the dangerous subset: a flip changes the image only when materials
    # (or shading inputs) differ
    diff_mat = covered & np.isfinite(second) & (bmat != smat)
    if diff_mat.any():
        gd = gap[diff_mat]
        k = np.unravel_index(np.where(diff_mat, gap, np.inf).argmin(), gap.shape)
        print(
            f"cross-material gap: min={gd.min():.3e} at yx={k}, "
            f"winner id={int(bid[k])} mats={int(bmat[k])}/{int(smat[k])}"
        )
    qs = np.quantile(g, [0.0, 1e-5, 1e-4, 1e-3])
    print(f"gap quantiles [min,1e-5,1e-4,1e-3]: {qs}")

    # ---- blend pass margins --------------------------------------------
    depth = np.where(covered, best, np.float32(1.0)).astype(np.float32)
    tids = np.nonzero(tmask)[0]
    print(f"transparent records: {tids.tolist()}")
    min_margin = np.inf
    argwhere = None
    zf_panes = []
    for t in tids:
        xs = tri.xs[t][None, None, :]
        ys = tri.ys[t][None, None, :]
        z = tri.z[t][None, None, :]
        cov, (e0, e1, e2) = fp.coverage(xs, ys, px, py, np)
        zf = rc.fragment_depth(e0, e1, e2, z, np).astype(np.float32)
        m = cov & rc.depth_range_mask(zf, np)
        zf_panes.append(np.where(m, zf, np.nan))
        d = np.abs(zf - depth)
        d = np.where(m, d, np.inf)
        if d.min() < min_margin:
            min_margin = float(d.min())
            argwhere = (int(t), *np.unravel_index(d.argmin(), d.shape))
    print(
        f"blend |zf - opaque_depth| margin: min={min_margin:.3e} at "
        f"(rec,y,x)={argwhere}"
    )
    # pane-vs-pane z gaps where both cover (composite order is src-id
    # fixed, so this margin only matters if a pane also z-tests ANOTHER
    # pane's depth — it doesn't — but report for completeness)
    for i in range(len(tids)):
        for j in range(i + 1, len(tids)):
            both = np.isfinite(zf_panes[i]) & np.isfinite(zf_panes[j])
            if both.any():
                dz = np.abs(zf_panes[i] - zf_panes[j])[both]
                print(
                    f"pane {int(tids[i])} vs {int(tids[j])}: overlap "
                    f"{int(both.sum())} px, min|dz|={dz.min():.3e}"
                )




def shadow_margins():
    """Margins of the two binary comparisons inside the shadow test, on
    the oracle's own per-pixel world positions (captured via shade_hook)."""
    from xr.cpu_ref import render_frame
    from xr.cpu_ref.oracle import light_matrices_for_scene
    from xr.core import shade_math as sm

    p = small_preset(config4_blend(), 480, 270)
    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)
    cfg = p.config

    cap = {}

    def hook(color, scene_, mat_id, xp, frag=None):
        cap["world"] = frag.world
        cap["bg"] = frag.bg
        return color

    of = render_frame(scene, cam, cfg, shade_hook=hook)
    world = np.asarray(cap["world"]).reshape(cfg.height, cfg.width, 3)
    bg = np.asarray(cap["bg"]).reshape(cfg.height, cfg.width)

    lview, lproj = light_matrices_for_scene(scene)
    lvp = (lproj @ lview).astype(np.float32)
    import dataclasses
    from xr.pipeline.geometry import geometry
    from xr.cpu_ref.oracle import visibility_bbox
    from xr.shading import blend as bl

    from xr.core.types import MODE_DEPTH_ONLY

    s_cfg = dataclasses.replace(
        cfg, width=cfg.shadow_map_size, height=cfg.shadow_map_size,
        mode=MODE_DEPTH_ONLY, shadow_map_size=0,
    )
    s_tri = geometry(scene, lview, lproj, s_cfg, xp=np)
    s_tri = s_tri.replace(valid=bl.opaque_valid(s_tri, scene, np))
    _, s_zbuf = visibility_bbox(s_tri, s_cfg)
    sd = np.where(np.isinf(s_zbuf), 1.0, s_zbuf).astype(np.float32)

    hs, ws = sd.shape
    p4 = np.concatenate([world, np.ones(world.shape[:-1] + (1,), np.float32)], -1)
    clip = p4 @ lvp.T
    w = np.maximum(clip[..., 3], 1e-12)
    ndc_x, ndc_y, z = clip[..., 0] / w, clip[..., 1] / w, clip[..., 2] / w
    sx = (ndc_x * 0.5 + 0.5) * ws
    sy = (0.5 - ndc_y * 0.5) * hs
    sx = np.nan_to_num(sx); sy = np.nan_to_num(sy)
    ix = np.clip(np.floor(sx), 0, ws - 1).astype(np.int32)
    iy = np.clip(np.floor(sy), 0, hs - 1).astype(np.int32)
    d = sd[iy, ix]
    inside = ((ndc_x >= -1) & (ndc_x <= 1) & (ndc_y >= -1) & (ndc_y <= 1)
              & (z >= 0) & (z <= 1))
    act = inside & ~bg
    # 1) compare margin
    cmpm = np.abs((z - cfg.shadow_bias) - d)
    cm = np.where(act, cmpm, np.inf)
    k = np.unravel_index(cm.argmin(), cm.shape)
    print(f"shadow compare margin: min={cm.min():.3e} at yx={k}")
    print(f"  px below 1e-4: {int((cm < 1e-4).sum())}, below 1e-5: {int((cm < 1e-5).sum())}")
    # 2) texel-selection margin: distance to texel boundary where the
    # adjacent texel's depth flips the compare
    lit0 = (z - cfg.shadow_bias) <= d
    fx = sx - np.floor(sx)
    fy = sy - np.floor(sy)
    bx = np.minimum(fx, 1 - fx)  # texels
    by = np.minimum(fy, 1 - fy)
    flips = np.zeros_like(lit0)
    for dy, dx in [(0, -1), (0, 1), (-1, 0), (1, 0)]:
        jx = np.clip(ix + dx, 0, ws - 1)
        jy = np.clip(iy + dy, 0, hs - 1)
        dn = sd[jy, jx]
        litn = (z - cfg.shadow_bias) <= dn
        near = (bx if dy == 0 else by) < 1e-3  # within 1e-3 texel of edge
        flips |= act & near & (litn != lit0)
    print(f"texel-flip-risk px (within 1e-3 texel of a flipping edge): {int(flips.sum())}")
    if flips.any():
        ys, xs_ = np.nonzero(flips)
        for i in range(min(6, ys.size)):
            y, x = int(ys[i]), int(xs_[i])
            print(f"  risk px yx=({y},{x}) fx={fx[y,x]:.5f} fy={fy[y,x]:.5f}")


if __name__ == "__main__":
    main() if "--shadow" not in sys.argv else shadow_margins()
