"""CPU reference rasterizer — the golden oracle (SURVEY.md §2.3).

Defines "correct" for the whole framework: the driver metric is golden-image
max abs error vs THIS renderer (BASELINE.json:2), and config 1 is "(CPU
reference frame loop)" (BASELINE.json:7). It composes:

  * the shared geometry stage (xr/pipeline/geometry.py) run with numpy,
  * a simple per-triangle bbox visibility loop using the shared per-fragment
    formulas (xr/raster/common.py) — exact int32 coverage,
  * the shared deferred shading pass (xr/shading/deferred.py) run with numpy.

Because coverage math is integer and shading formulas are single-sourced,
the TPU pipeline matches this oracle bit-for-bit on coverage and to <=1 u8
LSB on color (SURVEY.md §7.3.3). The oracle itself is cross-validated against
an independently written scalar rasterizer (xr/cpu_ref/brute.py) in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from xr.core import math3d as m3
from xr.core import shade_math as sm
from xr.core.types import (
    MODE_DEPTH_ONLY,
    MODE_PHONG,
    Frame,
    RenderConfig,
    Scene,
)
from xr.pipeline.geometry import TriBuf, geometry
from xr.pipeline.shadow import light_matrices_for_scene
from xr.raster import common as rc
from xr.shading import blend
from xr.shading.deferred import shade_deferred


def visibility_bbox(tri: TriBuf, config: RenderConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Per-triangle bbox loop producing (tri_id (H,W) i32, zbuf (H,W) f32).

    zbuf is the internal buffer (inf = empty); callers map it to the D3D
    clear value 1.0 for the background when emitting a Frame.
    """
    H, W, sub = config.height, config.width, config.subpixel
    half = sub // 2
    zbuf = np.full((H, W), rc.BG_DEPTH, np.float32)
    tid = np.full((H, W), rc.BG_TRI_ID, np.int32)

    # iterate the whole capacity gated on `valid` — with the identity
    # record layout (geometry.py) valid entries are NOT a prefix, so
    # `count` is a statistic, not a loop bound
    for i in range(tri.capacity):
        if not bool(tri.valid[i]):
            continue
        xs, ys, z = tri.xs[i], tri.ys[i], tri.z[i]
        ix0 = max(0, -(-(int(xs.min()) - half) // sub))
        ix1 = min(W - 1, (int(xs.max()) - half) // sub)
        iy0 = max(0, -(-(int(ys.min()) - half) // sub))
        iy1 = min(H - 1, (int(ys.max()) - half) // sub)
        if ix1 < ix0 or iy1 < iy0:
            continue
        pxi = np.arange(ix0, ix1 + 1, dtype=np.int32) * sub + half
        pyi = np.arange(iy0, iy1 + 1, dtype=np.int32) * sub + half
        px = np.broadcast_to(pxi[None, :], (pyi.size, pxi.size))
        py = np.broadcast_to(pyi[:, None], (pyi.size, pxi.size))
        mask, zf = rc.tri_fragment(xs, ys, z, px, py, xp=np)
        if not config.depth_test:
            # No depth test: later triangles overwrite (painter's order);
            # still record zf for the depth output.
            win = mask
        else:
            win = mask & rc.resolve_better(
                zf, np.int32(i), zbuf[iy0 : iy1 + 1, ix0 : ix1 + 1],
                tid[iy0 : iy1 + 1, ix0 : ix1 + 1], np,
            )
        zslice = zbuf[iy0 : iy1 + 1, ix0 : ix1 + 1]
        tslice = tid[iy0 : iy1 + 1, ix0 : ix1 + 1]
        zslice[win] = zf[win]
        tslice[win] = i
    return tid, zbuf


def render_frame(
    scene: Scene,
    camera,
    config: RenderConfig,
    model_time: Optional[float] = None,
    shade_hook=None,
) -> Frame:
    """Render one frame with the CPU oracle. Two-pass when shadow-mapped
    Phong is configured (config 4's depth pass + main pass, BASELINE.json:10).
    shade_hook: the same custom pixel-shader stage render_step accepts.
    """
    aspect = config.width / config.height
    view, proj = m3.camera_matrices(camera, aspect, np)

    shadow_depth = None
    light_viewproj = None
    if config.mode == MODE_PHONG and config.shadow_map_size > 0:
        lview, lproj = light_matrices_for_scene(scene)
        light_viewproj = (lproj @ lview).astype(np.float32)
        s_cfg = dataclasses.replace(
            config,
            width=config.shadow_map_size,
            height=config.shadow_map_size,
            mode=MODE_DEPTH_ONLY,
            shadow_map_size=0,
        )
        s_tri = geometry(scene, lview, lproj, s_cfg, xp=np)
        if config.blend:
            s_tri = s_tri.replace(valid=blend.opaque_valid(s_tri, scene, np))
        _, s_zbuf = visibility_bbox(s_tri, s_cfg)
        shadow_depth = np.where(np.isinf(s_zbuf), 1.0, s_zbuf).astype(np.float32)

    tri = geometry(scene, view, proj, config, xp=np)
    vis_tri = tri
    if config.blend:
        # transparent records win no pixels and cast no shadows (blend.py)
        vis_tri = tri.replace(valid=blend.opaque_valid(tri, scene, np))
    tid, zbuf = visibility_bbox(vis_tri, config)
    depth = np.where(np.isinf(zbuf), 1.0, zbuf).astype(np.float32)

    shaded = config.width * config.height
    if shadow_depth is not None:  # shadow pre-pass texels count as shaded work
        shaded += config.shadow_map_size * config.shadow_map_size
    stats = {
        "tris_in": np.int32(scene.mesh.num_triangles),
        "tris_setup": tri.count,
        "clip_overflow": tri.overflow,
        "fragments_shaded": np.int32(shaded),
        "covered_pixels": np.sum(depth < 1.0).astype(np.int32),
    }

    if config.mode == MODE_DEPTH_ONLY:
        color = np.zeros((config.height, config.width, 3), np.uint8)
        return Frame(color=color, depth=depth, stats=stats)

    rgb = shade_deferred(
        tri,
        tid,
        scene,
        config,
        eye=np.asarray(camera.eye, np.float32),
        shadow_depth=shadow_depth,
        light_viewproj=light_viewproj,
        xp=np,
        shade_hook=shade_hook,
        depth=depth,
    )
    if config.blend:
        rgb, blend_of = blend.composite_transparent(
            rgb, depth, tri, scene, config,
            np.asarray(camera.eye, np.float32), xp=np,
            shadow_depth=shadow_depth, light_viewproj=light_viewproj,
        )
        stats["blend_overflow"] = blend_of
    color = sm.resolve_u8(rgb, np)
    return Frame(color=color, depth=depth, stats=stats)
