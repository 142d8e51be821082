"""Oracle-side ambiguity analysis: which pixels of a frame sit within f32
backend noise of a BINARY decision flip?

Coverage is exact int32 math shared by every backend (CLAUDE.md
invariant), so coverage never flips. z visibility uses f32 but preset
scenes enforce winner/runner-up gaps >=1e-4 (xr/scene/presets.py object
separation), 300x the measured device z-noise band (~3.6e-7, ISSUES.md).
The one remaining binary comparison is the SHADOW-MAP test
(shade_math.shadow_test): `z - bias > d` plus the floor() texel
selection, both driven by the interpolated world position — f32 values
that legitimately differ between numpy and the XLA-TPU lowering by ~1e-6
after the matmul/divide chain. At a shadow silhouette those flips change
a pixel by tens of LSB on a CORRECT pipeline; the set of at-risk pixels
is a property of the scene, not of the implementation.

`shadow_flip_risk` computes that set with the CPU oracle so device
parity tests can demand <=1 LSB on every well-conditioned pixel and
merely bound the count of ambiguous ones (tests/test_tpu_device_frames.py).
This mirrors how real GPU conformance suites treat shadow/MSAA edge
texels (implementation-defined at ULP scale).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from xr.core.types import MODE_DEPTH_ONLY, MODE_PHONG, RenderConfig, Scene


def shadow_flip_risk(
    scene: Scene,
    camera,
    config: RenderConfig,
    eps_z: float = 5e-5,
    eps_tex: float = 5e-3,
):
    """(H, W) bool — pixels whose shadow-test outcome can flip under f32
    backend noise: compare margin |(z - bias) - d| < eps_z, OR the sample
    coordinate within eps_tex texels of a texel edge whose neighbor texel
    flips the compare. Returns all-False when the config has no shadow
    pass. eps defaults: device z-noise is ~3.6e-7 per triangle, but the
    G-buffer world-position reconstruction (attr/w interpolation) that
    feeds the world->light matmul/divide chain amplifies it with scene
    depth — a REAL backend flip was measured at margin 3.511e-5 on the
    config6 courtyard at main-view depth 0.94 (round 5), so 1e-5 was too
    tight; 5e-5 covers the measured worst case with 1.4x slack while
    keeping exempt counts ~0.17% on that scene (caps in the device
    tests). Texel coords (magnitude ~shadow_map_size) carry ~1e-4-texel
    noise; 5e-3 gives ~50x.
    """
    H, W = config.height, config.width
    if config.mode != MODE_PHONG or config.shadow_map_size <= 0:
        return np.zeros((H, W), bool)

    from xr.cpu_ref.oracle import (
        light_matrices_for_scene,
        render_frame,
        visibility_bbox,
    )
    from xr.pipeline.geometry import geometry
    from xr.shading import blend as bl

    cap = {}

    def hook(color, scene_, mat_id, xp, frag=None):
        cap["world"] = frag.world
        cap["bg"] = frag.bg
        return color

    render_frame(scene, camera, config, shade_hook=hook)
    world = np.asarray(cap["world"]).reshape(H, W, 3)
    bg = np.asarray(cap["bg"]).reshape(H, W)

    lview, lproj = light_matrices_for_scene(scene)
    lvp = (lproj @ lview).astype(np.float32)
    s_cfg = dataclasses.replace(
        config,
        width=config.shadow_map_size,
        height=config.shadow_map_size,
        mode=MODE_DEPTH_ONLY,
        shadow_map_size=0,
    )
    s_tri = geometry(scene, lview, lproj, s_cfg, xp=np)
    if config.blend:
        s_tri = s_tri.replace(valid=bl.opaque_valid(s_tri, scene, np))
    _, s_zbuf = visibility_bbox(s_tri, s_cfg)
    sd = np.where(np.isinf(s_zbuf), 1.0, s_zbuf).astype(np.float32)

    # mirror shade_math.shadow_test's sample math exactly
    hs, ws = sd.shape
    p4 = np.concatenate(
        [world, np.ones(world.shape[:-1] + (1,), np.float32)], axis=-1
    )
    clip = p4 @ lvp.T
    w = np.maximum(clip[..., 3], 1e-12)
    ndc_x = clip[..., 0] / w
    ndc_y = clip[..., 1] / w
    z = clip[..., 2] / w
    sx = np.nan_to_num((ndc_x * 0.5 + 0.5) * ws)
    sy = np.nan_to_num((0.5 - ndc_y * 0.5) * hs)
    ix = np.clip(np.floor(sx), 0.0, ws - 1).astype(np.int32)
    iy = np.clip(np.floor(sy), 0.0, hs - 1).astype(np.int32)
    d = sd[iy, ix]
    inside = (
        (ndc_x >= -1.0) & (ndc_x <= 1.0) & (ndc_y >= -1.0) & (ndc_y <= 1.0)
        & (z >= 0.0) & (z <= 1.0)
    )
    act = inside & ~bg

    zb = z - config.shadow_bias
    risk = act & (np.abs(zb - d) < eps_z)

    # texel-selection flips: fractional coordinate near an edge AND the
    # texel across that edge flips the compare
    fx = sx - np.floor(sx)
    fy = sy - np.floor(sy)
    lit0 = zb <= d
    for dy, dx in [(0, -1), (0, 1), (-1, 0), (1, 0), (-1, -1), (-1, 1), (1, -1), (1, 1)]:
        near = np.ones_like(act)
        if dx:
            near &= (fx < eps_tex) if dx < 0 else (fx > 1.0 - eps_tex)
        if dy:
            near &= (fy < eps_tex) if dy < 0 else (fy > 1.0 - eps_tex)
        jx = np.clip(ix + dx, 0, ws - 1)
        jy = np.clip(iy + dy, 0, hs - 1)
        flips = (zb <= sd[jy, jx]) != lit0
        risk |= act & near & flips
    return risk
