"""Parity tests for the textured (mipmapped) and Phong+shadow paths
(configs 3-4, BASELINE.json:9-10)."""

import dataclasses

import numpy as np

from xr.app.renderer import Renderer
from xr.cpu_ref import render_frame
from xr.scene.presets import config3_terrain, config4_phong, small_preset


def _run_pair(p, t=0.0):
    cam, mm = p.animate(t, np)
    scene = p.scene.replace(model_matrices=mm)
    of = render_frame(scene, cam, p.config)
    r = Renderer(scene, p.config)
    df = r.readback(r.step(scene, cam))
    return of, df


def test_textured_terrain_parity():
    p = small_preset(config3_terrain(nx=24, nz=24), 128, 96, bin_capacity=4096)
    of, df = _run_pair(p, t=0.3)
    assert ((df.depth == 1.0) == (of.depth == 1.0)).all(), "coverage mismatch"
    np.testing.assert_allclose(df.depth, of.depth, atol=1e-6)
    diff = np.abs(df.color.astype(int) - of.color.astype(int))
    assert diff.max() <= 1, f"textured color max abs err {diff.max()}"
    # the scene must actually exercise texturing: colors vary across surface
    assert len(np.unique(df.color.reshape(-1, 3), axis=0)) > 50


def test_textured_mips_engage():
    """Distant terrain must sample coarser mips than near terrain —
    asserted END-TO-END through a rendered frame: rebuild the scene's
    texture pyramid with every level >= 1 dyed pure red and render. If
    per-pixel LOD engages, far (horizon) rows turn red while the nearest
    rows keep the base checker; if sampling were stuck on level 0 both
    frames would be identical."""
    from xr.core.types import TexturePyramid
    from xr.scene.texture import _pack_quads

    p = small_preset(config3_terrain(nx=24, nz=24), 160, 120, bin_capacity=4096)
    pyr = p.scene.textures
    S, L = pyr.base_size, pyr.num_levels
    base = np.asarray(pyr.data[0, : S * S]).reshape(S, S, 3)
    red = np.broadcast_to(np.float32([1.0, 0.0, 0.0]), base.shape)
    levels = [base] + [
        np.ascontiguousarray(red[: max(S >> k, 1), : max(S >> k, 1)])
        for k in range(1, L)
    ]
    red_pyr = TexturePyramid(
        data=np.concatenate([lv.reshape(-1, 3) for lv in levels], axis=0)[None],
        quads=_pack_quads(levels)[None],
        base_size=S,
        num_levels=L,
    )

    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)
    r = Renderer(scene, p.config)
    plain = r.readback(r.step(scene, cam))
    scene_red = scene.replace(textures=red_pyr)
    dyed = r.readback(r.step(scene_red, cam))

    assert (plain.color != dyed.color).any(), "mip levels never sampled"
    cov_rows = np.where((dyed.depth < 1.0).any(axis=1))[0]
    n = max(len(cov_rows) // 5, 1)
    far, near = cov_rows[:n], cov_rows[-n:]  # horizon rows first (top)

    def redness(rows):
        c = dyed.color[rows].astype(np.float32)
        m = (dyed.depth[rows] < 1.0)
        return float((c[..., 0] - c[..., 2])[m].mean())

    assert redness(far) > redness(near) + 20.0, (
        "far rows are not redder than near rows — coarser mips are not "
        f"engaging with distance (far {redness(far):.1f}, near "
        f"{redness(near):.1f})"
    )
    assert redness(far) > 0.0


def test_phong_shadow_parity():
    p = small_preset(
        config4_phong(), 160, 100, bin_capacity=8192, shadow_map_size=128
    )
    of, df = _run_pair(p, t=0.0)
    assert ((df.depth == 1.0) == (of.depth == 1.0)).all(), "coverage mismatch"
    diff = np.abs(df.color.astype(int) - of.color.astype(int))
    # shadow compare is a hard boundary; allow a handful of edge pixels to
    # differ, but the bulk must be <= 1 LSB
    bad = (diff.max(axis=-1) > 1).sum()
    assert bad <= df.color.shape[0] * df.color.shape[1] * 0.001, (
        f"{bad} pixels differ >1 LSB (max {diff.max()})"
    )


def test_phong_shadow_darkens():
    """With the shadow pass on, some ground pixels behind objects must be
    darker than with shadows off (the depth pre-pass actually bites)."""
    p = small_preset(
        config4_phong(), 160, 100, bin_capacity=8192, shadow_map_size=256
    )
    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)
    with_shadow = render_frame(scene, cam, p.config)
    cfg_off = dataclasses.replace(p.config, shadow_map_size=0)
    without = render_frame(scene, cam, cfg_off)
    w = with_shadow.color.astype(int).sum(axis=-1)
    wo = without.color.astype(int).sum(axis=-1)
    darker = (wo - w) > 30
    assert darker.sum() > 20, "no shadowed pixels found"


def test_only_light0_casts_shadows():
    """SHADOW CONTRACT (shade_math.shade_phong): the shadow factor
    multiplies ONLY directional light 0's contribution. With light 0's
    color zeroed, toggling the shadow pass must not change a single pixel;
    with light 0 lit, it must."""
    p = small_preset(
        config4_phong(), 160, 100, bin_capacity=8192, shadow_map_size=256
    )
    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)
    cfg_off = dataclasses.replace(p.config, shadow_map_size=0)

    lights = scene.lights
    dc = np.asarray(lights.dir_colors, np.float32).copy()
    dc[0] = 0.0
    scene_l0_dark = scene.replace(lights=lights.replace(dir_colors=dc))

    on = render_frame(scene_l0_dark, cam, p.config)
    off = render_frame(scene_l0_dark, cam, cfg_off)
    assert (on.color == off.color).all(), (
        "shadow pass changed pixels lit only by non-shadow-casting lights"
    )

    on2 = render_frame(scene, cam, p.config)
    off2 = render_frame(scene, cam, cfg_off)
    assert (on2.color != off2.color).any(), "shadow pass had no effect at all"


def test_record_pack_bits_value_identical():
    """record_pack='bits' and 'value' are bit-identical on non-mangling
    backends (the CPU jnp path here); 'bits' stays selectable solely as
    the device A/B axis for the TPU denormal/NaN bitcast hazard
    (RenderConfig.record_pack, ISSUES.md)."""
    p = small_preset(config4_phong(), 96, 64)
    cam, mm = p.animate(0.2, np)
    scene = p.scene.replace(model_matrices=mm)
    frames = {}
    for pack in ("value", "bits", "split"):
        cfg = dataclasses.replace(p.config, record_pack=pack)
        r = Renderer(scene, cfg)
        frames[pack] = r.readback(r.step(scene, cam))
    for pack in ("bits", "split"):
        assert (frames["value"].color == frames[pack].color).all(), pack
        assert (frames["value"].depth == frames[pack].depth).all(), pack


def test_split_and_recompute_axes_identical():
    """The scale-regime fetch axes (RenderConfig.record_split, tex_split,
    lod_fetch='recompute') are bit-identical to the defaults on the jnp
    device path — they reshape GATHERS, never values (built for >~300k-row
    tables where the single gather flips to element rate; PERF.md)."""
    p = small_preset(config3_terrain(nx=48, nz=48), 128, 96, bin_capacity=8192)
    cam, mm = p.animate(0.3, np)
    scene = p.scene.replace(model_matrices=mm)
    base = Renderer(scene, p.config)
    ref = base.readback(base.step(scene, cam))
    for name, over in (
        ("record_split2", dict(record_split=2)),
        ("record_split3", dict(record_split=3)),
        ("tex_split2", dict(tex_split=2)),
        ("lod_recompute", dict(lod_fetch="recompute")),
        ("mip_closed", dict(mip_math="closed")),
        ("percorner", dict(corner_fetch="percorner")),
        ("all", dict(record_split=2, tex_split=2, lod_fetch="recompute",
                     mip_math="closed", corner_fetch="percorner")),
    ):
        cfg = dataclasses.replace(p.config, **over)
        r = Renderer(scene, cfg)
        f = r.readback(r.step(scene, cam))
        assert (f.color == ref.color).all(), name
        assert (f.depth == ref.depth).all(), name

    # the ORACLE is also unchanged by the axes (numpy takes the direct
    # gather; lod recompute runs the same expressions)
    of = render_frame(
        scene, cam,
        dataclasses.replace(
            p.config, record_split=2, lod_fetch="recompute",
            mip_math="closed",
        ),
    )
    of0 = render_frame(scene, cam, p.config)
    assert (of.color == of0.color).all()

    # closed-form mip math is impossible for per-texture ragged chains —
    # must fail loudly, never silently fall back (SURVEY.md §7.3.1)
    import pytest

    from xr.core.shade_math import sample_trilinear
    from xr.scene.texture import build_ragged_pyramid, checkerboard

    rag = build_ragged_pyramid([checkerboard(16), checkerboard(8)])
    with pytest.raises(ValueError, match="mip_math"):
        sample_trilinear(
            rag, np.zeros(4, np.int32),
            np.zeros(4, np.float32), np.zeros(4, np.float32),
            np.zeros(4, np.float32), np, mip_math="closed",
        )


def test_split_row_gather_oversplit():
    """split > needed slices (an empty trailing row range) must not crash
    at trace time and must stay exact (code-review r4 finding)."""
    import jax.numpy as jnp

    from xr.core.shade_math import split_row_gather

    t = np.arange(15, dtype=np.float32).reshape(5, 3)
    idx = np.asarray([0, 4, 2, 3, 1, 4])
    for split in (2, 3, 4, 9):
        out = split_row_gather(jnp.asarray(t), jnp.asarray(idx), split, jnp)
        assert (np.asarray(out) == t[idx]).all(), split
