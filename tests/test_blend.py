"""Alpha-blend pipeline state (SURVEY.md §2.1 "Pipeline state": blend axis).

The blended composite is shared xp-generic code (xr/shading/blend.py), so
the device pipeline must match the CPU oracle to <= 1 u8 LSB on a scene
with OVERLAPPING transparent objects over opaque Phong geometry.
"""

import dataclasses

import numpy as np

from xr.app.renderer import Renderer
from xr.cpu_ref import render_frame
from xr.scene.presets import config4_blend, small_preset


def _pair(p, t=0.0):
    cam, mm = p.animate(t, np)
    scene = p.scene.replace(model_matrices=mm)
    of = render_frame(scene, cam, p.config)
    r = Renderer(scene, p.config)
    df = r.readback(r.step(scene, cam))
    return of, df


def test_blend_device_matches_oracle():
    p = small_preset(
        config4_blend(), 160, 100, bin_capacity=8192, shadow_map_size=128
    )
    of, df = _pair(p)
    assert int(df.stats["blend_overflow"]) == 0
    diff = np.abs(df.color.astype(int) - of.color.astype(int))
    bad = (diff.max(axis=-1) > 1).sum()
    # shadow + blend boundaries are hard edges; allow a handful of pixels
    assert bad <= df.color.shape[0] * df.color.shape[1] * 0.001, (
        f"{bad} pixels differ >1 LSB (max {diff.max()})"
    )


def test_blend_semantics():
    """Transparent panes must tint (not replace) what's behind them, must
    not write depth, and overlapping panes must composite BOTH layers."""
    p = small_preset(
        config4_blend(), 160, 100, bin_capacity=8192, shadow_map_size=0
    )
    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)
    blended = render_frame(scene, cam, p.config)
    opaque_only = render_frame(
        scene, cam, dataclasses.replace(p.config, blend=False, shadow_map_size=0)
    )
    # depth buffers are identical: blended fragments are read-only vs z.
    # (with blend OFF the panes rasterize opaquely and DO write depth)
    alpha = np.asarray(scene.materials.alpha)
    tmat = np.where(alpha < 1.0)[0]
    assert tmat.size == 2
    no_panes = scene.replace(
        materials=scene.materials.replace(
            base_color=np.asarray(scene.materials.base_color)
        )
    )
    cfg_off = dataclasses.replace(p.config, blend=False, shadow_map_size=0)
    # remove panes entirely for the depth comparison
    keep = ~np.isin(np.asarray(scene.mesh.material_id), tmat)
    mesh = scene.mesh
    mesh_np = mesh.replace(
        indices=np.asarray(mesh.indices)[keep],
        material_id=np.asarray(mesh.material_id)[keep],
    )
    panes_removed = render_frame(scene.replace(mesh=mesh_np), cam, cfg_off)
    assert (blended.depth == panes_removed.depth).all(), (
        "blend pass wrote the depth buffer"
    )

    # some pixels must show BOTH pane tints stacked: find pixels covered by
    # the two panes (render each pane alone opaquely to get its footprint)
    def footprint(mat):
        keep1 = np.asarray(mesh.material_id) == mat
        m1 = mesh.replace(
            indices=np.asarray(mesh.indices)[keep1],
            material_id=np.asarray(mesh.material_id)[keep1],
        )
        f = render_frame(scene.replace(mesh=m1), cam, cfg_off)
        return f.depth < 1.0

    both = footprint(tmat[0]) & footprint(tmat[1])
    assert both.sum() > 20, "test scene: panes do not overlap on screen"
    ch = blended.color.astype(int)
    base = panes_removed.color.astype(int)
    assert (np.abs(ch - base)[both].max(axis=-1) > 2).mean() > 0.9, (
        "overlap region not visibly tinted"
    )
    # single-coverage region differs from double-coverage region even over
    # the same background class (two compositing layers vs one)
    only_hi = footprint(tmat[1]) & ~footprint(tmat[0])
    assert only_hi.sum() > 20
    # blue pane alone tints toward blue; the stacked region carries the red
    # pane's contribution as well
    mean_both = ch[both].mean(axis=0)
    mean_hi = ch[only_hi].mean(axis=0)
    assert abs(mean_both - mean_hi).max() > 2.0


def test_blend_order_matters():
    """Swapping the two panes' record order changes the composite (the
    back-to-front contract is real, not commutative)."""
    p = small_preset(
        config4_blend(), 128, 80, bin_capacity=8192, shadow_map_size=0
    )
    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)
    a = render_frame(scene, cam, p.config)

    # swap the panes' ALPHAS (keeps colors/geometry; composite order of
    # unequal alphas is not commutative)
    al = np.asarray(scene.materials.alpha).copy()
    i, j = np.where(al < 1.0)[0]
    al[i], al[j] = al[j], al[i]
    b = render_frame(
        scene.replace(materials=scene.materials.replace(alpha=al)), cam, p.config
    )
    assert (a.color != b.color).any()
