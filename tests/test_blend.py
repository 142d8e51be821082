"""Alpha-blend pipeline state (SURVEY.md §2.1 "Pipeline state": blend axis).

The blended composite is shared xp-generic code (xr/shading/blend.py), so
the device pipeline must match the CPU oracle to <= 1 u8 LSB on a scene
with OVERLAPPING transparent objects over opaque Phong geometry.
"""

import dataclasses

import numpy as np

from xr.app.renderer import Renderer
from xr.core.types import MODE_FLAT, Camera, Lights, Material, Mesh, RenderConfig, Scene
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


def _pane_scene(alphas):
    """Two overlapping transparent panes, authored back-to-front. The FAR
    pane (authored first) extends to x=-30 so both of its triangles cross
    the guard-band plane and go through Sutherland-Hodgman — its records
    become fans at the END of the record buffer."""
    quads = [
        # (x0, x1, y0, y1, z)
        (-30.0, 0.8, -1.0, 1.0, -1.0),  # far pane, authored FIRST
        (-0.8, 0.8, -0.9, 0.9, 2.0),    # near pane
    ]
    pos, idx, mat = [], [], []
    for m, (x0, x1, y0, y1, z) in enumerate(quads):
        b = len(pos)
        pos += [(x0, y0, z), (x1, y0, z), (x1, y1, z), (x0, y1, z)]
        idx += [(b, b + 1, b + 2), (b, b + 2, b + 3)]
        mat += [m, m]
    pos = np.asarray(pos, np.float32)
    v = len(pos)
    mesh = Mesh(
        positions=pos,
        normals=np.tile(np.asarray([(0.0, 0.0, 1.0)], np.float32), (v, 1)),
        uvs=np.zeros((v, 2), np.float32),
        indices=np.asarray(idx, np.int32),
        material_id=np.asarray(mat, np.int32),
        transform_id=np.zeros(v, np.int32),
    )
    return Scene(
        mesh=mesh,
        materials=Material.table(
            [
                {"base_color": (1.0, 0.2, 0.1), "alpha": alphas[0]},
                {"base_color": (0.1, 0.3, 1.0), "alpha": alphas[1]},
            ]
        ),
        textures=None,
        lights=Lights.make(ambient=(1.0, 1.0, 1.0)),
        model_matrices=np.eye(4, dtype=np.float32)[None],
    )


def test_blend_order_survives_clipping():
    """Composite order is SOURCE-triangle order, not record order: a far
    transparent pane whose triangles get clipped (fan records at the end
    of the buffer) must still composite UNDER the near pane (ADVICE r3)."""
    cam = Camera(
        eye=np.asarray((0.0, 0.0, 5.0), np.float32),
        target=np.asarray((0.0, 0.0, 0.0), np.float32),
        up=np.asarray((0.0, 1.0, 0.0), np.float32),
        fov_y=np.asarray(np.deg2rad(60.0), np.float32),
        near=np.asarray(0.5, np.float32),
        far=np.asarray(50.0, np.float32),
    )
    cfg = RenderConfig(
        width=128, height=80, mode=MODE_FLAT, blend=True,
        cull_backfaces=False, raster_path="binned", bin_capacity=1024,
    )
    a0, a1 = 0.5, 0.4
    scene = _pane_scene((a0, a1))
    f = render_frame(scene, cam, cfg)
    assert int(f.stats["clip_overflow"]) == 0

    # standalone OPAQUE renders give each pane's fragment color + footprint
    def alone(m):
        s1 = _pane_scene((1.0, 1.0))
        keep = np.asarray(scene.mesh.material_id) == m
        mesh1 = s1.mesh.replace(
            indices=np.asarray(s1.mesh.indices)[keep],
            material_id=np.asarray(s1.mesh.material_id)[keep],
        )
        return render_frame(
            s1.replace(mesh=mesh1), cam,
            dataclasses.replace(cfg, blend=False),
        )

    f0, f1 = alone(0), alone(1)
    # the far pane really was clipped: 2 source tris -> more setup records
    assert int(f0.stats["tris_setup"]) > 2, "far pane did not hit the clipper"
    cov0 = np.asarray(f0.depth) < 1.0
    cov1 = np.asarray(f1.depth) < 1.0
    both = cov0 & cov1
    assert both.sum() > 100, "panes do not overlap on screen"

    # expected composite at doubly-covered pixels, in authored order:
    # out = (bg*(1-a0) + c0*a0)*(1-a1) + c1*a1   (bg = black)
    c0 = f0.color.astype(np.float64) / 255.0
    c1 = f1.color.astype(np.float64) / 255.0
    expect = (c0 * a0) * (1.0 - a1) + c1 * a1
    got = f.color.astype(np.float64) / 255.0
    err = np.abs(got - expect)[both].max()
    assert err <= 2.5 / 255.0, (
        f"clipped far pane composited out of order (max err {err * 255:.1f} LSB)"
    )

    # the wrong order is measurably different (the test has teeth)
    wrong = (c1 * a1) * (1.0 - a0) + c0 * a0
    assert np.abs(wrong - expect)[both].max() > 10.0 / 255.0


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
