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


# ---------------------------------------------------------------------------
# v2 (VERDICT r4 #5): textured + shadow-tested transparent fragments, and
# program size bounded in blend_capacity (lax.scan over chunks).
# ---------------------------------------------------------------------------

from xr.core import math3d as m3
from xr.core.types import MODE_PHONG
from xr.scene import procedural as proc
from xr.scene import texture as tx


def _rich_blend_scene(pane_tex=0):
    """Opaque ground + a tall opaque box west of a TEXTURED transparent
    pane: the box's shadow falls east onto the pane, so the pane has both
    lit and shadowed fragments, and its texture tints what shows through."""
    ground = proc.grid_plane(1, 1, size=12.0, mat=0)
    box = proc.transformed(
        proc.cube(1.0, mat=1),
        m3.translation((-2.2, 1.2, 0.0), np) @ m3.scaling((0.5, 2.4, 3.0), np),
    )
    pane = proc.transformed(
        proc.grid_plane(1, 1, size=4.0, mat=2),
        m3.translation((0.3, 1.0, 0.0), np),
    )
    mesh = proc.merge_meshes([ground, box, pane])
    mats = Material.table(
        [
            {"base_color": (0.75, 0.75, 0.78), "ks": 0.0},
            {"base_color": (0.8, 0.5, 0.3), "ks": 0.1},
            {"base_color": (1.0, 1.0, 1.0), "ks": 0.0, "alpha": 0.5,
             "tex_id": pane_tex},
        ]
    )
    return Scene(
        mesh=mesh,
        materials=mats,
        textures=tx.build_pyramid([tx.checkerboard(32, 4)]),
        lights=Lights.make(
            dir_dirs=[(1.0, -1.2, 0.15)],
            dir_colors=[(0.95, 0.95, 0.9)],
            ambient=(0.25, 0.25, 0.25),
        ),
        model_matrices=np.eye(4, dtype=np.float32)[None],
    )


def _rich_cam():
    return Camera(
        eye=np.asarray((2.5, 6.5, 6.5), np.float32),
        target=np.asarray((0.3, 0.6, 0.0), np.float32),
        up=np.asarray((0.0, 1.0, 0.0), np.float32),
        fov_y=np.asarray(np.deg2rad(55.0), np.float32),
        near=np.asarray(0.5, np.float32),
        far=np.asarray(60.0, np.float32),
    )


_RICH_CFG = RenderConfig(
    width=192, height=120, mode=MODE_PHONG, shadow_map_size=256,
    blend=True, bin_capacity=4096, raster_path="binned",
)


def _pane_footprint(scene, cam, cfg):
    """Screen footprint of the pane alone (rendered opaque), minus pixels
    the box covers in view."""
    mid = np.asarray(scene.mesh.material_id)
    only = lambda keep: scene.mesh.replace(
        indices=np.asarray(scene.mesh.indices)[keep],
        material_id=mid[keep],
    )
    opaque = dataclasses.replace(cfg, blend=False, shadow_map_size=0)
    s1 = scene.replace(
        mesh=only(mid == 2),
        materials=scene.materials.replace(
            alpha=np.ones_like(np.asarray(scene.materials.alpha))
        ),
    )
    pane_cov = render_frame(s1, cam, opaque).depth < 1.0
    box_cov = render_frame(scene.replace(mesh=only(mid == 1)), cam, opaque).depth < 1.0
    return pane_cov & ~box_cov


def test_blend_textured_pane():
    """Transparent fragments sample the material texture: a checkerboard
    pane must show spatially varying tint vs the identical untextured
    pane (VERDICT r4 #5 — the v1 scope gap)."""
    scene = _rich_blend_scene(pane_tex=0)
    plain = _rich_blend_scene(pane_tex=-1)
    cam = _rich_cam()
    ft = render_frame(scene, cam, _RICH_CFG)
    fp = render_frame(plain, cam, _RICH_CFG)
    assert int(ft.stats["blend_overflow"]) == 0
    foot = _pane_footprint(scene, cam, _RICH_CFG)
    assert foot.sum() > 300, "pane not visible in test framing"
    d = np.abs(ft.color.astype(int) - fp.color.astype(int)).max(axis=-1)
    frac = (d[foot] > 3).mean()
    assert frac > 0.2, (
        f"texture changes only {frac:.0%} of pane pixels — sampler inert"
    )
    # and it's a PATTERN, not a uniform tint: per-pixel deltas vary
    assert d[foot].std() > 2.0


def test_blend_shadowed_pane():
    """Transparent fragments receive the opaque shadow map: pane pixels in
    the box's shadow must be darker than the same pixels with the box
    removed (lit), at pixels where the box itself is out of view."""
    scene = _rich_blend_scene(pane_tex=-1)
    cam = _rich_cam()
    mid = np.asarray(scene.mesh.material_id)
    keep = mid != 1
    nobox = scene.replace(
        mesh=scene.mesh.replace(
            indices=np.asarray(scene.mesh.indices)[keep],
            material_id=mid[keep],
        )
    )
    f = render_frame(scene, cam, _RICH_CFG)
    f0 = render_frame(nobox, cam, _RICH_CFG)
    foot = _pane_footprint(scene, cam, _RICH_CFG)
    lum = f.color.astype(int).sum(axis=-1)
    lum0 = f0.color.astype(int).sum(axis=-1)
    darker = (lum0 - lum) > 30
    n = (darker & foot).sum()
    assert n > 100, (
        f"only {n} pane pixels darkened by the box shadow — transparent "
        "fragments are not shadow-tested"
    )


def test_blend_device_matches_oracle_rich():
    """The scan/cond composite (jnp) must equal the numpy oracle <= 1 LSB
    on the textured + shadowed pane scene."""
    scene = _rich_blend_scene(pane_tex=0)
    cam = _rich_cam()
    of = render_frame(scene, cam, _RICH_CFG)
    r = Renderer(scene, _RICH_CFG)
    df = r.readback(r.step(scene, cam))
    diff = np.abs(df.color.astype(int) - of.color.astype(int))
    bad = (diff.max(axis=-1) > 1).sum()
    assert bad <= df.color.shape[0] * df.color.shape[1] * 0.001, (
        f"{bad} pixels differ >1 LSB (max {diff.max()})"
    )


def test_blend_program_size_flat_in_capacity():
    """The composite is a lax.scan over chunks: its traced program must
    NOT grow with blend_capacity (v1 unrolled cap/chunk copies of the
    chunk body — minutes of XLA compile at capacity ~1024)."""
    import jax
    import jax.numpy as jnp

    from xr.pipeline.geometry import geometry
    from xr.shading.blend import composite_transparent

    scene = _rich_blend_scene(pane_tex=0)
    scene_j = jax.tree_util.tree_map(jnp.asarray, scene)
    cam = _rich_cam()

    sizes = {}
    for cap in (64, 1024):
        cfg = dataclasses.replace(_RICH_CFG, blend_capacity=cap)
        view, proj = m3.camera_matrices(cam, cfg.width / cfg.height, jnp)
        tri = geometry(scene_j, view, proj, cfg, xp=jnp)

        def f(color, depth):
            return composite_transparent(
                color, depth, tri, scene_j, cfg, jnp.asarray(cam.eye), xp=jnp
            )[0]

        color = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        depth = jnp.ones((cfg.height, cfg.width), jnp.float32)
        sizes[cap] = len(str(jax.make_jaxpr(f)(color, depth)))
    assert sizes[1024] < sizes[64] * 1.3, (
        f"composite program grows with blend_capacity: {sizes}"
    )
