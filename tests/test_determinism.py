"""Determinism: the renderer's real "race" is z-resolve order (SURVEY.md
§5.2b) — rendering the same frame twice, and with permuted triangle order,
must produce identical images (lexicographic (z, id) resolve is
order-independent; permutation only relabels ids, and no test triangles are
exactly coplanar)."""

import numpy as np

from xr.app.renderer import Renderer
from xr.cpu_ref import render_frame
from xr.scene.presets import config2_icospheres, small_preset

from tests.scenes import fixed_camera, random_scene


def _permuted(scene, perm):
    mesh = scene.mesh
    return scene.replace(
        mesh=mesh.replace(
            indices=np.asarray(mesh.indices)[perm],
            material_id=np.asarray(mesh.material_id)[perm],
        )
    )


def test_render_twice_identical():
    p = small_preset(config2_icospheres(), 96, 64, bin_capacity=8192)
    cam, mm = p.animate(0.1, np)
    scene = p.scene.replace(model_matrices=mm)
    r = Renderer(scene, p.config)
    f1 = r.readback(r.step(scene, cam))
    f2 = r.readback(r.step(scene, cam))
    assert (f1.color == f2.color).all()
    assert (f1.depth == f2.depth).all()


def test_triangle_order_invariance():
    rng = np.random.default_rng(3)
    scene = random_scene(rng, 16)
    cam = fixed_camera()
    from xr.core.types import MODE_GOURAUD, RenderConfig

    cfg = RenderConfig(width=64, height=48, mode=MODE_GOURAUD)
    perm = rng.permutation(scene.mesh.indices.shape[0])
    f_a = render_frame(scene, cam, cfg)
    f_b = render_frame(_permuted(scene, perm), cam, cfg)
    assert (f_a.color == f_b.color).all(), "oracle depends on triangle order"

    r_a = Renderer(scene, cfg)
    r_b = Renderer(_permuted(scene, perm), cfg)
    d_a = r_a.readback(r_a.step(scene, cam))
    d_b = r_b.readback(r_b.step(_permuted(scene, perm), cam))
    assert (d_a.color == d_b.color).all(), "device depends on triangle order"
    assert (d_a.depth == d_b.depth).all()


def test_medium_bin_class_bit_identical():
    """Hierarchical medium binning (RenderConfig.medium_*) must be a pure
    routing change: frames are bit-identical with the class enabled,
    disabled, and with a tiny capacity that forces overflow back to the
    large bucket."""
    import dataclasses

    import numpy as np

    from xr.app.renderer import Renderer
    from xr.scene.presets import config4_phong, small_preset

    # medium-heavy scene: big cubes/spheres at 256x128 with small tiles
    p = small_preset(
        config4_phong(), 256, 128, tile_h=16, tile_w=32,
        bin_capacity=8192, shadow_map_size=0, raster_path="binned",
    )
    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)

    frames = {}
    for name, over in (
        ("on", {}),
        ("off", {"medium_capacity": 0}),
        ("overflowing", {"medium_capacity": 4}),
        ("wide", {"medium_span": 16}),
    ):
        cfg = dataclasses.replace(p.config, **over)
        r = Renderer(scene, cfg)
        frames[name] = r.readback(r.step(scene, cam))

    base = frames["off"]
    assert int(base.stats["bin_overflow"]) == 0
    for name, f in frames.items():
        assert (f.color == base.color).all(), f"{name} color differs"
        assert (f.depth == base.depth).all(), f"{name} depth differs"
