"""Golden parity: the device pipeline (jnp, any backend) must match the CPU
oracle pixel-exact at 8-bit tolerance (BASELINE.json:5; SURVEY.md §4.2)."""

import dataclasses

import numpy as np
import pytest

from xr.app.renderer import Renderer
from xr.core.types import MODE_FLAT, MODE_GOURAUD, RenderConfig
from xr.cpu_ref import render_frame
from xr.scene.presets import config1_cube, config2_icospheres, small_preset

from tests.scenes import fixed_camera, random_scene


def _compare(oracle_frame, dev_frame, tol=1):
    dc = np.asarray(dev_frame.color)
    oc = np.asarray(oracle_frame.color)
    dz = np.asarray(dev_frame.depth)
    oz = np.asarray(oracle_frame.depth)
    # coverage must be IDENTICAL (integer raster semantics)
    assert ((dz == 1.0) == (oz == 1.0)).all(), "coverage mismatch"
    np.testing.assert_allclose(dz, oz, atol=1e-6)
    diff = np.abs(dc.astype(int) - oc.astype(int)).max()
    assert diff <= tol, f"color max abs err {diff} > {tol}"
    return diff


@pytest.mark.parametrize("path", ["brute", "binned"])
def test_config1_cube_parity(path):
    p = config1_cube()
    cfg = dataclasses.replace(
        p.config, width=128, height=128, raster_path=path, tile_h=32, tile_w=32
    )
    cam, mm = p.animate(0.7, np)
    scene = p.scene.replace(model_matrices=mm)
    of = render_frame(scene, cam, cfg)
    r = Renderer(scene, cfg)
    df = r.readback(r.step(scene, cam))
    assert int(df.stats["clip_overflow"]) == 0
    assert int(df.stats["bin_overflow"]) == 0
    _compare(of, df)


@pytest.mark.parametrize("mode", [MODE_FLAT, MODE_GOURAUD])
def test_random_scenes_parity(mode):
    rng = np.random.default_rng(7 + mode)
    scene = random_scene(rng, 12)
    cam = fixed_camera()
    cfg = RenderConfig(width=64, height=48, mode=mode)
    of = render_frame(scene, cam, cfg)
    r = Renderer(scene, cfg)
    df = r.readback(r.step(scene, cam))
    _compare(of, df)


def test_brute_vs_binned_bitexact():
    """The two jnp visibility paths must agree exactly (same semantics)."""
    p = small_preset(config2_icospheres(), 96, 64)
    cam, mm = p.animate(0.4, np)
    scene = p.scene.replace(model_matrices=mm)
    cfg_a = dataclasses.replace(p.config, width=96, height=64, raster_path="brute")
    cfg_b = dataclasses.replace(
        p.config, width=96, height=64, raster_path="binned", tile_h=16, tile_w=32,
        bin_capacity=2048,
    )
    ra = Renderer(scene, cfg_a)
    rb = Renderer(scene, cfg_b)
    fa = ra.readback(ra.step(scene, cam))
    fb = rb.readback(rb.step(scene, cam))
    assert int(fb.stats["bin_overflow"]) == 0
    assert (fa.color == fb.color).all()
    assert (fa.depth == fb.depth).all()


def test_gouraud_preset_parity_small():
    p = small_preset(config2_icospheres(), 120, 80, bin_capacity=8192)
    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)
    of = render_frame(scene, cam, p.config)
    r = Renderer(scene, p.config)
    df = r.readback(r.step(scene, cam))
    _compare(of, df)


@pytest.mark.parametrize("path", ["brute", "binned"])
def test_depth_test_off_painter_order(path):
    """depth_test=False must follow painter's order (last triangle wins) on
    the device paths exactly like the oracle."""
    rng = np.random.default_rng(31)
    scene = random_scene(rng, 10)
    cam = fixed_camera()
    cfg = RenderConfig(
        width=64, height=48, mode=MODE_FLAT, depth_test=False,
        raster_path=path, tile_h=16, tile_w=32, bin_capacity=2048,
    )
    of = render_frame(scene, cam, cfg)
    r = Renderer(scene, cfg)
    df = r.readback(r.step(scene, cam))
    assert ((df.depth == 1.0) == (of.depth == 1.0)).all(), "coverage mismatch"
    assert (df.color == of.color).all(), "painter order differs"
    np.testing.assert_allclose(df.depth, of.depth, atol=1e-6)


def test_identity_vs_compacted_layout():
    """Identity record layout (capacity >= T + clip_budget*7, geometry.py)
    must produce the same image as the compacted layout: record ids stay
    ascending in input order, so (z, id) ties resolve identically."""
    import jax.numpy as jnp

    from xr.core.types import MODE_TEXTURED
    from xr.pipeline.geometry import MAX_FAN, clip_capacity
    from xr.scene.presets import config3_terrain

    p = small_preset(config3_terrain(nx=24, nz=24), 96, 64)
    cam, mm = p.animate(0.7, np)
    scene = p.scene.replace(model_matrices=mm)
    T = scene.mesh.num_triangles
    assert p.config.mode == MODE_TEXTURED

    cfg_c = dataclasses.replace(p.config, clip_expand=0.9, clip_budget=64)
    assert clip_capacity(T, cfg_c) < T + 64 * MAX_FAN  # compacted branch
    cfg_i = dataclasses.replace(p.config, clip_expand=1.5, clip_budget=64)
    assert clip_capacity(T, cfg_i) >= T + 64 * MAX_FAN  # identity branch

    frames = {}
    for name, cfg in (("compact", cfg_c), ("identity", cfg_i)):
        r = Renderer(scene, cfg)
        df = r.readback(r.step(scene, cam))
        assert int(df.stats["clip_overflow"]) == 0
        assert int(df.stats["bin_overflow"]) == 0
        frames[name] = df
        # oracle (numpy) takes the same branch: full pixel-exact parity
        of = render_frame(scene, cam, cfg)
        _compare(of, df)

    np.testing.assert_array_equal(
        np.asarray(frames["compact"].color), np.asarray(frames["identity"].color)
    )
    np.testing.assert_array_equal(
        np.asarray(frames["compact"].depth), np.asarray(frames["identity"].depth)
    )


def test_bin_pairs2_bitexact():
    """bin_pairs=2 (lean pair emission + compacted quad class) produces
    bit-identical frames to the 4-slot emission on the jnp binned path —
    including with a tiny quad budget that forces overflow routing through
    the large bucket (duplicate candidates are resolve-benign)."""
    rng = np.random.default_rng(11)
    scene = random_scene(rng, 300)  # many spans at 16x16 tiles incl. 2x2
    cam = fixed_camera()
    base = RenderConfig(
        width=128, height=96, mode=MODE_GOURAUD, raster_path="binned",
        tile_h=16, tile_w=16, bin_capacity=2048, medium_span=3,
        medium_capacity=64,
    )
    r4 = Renderer(scene, base)
    f4 = r4.readback(r4.step(scene, cam))
    for quad_cap in (4096, 2):  # ample + overflow-forcing
        cfg2 = dataclasses.replace(
            base, bin_pairs=2, bin_quad_capacity=quad_cap
        )
        r2 = Renderer(scene, cfg2)
        f2 = r2.readback(r2.step(scene, cam))
        assert (f2.color == f4.color).all(), f"quad_cap={quad_cap}"
        assert (f2.depth == f4.depth).all(), f"quad_cap={quad_cap}"


def test_point_lights_device_parity():
    """Vertex-lit point lighting (flat centroid / Gouraud vertex / textured
    tint) is device == oracle across all three vertex-lit modes."""
    from xr.core.types import MODE_TEXTURED, Lights
    from xr.scene.presets import config3_terrain

    rng = np.random.default_rng(77)
    lights = Lights.make(
        dir_dirs=[(-0.4, -0.7, -0.6)],
        dir_colors=[(0.6, 0.55, 0.5)],
        pt_pos=[(0.0, 1.0, 1.0), (-1.0, -0.5, 2.0)],
        pt_colors=[(1.5, 0.4, 0.4), (0.3, 0.4, 1.8)],
        ambient=(0.1, 0.1, 0.1),
    )
    for mode in (MODE_FLAT, MODE_GOURAUD):
        scene = random_scene(rng, 10).replace(lights=lights)
        cam = fixed_camera()
        cfg = RenderConfig(width=64, height=48, mode=mode)
        of = render_frame(scene, cam, cfg)
        r = Renderer(scene, cfg)
        df = r.readback(r.step(scene, cam))
        _compare(of, df)

    # textured: point-lit tint through the full texture pipeline
    p = small_preset(config3_terrain(nx=24, nz=24), 96, 64, bin_capacity=4096)
    scene = p.scene.replace(lights=lights)
    cam, mm = p.animate(0.3, np)
    scene = scene.replace(model_matrices=mm)
    of = render_frame(scene, cam, p.config)
    r = Renderer(scene, p.config)
    df = r.readback(r.step(scene, cam))
    _compare(of, df)
