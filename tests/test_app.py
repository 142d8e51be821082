"""App-layer tests: example runner CLI, validation, serialization, prof."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from xr.app import validate
from xr.core import serialize
from xr.core.types import RenderConfig
from xr.scene.presets import config1_cube, small_preset

from tests.scenes import fixed_camera, random_scene


def test_example_runner_cli(tmp_path):
    """Drive the reference frame loop end-to-end through the CLI (oracle
    mode keeps it fast and jax-platform-independent)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [
            sys.executable, "examples/run.py", "config1",
            "--frames", "2", "--oracle",
            "--width", "64", "--height", "64",
            "--out", str(tmp_path), "--dump-every", "1",
        ],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    done = [l for l in lines if l.get("event") == "done"][0]
    assert done["frames"] == 2
    assert done["stats"]["clip_overflow"] == 0
    assert os.path.exists(tmp_path / "config1_final.png")
    assert os.path.exists(tmp_path / "config1_0000.png")


def test_validate_scene_catches_bad_indices():
    rng = np.random.default_rng(0)
    scene = random_scene(rng, 4)
    validate.check_scene(scene)  # good scene passes
    bad = scene.replace(
        mesh=scene.mesh.replace(
            indices=np.array([[0, 1, 999]], np.int32),
            material_id=np.zeros(1, np.int32),
        )
    )
    with pytest.raises(ValueError, match="indices out of range"):
        validate.check_scene(bad)


def test_validate_frame():
    from xr.cpu_ref import render_frame

    p = small_preset(config1_cube(), 48, 48)
    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)
    frame = render_frame(scene, cam, p.config)
    validate.check_frame(frame, p.config)


def test_scene_roundtrip(tmp_path):
    from xr.scene.presets import config3_terrain

    p = small_preset(config3_terrain(nx=8, nz=8), 32, 32)
    path = str(tmp_path / "scene.npz")
    serialize.save_scene(path, p.scene)
    back = serialize.load_scene(path)
    np.testing.assert_array_equal(back.mesh.positions, p.scene.mesh.positions)
    np.testing.assert_array_equal(back.textures.quads, p.scene.textures.quads)
    assert back.textures.base_size == p.scene.textures.base_size

    cams, mats = serialize.bake_camera_path(p.animate, [0.0, 0.5, 1.0])
    cpath = str(tmp_path / "cams.npz")
    serialize.save_camera_path(cpath, cams)
    back_cams = serialize.load_camera_path(cpath)
    assert len(back_cams) == 3
    np.testing.assert_allclose(back_cams[1].eye, np.asarray(cams[1].eye))


def test_frame_timer():
    from xr.prof import FrameTimer

    t = FrameTimer()
    with t.section("frame"):
        pass
    rep = json.loads(t.report(pixels_per_frame=100))
    assert "fps" in rep and "frame" in rep


def test_clip_budget_overflow_is_loud():
    """Tiny clip budget + many crossing tris must raise in strict readback
    (SURVEY §7.3.1: fixed capacity + fail loudly)."""
    import dataclasses

    from xr.app.renderer import Renderer
    from xr.core.types import MODE_FLAT

    rng = np.random.default_rng(5)
    scene = random_scene(rng, 64)
    # camera very close so most tris cross the near plane
    cam = fixed_camera().replace(
        eye=np.asarray((0.0, 0.0, 0.6), np.float32),
        near=np.asarray(0.5, np.float32),
    )
    cfg = RenderConfig(width=32, height=32, mode=MODE_FLAT, clip_budget=2)
    r = Renderer(scene, cfg)
    f = r.step(scene, cam)
    if int(np.asarray(f.stats["clip_overflow"])) > 0:
        with pytest.raises(RuntimeError, match="clip_overflow"):
            r.readback(f)
    else:
        pytest.skip("scene did not overflow the clip budget")


def test_shade_hook_custom_pixel_stage():
    """The shade_hook custom pixel-shader stage (render_step): applied to
    the pre-background linear color, traced into the frame program, and
    identical between the device pipeline and the CPU oracle (the hook is
    the reference's editable-HLSL analog, SURVEY.md §3.4)."""
    from xr.app.renderer import Renderer
    from xr.cpu_ref import render_frame
    from xr.scene.presets import config3_terrain, small_preset

    p = small_preset(config3_terrain(nx=16, nz=16), 96, 64)
    cam, mm = p.animate(0.6, np)
    scene = p.scene.replace(model_matrices=mm)

    def hook(color, scene_, mat_id, xp):
        assert mat_id is not None  # textured mode has per-pixel materials
        return color[..., ::-1] * 0.5  # swap channels, darken

    plain = Renderer(scene, p.config).readback(
        Renderer(scene, p.config).step(scene, cam)
    )
    hooked = Renderer(scene, p.config, shade_hook=hook).readback(
        Renderer(scene, p.config, shade_hook=hook).step(scene, cam)
    )
    # covered pixels: hooked == post-processed plain (up to u8 rounding);
    # exclude pixels the plain render clipped at 255 (their pre-resolve
    # linear value is unrecoverable from the u8 output)
    cov = (np.asarray(plain.depth) < 1.0) & (
        np.asarray(plain.color) < 255
    ).all(-1)
    want = np.floor(
        np.clip(np.asarray(plain.color)[..., ::-1] / 255.0 * 0.5, 0, 1) * 255.0
        + 0.5
    )
    got = np.asarray(hooked.color).astype(np.float64)
    assert np.abs(got[cov] - want[cov]).max() <= 1.0
    # background unchanged (the hook applies pre-background only)
    bg = np.asarray(plain.depth) >= 1.0
    assert (np.asarray(hooked.color)[bg] == np.asarray(plain.color)[bg]).all()

    # oracle parity with the same hook
    of = render_frame(scene, cam, p.config, shade_hook=hook)
    diff = np.abs(
        np.asarray(of.color).astype(int) - np.asarray(hooked.color).astype(int)
    ).max()
    assert diff <= 1


def test_shade_hook_frag_context():
    """Rich shade_hooks declaring a `frag` parameter receive the per-pixel
    G-buffer (depth/uv/world/normal per mode) — enough to express fog or a
    normal-visualizer, not just color grading (the reference's pixel shader
    sees its interstage registers)."""
    import numpy as np

    from xr.cpu_ref import render_frame
    from xr.scene.presets import config4_phong, small_preset

    p = small_preset(config4_phong(), 96, 64, bin_capacity=8192,
                     shadow_map_size=0)
    cam, mm = p.animate(0.0, np)
    scene = p.scene.replace(model_matrices=mm)

    seen = {}

    def fog_hook(color, scene_, mat_id, xp, frag=None):
        assert frag is not None and frag.depth is not None
        assert frag.world is not None and frag.normal is not None
        assert frag.uv is not None
        seen["ok"] = True
        f = xp.clip(frag.depth * 1.5, 0.0, 1.0)[..., None]
        return color * (1.0 - f) + f  # fog to white with depth

    plain = render_frame(scene, cam, p.config)
    fogged = render_frame(scene, cam, p.config, shade_hook=fog_hook)
    assert seen.get("ok")
    assert (fogged.color != plain.color).any()
    # far pixels are fogged brighter relative to the plain render
    cov = plain.depth < 1.0
    far = cov & (plain.depth > np.median(plain.depth[cov]))
    assert (
        fogged.color[far].astype(int).sum()
        > plain.color[far].astype(int).sum()
    )

    # device parity through the jitted path (shared code)
    import jax

    from xr.app.renderer import Renderer

    scene_j = jax.tree_util.tree_map(np.asarray, scene)
    r = Renderer(scene_j, p.config, shade_hook=fog_hook)
    df = r.readback(r.step(scene_j, cam))
    diff = np.abs(df.color.astype(int) - fogged.color.astype(int))
    assert diff.max() <= 1
