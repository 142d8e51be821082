"""Measured capacity auto-sizing (VERDICT r4 #3; SURVEY.md §7.3.1).

The emission mirror in xr/app/autosize.py must count exactly what
bin_triangles builds, and a scene at any triangle count must render
overflow-free from autosized knobs with zero hand tuning.
"""

import dataclasses

import numpy as np
import pytest

from xr.app.autosize import autosize_config, measure_frame
from xr.core import math3d as m3
from xr.core.types import (
    MODE_TEXTURED,
    Camera,
    Lights,
    Material,
    RenderConfig,
    Scene,
)
from xr.scene import procedural as proc
from xr.scene import texture as tx


def _terrain_scene(n):
    mesh = proc.terrain(n, n, size=40.0, height=5.0, octaves=4, seed=3)
    return Scene(
        mesh=mesh,
        materials=Material.table([{"base_color": (1.0, 1.0, 1.0), "tex_id": 0}]),
        textures=tx.build_pyramid([tx.checkerboard(64, 8)]),
        lights=Lights.make(
            dir_dirs=[(-0.4, -0.8, -0.45)], dir_colors=[(1.0, 1.0, 1.0)]
        ),
        model_matrices=np.eye(4, dtype=np.float32)[None],
    )


def _cam():
    return Camera(
        eye=np.asarray((0.0, 14.0, 26.0), np.float32),
        target=np.asarray((0.0, 0.0, 0.0), np.float32),
        up=np.asarray((0.0, 1.0, 0.0), np.float32),
        fov_y=np.asarray(np.deg2rad(60.0), np.float32),
        near=np.asarray(0.5, np.float32),
        far=np.asarray(120.0, np.float32),
    )


_CFG = RenderConfig(
    width=320, height=176, mode=MODE_TEXTURED,
    tile_h=32, tile_w=128, raster_path="binned", backend="jnp",
)


def test_mirror_matches_real_bins():
    """measure_frame's counts must equal BinResult's raw occupancies — the
    mirror shares _tile_ranges/span_classes with bin_triangles, and this
    test pins the emission rules it re-implements."""
    import jax
    import jax.numpy as jnp

    from xr.pipeline.geometry import geometry
    from xr.raster.jnp_backend import bin_triangles

    scene = _terrain_scene(72)  # ~10k tris, spans many tiles
    cam = _cam()
    # medium capacity large enough that every eligible tri is selected
    # (the mirror counts ALL eligible; the real bins cap at capacity)
    cfg = dataclasses.replace(_CFG, medium_capacity=4096)
    m = measure_frame(scene, cam, cfg)

    scene_j = jax.tree_util.tree_map(jnp.asarray, scene)
    view, proj = m3.camera_matrices(cam, cfg.width / cfg.height, jnp)
    from xr.pipeline.geometry import MAX_FAN, clip_budget

    T = scene.mesh.num_triangles
    capacity = T + clip_budget(T, cfg) * MAX_FAN
    tri = geometry(scene_j, view, proj, cfg, xp=jnp, capacity=capacity)
    b = bin_triangles(tri, cfg)

    assert int(np.asarray(b.raw_counts).sum()) == m["total_entries"]
    assert int(np.asarray(b.raw_counts).max()) == m["per_tile_max"]
    assert int(np.asarray(b.large_count)) == min(m["large"], cfg.large_capacity)


@pytest.mark.parametrize("n", [72, 224])  # ~10k / ~100k triangles
def test_autosize_renders_overflow_free(n):
    """Zero hand tuning: autosized knobs render strict (overflow raises in
    readback) at 10k and 100k triangles."""
    import jax
    import jax.numpy as jnp

    from xr.app.renderer import Renderer

    scene = _terrain_scene(n)
    cam = _cam()
    # start from knobs that are WRONG for the scene (tiny bins, tight clip)
    bad = dataclasses.replace(
        _CFG, bin_capacity=8, large_capacity=8, clip_budget=8,
        clip_expand=0.01,
    )
    scene_j = jax.tree_util.tree_map(jnp.asarray, scene)
    r = Renderer(scene_j, bad, autosize_cameras=[cam])
    assert r.config.bin_capacity > 8
    f = r.readback(r.step(scene_j, cam))  # strict: raises on any overflow
    assert int(f.stats["bin_overflow"]) == 0
    assert int(f.stats["clip_overflow"]) == 0
    assert (np.asarray(f.depth) < 1.0).sum() > 1000  # actually drew things


def test_autosize_scales_to_1m_tris():
    """The dry pass itself must handle the config-5 scale (measure-only:
    a 1M-tri CPU render is minutes; the caps just have to be consistent)."""
    scene = _terrain_scene(708)  # ~1M tris
    cam = _cam()
    cfg = autosize_config(scene, [_cam()], _CFG, margin=1.3)
    m = measure_frame(scene, cam, _CFG)
    from xr.pipeline.geometry import clip_capacity

    assert clip_capacity(scene.mesh.num_triangles, cfg) >= m["live_records"]
    assert cfg.bin_capacity >= m["per_tile_max"]
    assert cfg.stream_entry_cap >= m["total_entries"]
    assert cfg.clip_budget >= m["crossing"]
    assert cfg.large_capacity >= m["large"]


def test_stream_sizing_bounded_by_source_count():
    """Identity record layout (capacity >> live tris) must NOT inflate the
    streaming kernel's block count: sizing follows TriBuf.num_src
    (VERDICT r4 #3 — the old warning path is gone because the hazard is)."""
    from xr.pipeline.geometry import clip_capacity, identity_layout
    from xr.raster.pallas_stream import stream_blocks

    T = 2000
    cfg = dataclasses.replace(_CFG, clip_expand=30.0)  # force identity
    C = clip_capacity(T, cfg)
    assert identity_layout(T, cfg, C)
    nb_src = stream_blocks(cfg, C, num_src=T)
    nb_cap = stream_blocks(cfg, C, num_src=0)
    assert nb_src < nb_cap / 3, (nb_src, nb_cap)

    # and the identity-layout render is still correct + overflow-free
    # through the stream kernel (interpret mode)
    import jax
    import jax.numpy as jnp

    from xr.app.renderer import Renderer

    scene = _terrain_scene(31)  # ~1.9k tris
    scene_j = jax.tree_util.tree_map(jnp.asarray, scene)
    cam = _cam()
    base = dataclasses.replace(_CFG, raster_path="binned", bin_capacity=4096)
    r0 = Renderer(scene_j, base)
    f0 = r0.readback(r0.step(scene_j, cam))
    ident = dataclasses.replace(
        base, clip_expand=30.0, backend="pallas_stream", pallas_interpret=True
    )
    r1 = Renderer(scene_j, ident)
    f1 = r1.readback(r1.step(scene_j, cam))
    assert (f0.color == f1.color).all()
    assert (f0.depth == f1.depth).all()
