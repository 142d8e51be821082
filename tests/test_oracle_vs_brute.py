"""Oracle validation against the independent scalar rasterizer
(SURVEY.md §4.2: oracle vs "brutally simple per-pixel point-in-triangle
scalar loop on random small scenes")."""

import numpy as np
import pytest

from xr.core.types import (
    MODE_FLAT,
    MODE_GOURAUD,
    Camera,
    Lights,
    Material,
    Mesh,
    RenderConfig,
    Scene,
)
from xr.cpu_ref import brute, oracle


def _random_scene(rng, num_tris, mode):
    """Random triangles fully inside the frustum of a fixed camera."""
    v = num_tris * 3
    pos = np.stack(
        [
            rng.uniform(-1.4, 1.4, v),
            rng.uniform(-1.4, 1.4, v),
            rng.uniform(-1.0, 1.0, v),
        ],
        axis=1,
    ).astype(np.float32)
    nrm = rng.standard_normal((v, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    mesh = Mesh(
        positions=pos,
        normals=nrm,
        uvs=rng.uniform(0, 1, (v, 2)).astype(np.float32),
        indices=np.arange(v, dtype=np.int32).reshape(-1, 3),
        material_id=(np.arange(num_tris) % 2).astype(np.int32),
        transform_id=np.zeros(v, np.int32),
    )
    scene = Scene(
        mesh=mesh,
        materials=Material.table(
            [{"base_color": (0.9, 0.4, 0.3)}, {"base_color": (0.3, 0.6, 0.9)}]
        ),
        textures=None,
        lights=Lights.make(
            dir_dirs=[(-0.4, -0.7, -0.6)],
            dir_colors=[(1.0, 0.95, 0.9)],
            ambient=(0.15, 0.15, 0.15),
        ),
        model_matrices=np.eye(4, dtype=np.float32)[None],
    )
    camera = Camera(
        eye=np.asarray((0.0, 0.0, 5.0), np.float32),
        target=np.asarray((0.0, 0.0, 0.0), np.float32),
        up=np.asarray((0.0, 1.0, 0.0), np.float32),
        fov_y=np.asarray(np.deg2rad(60.0), np.float32),
        near=np.asarray(0.5, np.float32),
        far=np.asarray(20.0, np.float32),
    )
    return scene, camera


@pytest.mark.parametrize("mode", [MODE_FLAT, MODE_GOURAUD])
@pytest.mark.parametrize("cull", [True, False])
def test_oracle_matches_brute(mode, cull):
    rng = np.random.default_rng(42 + mode * 10 + cull)
    for trial in range(4):
        scene, camera = _random_scene(rng, num_tris=8, mode=mode)
        config = RenderConfig(
            width=48, height=40, mode=mode, cull_backfaces=cull
        )
        frame = oracle.render_frame(scene, camera, config)
        b_color, b_depth = brute.render(scene, camera, config)

        # coverage (which pixels are background) must be IDENTICAL
        o_bg = (frame.depth == 1.0) & (frame.color == 0).all(axis=-1)
        b_bg = (b_depth == 1.0) & (b_color == 0).all(axis=-1)
        assert (o_bg == b_bg).all(), f"coverage mismatch (trial {trial})"

        # depth: brute interpolates in f64; allow tiny tolerance
        np.testing.assert_allclose(frame.depth, b_depth, atol=1e-5)

        # color: identical shading formulas; brute interpolates gouraud in
        # f64 -> allow 2 LSB
        diff = np.abs(frame.color.astype(int) - b_color.astype(int))
        assert diff.max() <= 2, f"color diff {diff.max()} (trial {trial})"


def test_oracle_depth_test_occlusion():
    """Nearer triangle must win regardless of draw order."""
    pos = np.array(
        [
            # far triangle (z=0), big
            [-1.2, -1.2, 0.0], [1.2, -1.2, 0.0], [0.0, 1.4, 0.0],
            # near triangle (z=1, closer to camera at +5z), small
            [-0.5, -0.5, 1.0], [0.5, -0.5, 1.0], [0.0, 0.6, 1.0],
        ],
        np.float32,
    )
    nrm = np.tile(np.array([0, 0, 1], np.float32), (6, 1))
    for order, first_wins in (([0, 1], False), ([1, 0], False)):
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)[order]
        mesh = Mesh(
            positions=pos,
            normals=nrm,
            uvs=np.zeros((6, 2), np.float32),
            indices=tris,
            material_id=np.array(order, np.int32),
            transform_id=np.zeros(6, np.int32),
        )
        scene = Scene(
            mesh=mesh,
            materials=Material.table(
                [{"base_color": (1.0, 0.0, 0.0)}, {"base_color": (0.0, 1.0, 0.0)}]
            ),
            textures=None,
            lights=Lights.make(ambient=(1.0, 1.0, 1.0)),
            model_matrices=np.eye(4, dtype=np.float32)[None],
        )
        camera = Camera(
            eye=np.asarray((0, 0, 5.0), np.float32),
            target=np.zeros(3, np.float32),
            up=np.asarray((0, 1.0, 0), np.float32),
            fov_y=np.asarray(np.deg2rad(60.0), np.float32),
            near=np.asarray(0.5, np.float32),
            far=np.asarray(20.0, np.float32),
        )
        config = RenderConfig(width=64, height=64, mode=MODE_FLAT)
        frame = oracle.render_frame(scene, camera, config)
        # center pixel: near (green when material_id=1 is near tri) triangle
        center = frame.color[32, 32]
        # near triangle has material depending on order; it's always the one
        # at z=1.0 → depth < far tri depth
        assert frame.depth[32, 32] < frame.depth[2, 2] or frame.depth[2, 2] == 1.0
        # the near triangle's color is the material of tris index where
        # original near tri ended up
        near_mat = scene.materials.base_color[
            mesh.material_id[int(np.argwhere((tris == 3).any(axis=1))[0, 0])]
        ]
        expect = np.floor(np.clip(near_mat * 1.0 + 0, 0, 1) * 255 + 0.5).astype(np.uint8)
        # ambient(1,1,1)*ka*base = base
        assert (center == expect).all()


@pytest.mark.parametrize("mode", [MODE_FLAT, MODE_GOURAUD])
def test_oracle_blend_matches_brute(mode):
    """The oracle's blended composite (xr/shading/blend.py: record
    machinery, src_id ordering, chunked alpha-over) must match the brute
    validator's independent input-order scalar blend pass."""
    rng = np.random.default_rng(97 + mode)
    for trial in range(3):
        scene, camera = _random_scene(rng, num_tris=8, mode=mode)
        # make material 1 transparent (every other triangle blends)
        mats = scene.materials
        alpha = np.asarray([1.0, 0.45], np.float32)
        scene = scene.replace(materials=mats.replace(alpha=alpha))
        config = RenderConfig(
            width=48, height=40, mode=mode, blend=True, blend_capacity=16
        )
        frame = oracle.render_frame(scene, camera, config)
        assert int(frame.stats["blend_overflow"]) == 0
        b_color, b_depth = brute.render(scene, camera, config)

        # transparent tris must not write depth in either implementation
        np.testing.assert_allclose(frame.depth, b_depth, atol=1e-5)
        diff = np.abs(frame.color.astype(int) - b_color.astype(int))
        assert diff.max() <= 2, f"blend diff {diff.max()} (trial {trial})"


@pytest.mark.parametrize("mode", [MODE_FLAT, MODE_GOURAUD])
def test_point_lights_vertex_lit(mode):
    """Point lights now contribute to the vertex-lit modes (flat uses the
    face centroid, Gouraud the vertex position): oracle matches the brute
    validator, and the light visibly falls off with distance."""
    rng = np.random.default_rng(1234 + mode)
    scene, camera = _random_scene(rng, num_tris=8, mode=mode)
    scene = scene.replace(
        lights=Lights.make(
            pt_pos=[(0.0, 0.0, 1.5)],
            pt_colors=[(2.0, 2.0, 2.0)],
            ambient=(0.05, 0.05, 0.05),
        )
    )
    config = RenderConfig(width=48, height=40, mode=mode)
    frame = oracle.render_frame(scene, camera, config)
    b_color, b_depth = brute.render(scene, camera, config)
    np.testing.assert_allclose(frame.depth, b_depth, atol=1e-5)
    diff = np.abs(frame.color.astype(int) - b_color.astype(int))
    assert diff.max() <= 2, f"point-light diff {diff.max()}"
    # the light actually contributes (not ambient-only)
    amb = oracle.render_frame(
        scene.replace(lights=Lights.make(ambient=(0.05, 0.05, 0.05))),
        camera, config,
    )
    assert (frame.color.astype(int) - amb.color.astype(int)).max() > 30
