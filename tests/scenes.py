"""Shared test-scene builders."""

import numpy as np

from xr.core.types import Camera, Lights, Material, Mesh, Scene


def random_scene(rng, num_tris):
    """Random triangles fully inside the frustum of `fixed_camera()`."""
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
    return Scene(
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


def fixed_camera():
    return Camera(
        eye=np.asarray((0.0, 0.0, 5.0), np.float32),
        target=np.asarray((0.0, 0.0, 0.0), np.float32),
        up=np.asarray((0.0, 1.0, 0.0), np.float32),
        fov_y=np.asarray(np.deg2rad(60.0), np.float32),
        near=np.asarray(0.5, np.float32),
        far=np.asarray(20.0, np.float32),
    )
