"""Scene / camera-path serialization (.npz) — SURVEY.md §5.4.

The reference is stateless per frame (no checkpointing); the useful analog
is saving a scene + a camera path so a fly-through can be resumed at frame k
for debugging, and so goldens are re-derivable from pinned inputs.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np

from xr.core.types import (
    Camera,
    Lights,
    Material,
    Mesh,
    Scene,
    TexturePyramid,
)


def save_scene(path: str, scene: Scene) -> None:
    arrs: Dict[str, np.ndarray] = {}
    m = scene.mesh
    for k in ("positions", "normals", "uvs", "indices", "material_id", "transform_id"):
        arrs[f"mesh_{k}"] = np.asarray(getattr(m, k))
    mat = scene.materials
    for k in ("base_color", "ka", "kd", "ks", "shininess", "tex_id"):
        arrs[f"mat_{k}"] = np.asarray(getattr(mat, k))
    li = scene.lights
    for k in ("dir_dirs", "dir_colors", "pt_pos", "pt_colors", "ambient"):
        arrs[f"light_{k}"] = np.asarray(getattr(li, k))
    arrs["model_matrices"] = np.asarray(scene.model_matrices)
    if scene.textures is not None:
        arrs["tex_data"] = np.asarray(scene.textures.data)
        arrs["tex_quads"] = np.asarray(scene.textures.quads)
        arrs["tex_meta"] = np.asarray(
            [scene.textures.base_size, scene.textures.num_levels], np.int64
        )
    np.savez_compressed(path, **arrs)


def load_scene(path: str) -> Scene:
    z = np.load(path)
    mesh = Mesh(
        positions=z["mesh_positions"],
        normals=z["mesh_normals"],
        uvs=z["mesh_uvs"],
        indices=z["mesh_indices"],
        material_id=z["mesh_material_id"],
        transform_id=z["mesh_transform_id"],
    )
    mat = Material(
        base_color=z["mat_base_color"],
        ka=z["mat_ka"],
        kd=z["mat_kd"],
        ks=z["mat_ks"],
        shininess=z["mat_shininess"],
        tex_id=z["mat_tex_id"],
    )
    lights = Lights(
        dir_dirs=z["light_dir_dirs"],
        dir_colors=z["light_dir_colors"],
        pt_pos=z["light_pt_pos"],
        pt_colors=z["light_pt_colors"],
        ambient=z["light_ambient"],
    )
    tex = None
    if "tex_data" in z:
        base, levels = (int(v) for v in z["tex_meta"])
        tex = TexturePyramid(
            data=z["tex_data"],
            quads=z["tex_quads"],
            base_size=base,
            num_levels=levels,
        )
    return Scene(
        mesh=mesh,
        materials=mat,
        textures=tex,
        lights=lights,
        model_matrices=z["model_matrices"],
    )


def save_camera_path(path: str, cameras: List[Camera]) -> None:
    """Bake a list of cameras (e.g. animate(t) samples) to one npz."""
    fields = ("eye", "target", "up", "fov_y", "near", "far")
    arrs = {
        f: np.stack([np.asarray(getattr(c, f), np.float32) for c in cameras])
        for f in fields
    }
    np.savez_compressed(path, **arrs)


def load_camera_path(path: str) -> List[Camera]:
    z = np.load(path)
    n = z["eye"].shape[0]
    return [
        Camera(
            eye=z["eye"][i],
            target=z["target"][i],
            up=z["up"][i],
            fov_y=z["fov_y"][i],
            near=z["near"][i],
            far=z["far"][i],
        )
        for i in range(n)
    ]


def bake_camera_path(
    animate: Callable, times, xp=np
) -> Tuple[List[Camera], List[np.ndarray]]:
    """Sample a preset's animate() at fixed times (for serialization)."""
    cams, mats = [], []
    for t in times:
        c, m = animate(t, xp)
        cams.append(c)
        mats.append(np.asarray(m))
    return cams, mats
