"""Independent brute-force scalar rasterizer — validates the oracle.

SURVEY.md §4.2: the oracle itself must be cross-checked against "a brutally
simple per-pixel point-in-triangle scalar loop on random small scenes". This
module deliberately shares NO rasterization code with the pipeline: coverage
is evaluated per pixel with arbitrary-precision Python integers (which also
independently validates the int32 overflow budget), the fill rule is
re-derived from its geometric definition, and interpolation is float64.

Only flat and Gouraud modes, no clipping (scenes must be fully inside the
frustum), tiny resolutions. Slow by design.
"""

from __future__ import annotations

import math

import numpy as np

from xr.core import math3d as m3
from xr.core.types import MODE_FLAT, MODE_GOURAUD, RenderConfig, Scene
from xr.core import shade_math as sm


def _snap(v: float, sub: int) -> int:
    return int(math.floor(v * sub + 0.5))


def _edge(ax, ay, bx, by, px, py):
    """Edge function for edge a->b at p, interior-positive for front faces
    (world-CCW, y-down screen coords) — Python ints, exact."""
    return (by - ay) * (px - ax) - (bx - ax) * (py - ay)


def _tie_accept(ax, ay, bx, by) -> bool:
    """Top-left rule from its geometric definition. With interior-positive
    winding, a TOP edge is horizontal with the interior below it, which
    means the edge runs right-to-left (ax > bx); a LEFT edge has the
    interior to its right, which means it runs downward (by > ay)."""
    if ay == by:
        return ax > bx  # top edge
    return by > ay  # left edge


def render(scene: Scene, camera, config: RenderConfig):
    H, W, sub = config.height, config.width, config.subpixel
    view, proj = m3.camera_matrices(camera, W / H, np)
    vp = (proj @ view).astype(np.float32)

    mesh = scene.mesh
    mats = np.asarray(scene.model_matrices, np.float32)
    color = np.zeros((H, W, 3), np.float64)
    color[:, :] = np.asarray(config.bg_color, np.float64)
    depth = np.full((H, W), np.inf, np.float64)
    winner = np.full((H, W), 2**31 - 1, np.int64)

    # per-vertex transform (float32 like the pipeline, then exact int snap)
    V = mesh.positions.shape[0]
    p4 = np.concatenate([mesh.positions, np.ones((V, 1), np.float32)], 1)
    world = np.einsum("vij,vj->vi", mats[mesh.transform_id], p4).astype(np.float32)
    clip = (world @ vp.T).astype(np.float32)

    if config.mode == MODE_GOURAUD:
        vert_mat = np.zeros(V, np.int32)
        vert_mat[mesh.indices.reshape(-1)] = np.repeat(mesh.material_id, 3)
        vlit = sm.shade_vertex_lit(
            np.asarray(
                m3.normalize(
                    np.einsum(
                        "vij,vj->vi", mats[mesh.transform_id][:, :3, :3], mesh.normals
                    ),
                    np,
                ),
                np.float32,
            ),
            scene.materials.base_color[vert_mat],
            scene.materials.kd[vert_mat],
            scene.lights,
            np,
        )

    tri_index = 0
    f32 = np.float32
    for t in range(mesh.indices.shape[0]):
        order = [int(i) for i in mesh.indices[t]]
        vs = []
        for vi in order:
            x, y, z, w = (f32(c) for c in clip[vi])
            assert float(w) > 1e-6, "brute rasterizer requires fully-visible scenes"
            # mimic the pipeline's f32 op sequence exactly (x * (1/w), etc.)
            iw = f32(1.0) / np.maximum(w, f32(1e-12))
            sx = (x * iw * f32(0.5) + f32(0.5)) * f32(W)
            sy = (f32(0.5) - y * iw * f32(0.5)) * f32(H)
            vs.append((_snap(float(sx), sub), _snap(float(sy), sub), float(z * iw)))
        (x0, y0, z0), (x1, y1, z1), (x2, y2, z2) = vs
        area2 = _edge(x0, y0, x1, y1, x2, y2)
        if area2 == 0:
            tri_index += 1
            continue
        if area2 < 0:
            if config.cull_backfaces:
                tri_index += 1
                continue
            (x1, y1, z1), (x2, y2, z2) = (x2, y2, z2), (x1, y1, z1)
            order[1], order[2] = order[2], order[1]
            area2 = -area2
        i0, i1, i2 = order

        if config.mode == MODE_FLAT:
            # face normal uses the ORIGINAL winding (matches _vertex_stage)
            oi0, oi1, oi2 = (int(i) for i in mesh.indices[t])
            e1w = world[oi1, :3] - world[oi0, :3]
            e2w = world[oi2, :3] - world[oi0, :3]
            fn = np.cross(e1w, e2w)
            fn = fn / max(np.linalg.norm(fn), 1e-20)
            mid = int(mesh.material_id[t])
            rgb = sm.shade_flat_face(
                fn[None, :].astype(np.float32),
                scene.materials.base_color[mid][None, :],
                scene.materials.kd[mid][None],
                scene.lights,
                np,
            )[0]
        half = sub // 2
        for iy in range(H):
            py = iy * sub + half
            for ix in range(W):
                px = ix * sub + half
                e0 = _edge(x1, y1, x2, y2, px, py)  # opposite v0
                e1 = _edge(x2, y2, x0, y0, px, py)
                e2 = _edge(x0, y0, x1, y1, px, py)
                ok = True
                for e, (ax, ay, bx, by) in (
                    (e0, (x1, y1, x2, y2)),
                    (e1, (x2, y2, x0, y0)),
                    (e2, (x0, y0, x1, y1)),
                ):
                    if e < 0 or (e == 0 and not _tie_accept(ax, ay, bx, by)):
                        ok = False
                        break
                if not ok:
                    continue
                l0 = e0 / area2
                l1 = e1 / area2
                l2 = e2 / area2
                z = l0 * z0 + l1 * z1 + l2 * z2
                if not (0.0 <= z <= 1.0):
                    continue
                if config.depth_test and z >= depth[iy, ix]:
                    continue
                depth[iy, ix] = z
                winner[iy, ix] = tri_index
                if config.mode == MODE_FLAT:
                    color[iy, ix] = rgb
                else:
                    # perspective-correct Gouraud (f64)
                    iw0 = 1.0 / float(clip[i0, 3])
                    iw1 = 1.0 / float(clip[i1, 3])
                    iw2 = 1.0 / float(clip[i2, 3])
                    den = l0 * iw0 + l1 * iw1 + l2 * iw2
                    c = (
                        l0 * iw0 * vlit[i0].astype(np.float64)
                        + l1 * iw1 * vlit[i1].astype(np.float64)
                        + l2 * iw2 * vlit[i2].astype(np.float64)
                    ) / den
                    color[iy, ix] = c
        tri_index += 1

    u8 = np.clip(color, 0.0, 1.0)
    u8 = np.floor(u8 * 255.0 + 0.5).astype(np.uint8)
    return u8, np.where(np.isinf(depth), 1.0, depth).astype(np.float32)
