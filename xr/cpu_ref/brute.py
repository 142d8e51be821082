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
            world_pos=(
                world[:, :3] if scene.lights.pt_pos.shape[0] else None
            ),
        )

    alpha_tab = getattr(scene.materials, "alpha", None)

    def tri_alpha(t: int) -> float:
        if not config.blend or alpha_tab is None:
            return 1.0
        return float(alpha_tab[int(mesh.material_id[t])])

    tri_index = 0
    f32 = np.float32
    for t in range(mesh.indices.shape[0]):
        if tri_alpha(t) < 1.0:
            # transparent under blend: wins no pixels, composited below
            tri_index += 1
            continue
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
            cen = (
                (
                    (world[oi0, :3] + world[oi1, :3]) + world[oi2, :3]
                ) * np.float32(1.0 / 3.0)
            )[None, :] if scene.lights.pt_pos.shape[0] else None
            rgb = sm.shade_flat_face(
                fn[None, :].astype(np.float32),
                scene.materials.base_color[mid][None, :],
                scene.materials.kd[mid][None],
                scene.lights,
                np,
                centroid=cen,
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

    # ---- independent blend pass: transparent tris in INPUT order --------
    # (source-order alpha-over, read-only strict depth test; shares no
    # code with xr/shading/blend.py — validates its composite end-to-end)
    if config.blend and alpha_tab is not None:
        for t in range(mesh.indices.shape[0]):
            a = tri_alpha(t)
            if a >= 1.0:
                continue
            order = [int(i) for i in mesh.indices[t]]
            vs = []
            for vi in order:
                x, y, z, w = (f32(c) for c in clip[vi])
                assert float(w) > 1e-6, (
                    "brute rasterizer requires fully-visible scenes"
                )
                iw = f32(1.0) / np.maximum(w, f32(1e-12))
                sx = (x * iw * f32(0.5) + f32(0.5)) * f32(W)
                sy = (f32(0.5) - y * iw * f32(0.5)) * f32(H)
                vs.append(
                    (_snap(float(sx), sub), _snap(float(sy), sub), float(z * iw))
                )
            (x0, y0, z0), (x1, y1, z1), (x2, y2, z2) = vs
            area2 = _edge(x0, y0, x1, y1, x2, y2)
            if area2 == 0:
                continue
            if area2 < 0:
                if config.cull_backfaces:
                    continue
                (x1, y1, z1), (x2, y2, z2) = (x2, y2, z2), (x1, y1, z1)
                order[1], order[2] = order[2], order[1]
                area2 = -area2
            i0, i1, i2 = order
            if config.mode == MODE_FLAT:
                oi0, oi1, oi2 = (int(i) for i in mesh.indices[t])
                e1w = world[oi1, :3] - world[oi0, :3]
                e2w = world[oi2, :3] - world[oi0, :3]
                fn = np.cross(e1w, e2w)
                fn = fn / max(np.linalg.norm(fn), 1e-20)
                mid = int(mesh.material_id[t])
                cen = (
                    (
                        (world[oi0, :3] + world[oi1, :3]) + world[oi2, :3]
                    ) * np.float32(1.0 / 3.0)
                )[None, :] if scene.lights.pt_pos.shape[0] else None
                rgb = sm.shade_flat_face(
                    fn[None, :].astype(np.float32),
                    scene.materials.base_color[mid][None, :],
                    scene.materials.kd[mid][None],
                    scene.lights,
                    np,
                    centroid=cen,
                )[0]
            half = sub // 2
            for iy in range(H):
                py = iy * sub + half
                for ix in range(W):
                    px = ix * sub + half
                    e0 = _edge(x1, y1, x2, y2, px, py)
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
                    # read-only strict test vs the RESOLVED depth (bg = 1.0,
                    # exactly like the pipeline's post-resolve buffer)
                    d = depth[iy, ix]
                    if np.isinf(d):
                        d = 1.0
                    if not (z < d):
                        continue
                    if config.mode == MODE_FLAT:
                        src = rgb
                    else:
                        iw0 = 1.0 / float(clip[i0, 3])
                        iw1 = 1.0 / float(clip[i1, 3])
                        iw2 = 1.0 / float(clip[i2, 3])
                        den = l0 * iw0 + l1 * iw1 + l2 * iw2
                        src = (
                            l0 * iw0 * vlit[i0].astype(np.float64)
                            + l1 * iw1 * vlit[i1].astype(np.float64)
                            + l2 * iw2 * vlit[i2].astype(np.float64)
                        ) / den
                    color[iy, ix] = color[iy, ix] * (1.0 - a) + src * a

    u8 = np.clip(color, 0.0, 1.0)
    u8 = np.floor(u8 * 255.0 + 0.5).astype(np.uint8)
    return u8, np.where(np.isinf(depth), 1.0, depth).astype(np.float32)


# ---------------------------------------------------------------------------
# Independent scalar texture sampling + shadow compare (SURVEY.md §4.2).
# Shares NO code with xr/core/shade_math.py: its own wrap, anchor, bilinear
# and level-lerp logic in float64 from the raw mip level images. A shared
# bug in sample_trilinear/shadow_test cannot hide from these.
# ---------------------------------------------------------------------------


def _quantize_u8(level: np.ndarray) -> np.ndarray:
    """8-bit texel quantization, matching what any real GPU texture (and
    the packed quad pyramid) stores."""
    q = np.floor(np.clip(level, 0.0, 1.0) * 255.0 + 0.5)
    return q / 255.0


def _bilinear_scalar(level: np.ndarray, u: float, v: float) -> np.ndarray:
    """One float64 bilinear tap with repeat wrap; texel centers at +0.5."""
    s = level.shape[0]
    tu = (u - math.floor(u)) * s - 0.5
    tv = (v - math.floor(v)) * s - 0.5
    i0 = math.floor(tu)
    j0 = math.floor(tv)
    fu = tu - i0
    fv = tv - j0
    out = np.zeros(3, np.float64)
    for dj, wv in ((0, 1.0 - fv), (1, fv)):
        for di, wu in ((0, 1.0 - fu), (1, fu)):
            tex = level[(j0 + dj) % s, (i0 + di) % s]
            out += (wu * wv) * tex.astype(np.float64)
    return out


def sample_trilinear_scalar(levels, u: float, v: float, lod: float) -> np.ndarray:
    """Float64 scalar trilinear sample from raw mip LEVEL images.

    levels: list of (s, s, 3) f32 arrays, level 0 first (e.g. slices of
    TexturePyramid.data reshaped per level). Returns (3,) f64 in [0, 1].
    """
    L = len(levels)
    lf = min(max(lod, 0.0), float(L - 1))
    l0 = int(math.floor(lf))
    l1 = min(l0 + 1, L - 1)
    frac = lf - l0
    c0 = _bilinear_scalar(_quantize_u8(levels[l0]), u, v)
    c1 = _bilinear_scalar(_quantize_u8(levels[l1]), u, v)
    return c0 * (1.0 - frac) + c1 * frac


def shadow_test_scalar(
    shadow_depth: np.ndarray, world_pos, light_viewproj, bias: float
) -> float:
    """Float64 scalar shadow-map compare: 1.0 lit, 0.0 shadowed.

    Independent re-derivation: project the world point by the light
    view-proj, viewport-map NDC to texel coords (y flipped), nearest
    sample, compare z - bias > stored depth. Outside the map => lit.
    """
    hs, ws = shadow_depth.shape
    p = np.asarray(world_pos, np.float64)
    m = np.asarray(light_viewproj, np.float64)
    clip4 = m @ np.array([p[0], p[1], p[2], 1.0])
    w = max(float(clip4[3]), 1e-12)
    nx, ny, nz = (float(clip4[k]) / w for k in range(3))
    if not (-1.0 <= nx <= 1.0 and -1.0 <= ny <= 1.0 and 0.0 <= nz <= 1.0):
        return 1.0
    ix = min(max(int(math.floor((nx * 0.5 + 0.5) * ws)), 0), ws - 1)
    iy = min(max(int(math.floor((0.5 - ny * 0.5) * hs)), 0), hs - 1)
    return 0.0 if nz - bias > float(shadow_depth[iy, ix]) else 1.0
