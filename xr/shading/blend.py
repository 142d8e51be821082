"""Alpha-blended transparency pass (SURVEY.md §2.1 "Pipeline state": the
reference's PSO carries a BLEND state axis; BASELINE.json:10's multi-light
scenes are its natural host).

TPU-first design: the opaque scene renders exactly as before (deferred
single-shade). Triangles whose material alpha < 1 are EXCLUDED from every
visibility pass (they win no pixels and cast no shadows) and composited in
a separate blend pass over the shaded frame: a static-capacity, chunked
fold over the transparent records in ascending record id — the classic
back-to-front painter's blend, `out = dst*(1-a) + src*a`, depth-tested
(read-only) against the opaque depth buffer.

CONTRACT: SOURCE triangle order IS composite order. The app supplies
transparent geometry sorted back-to-front (the same contract classic D3D
blended draws impose); the composite orders records by TriBuf.src_id, so
the contract survives clipping — Sutherland-Hodgman fans are emitted at
the end of the record buffer but carry their parent triangle's src_id
(ADVICE r3). Fan pieces of one source triangle never overlap on screen,
so their relative order is immaterial.

Shared by the CPU oracle and the device pipeline (xp-generic, like the
deferred pass) — blending semantics exist once (SURVEY.md §7.3.3).
Transparent fragments are vertex-lit (flat/Gouraud/textured modes) or
fully Phong-shaded (phong mode), but sample no textures and receive no
shadow-map test — documented v1 scope.
"""

from __future__ import annotations

import numpy as np

from xr.core import fixedpoint as fp
from xr.core import shade_math as sm
from xr.core.types import (
    MODE_FLAT,
    MODE_GOURAUD,
    MODE_PHONG,
    MODE_TEXTURED,
    RenderConfig,
    Scene,
)
from xr.pipeline.geometry import TriBuf, _is_np
from xr.raster import common as rc


def material_alpha(scene: Scene, xp):
    """Per-material alpha as an array; materials without an alpha column
    are fully opaque."""
    a = scene.materials.alpha
    if a is None:
        return None
    return xp.asarray(a, xp.float32)


def transparent_mask(tri: TriBuf, scene: Scene, xp):
    """(C,) bool — valid records whose material blends (alpha < 1)."""
    alpha = material_alpha(scene, xp)
    if alpha is None:
        return xp.zeros(tri.valid.shape, bool)
    return tri.valid & (alpha[tri.mat_id] < 1.0)


def opaque_valid(tri: TriBuf, scene: Scene, xp):
    """Validity mask for the opaque visibility passes under blending."""
    return tri.valid & ~transparent_mask(tri, scene, xp)


def _src_ordered_ids(tri: TriBuf, tmask, cap: int, xp):
    """Record indices of transparent records in ascending SOURCE triangle
    order (stable: ties — fan pieces of one source tri — keep record
    order), padded to cap. Returns (ids (cap,), total ())."""
    C = tmask.shape[0]
    big = xp.int32(2**30)
    keys = xp.where(tmask, tri.src_id.astype(xp.int32), big)
    if _is_np(xp):
        order = np.argsort(keys, kind="stable").astype(np.int32)
    else:
        order = xp.argsort(keys, stable=True).astype(xp.int32)
    if cap <= C:
        ids = order[:cap]
    else:
        ids = xp.concatenate([order, xp.zeros((cap - C,), xp.int32)])
    total = xp.sum(tmask.astype(xp.int32))
    return ids, total


def composite_transparent(
    color,
    depth,
    tri: TriBuf,
    scene: Scene,
    config: RenderConfig,
    eye,
    xp=np,
    y_offset: int = 0,
):
    """Composite transparent records over the shaded frame.

    color: (H, W, 3) f32 linear (post-background, pre-u8-resolve).
    depth: (H, W) f32 opaque depth (1.0 = background clear value).
    Returns (color', overflow) — overflow counts transparent records beyond
    config.blend_capacity (loud, like every capacity in this framework).
    """
    H, W = depth.shape
    cap = config.blend_capacity
    ch = min(config.blend_chunk, cap)
    alpha = material_alpha(scene, xp)
    tmask = transparent_mask(tri, scene, xp)
    ids, total = _src_ordered_ids(tri, tmask, cap, xp)
    overflow = xp.maximum(total - cap, 0).astype(xp.int32)

    px, py = rc.pixel_grids(W, H, config.subpixel, xp)
    py = py + xp.asarray(y_offset, xp.int32) * config.subpixel

    slot_valid = xp.arange(cap) < xp.minimum(total, cap)
    eye = xp.asarray(eye, xp.float32)

    for c0 in range(0, cap, ch):
        sl = ids[c0 : c0 + ch]  # (ch,) record indices, ascending src_id
        ok = slot_valid[c0 : c0 + ch]

        def chunk(color, sl=sl, ok=ok):
            xs = tri.xs[sl][:, None, None, :]  # (ch, 1, 1, 3)
            ys = tri.ys[sl][:, None, None, :]
            z = tri.z[sl][:, None, None, :]
            # one coverage evaluation feeds BOTH the mask/depth and the
            # barycentric interpolation (exactly rc.tri_fragment's math)
            cov, (e0, e1, e2) = fp.coverage(xs, ys, px[None], py[None], xp)
            zf = rc.fragment_depth(e0, e1, e2, z, xp)  # (ch, H, W)
            # read-only depth test against the opaque buffer (strict <: a
            # blended fragment exactly on an opaque surface is occluded)
            mask = (
                cov
                & rc.depth_range_mask(zf, xp)
                & ok[:, None, None]
                & (zf < depth[None])
            )

            frag = _fragment_colors(
                tri, sl, scene, config, eye, e0, e1, e2, xp
            )
            a = alpha[tri.mat_id[sl]]  # (ch,)

            # back-to-front over: sequential WITHIN the chunk too
            # (composite order is semantics; chunking only batches the
            # fragment math)
            for j in range(sl.shape[0]):
                aj = a[j]
                m = mask[j][..., None]
                color = xp.where(
                    m,
                    (color * (1.0 - aj) + frag[j] * aj).astype(xp.float32),
                    color,
                )
            return color

        # capacity is static but the live transparent count is not: skip
        # whole dead chunks at runtime (lax.cond executes one branch), so
        # a scene with 4 transparent tris pays for 1 chunk, not cap/ch
        if _is_np(xp):
            if bool(ok.any()):
                color = chunk(color)
        else:
            import jax

            color = jax.lax.cond(
                ok.any(), chunk, lambda c: c, color
            )
    return color.astype(xp.float32), overflow


def _fragment_colors(tri, sl, scene, config, eye, e0, e1, e2, xp):
    """(ch, H, W, 3) linear colors of the chunk's fragments (see module
    docstring for the per-mode shading scope)."""
    mode = config.mode
    ch = sl.shape[0]
    H, W = e0.shape[1:]
    if mode == MODE_FLAT:
        return xp.broadcast_to(
            tri.face_rgb[sl][:, None, None, :], (ch, H, W, 3)
        ).astype(xp.float32)

    # perspective-correct attribute interpolation (the deferred pass's
    # formulas, batched over the chunk)
    l0, l1, l2 = fp.barycentrics_f32(e0, e1, e2, xp)
    aw = tri.attr_w[sl]  # (ch, 3, A)
    iw = tri.inv_w[sl]  # (ch, 3)

    def interp_col(vals):  # vals (ch, 3) -> (ch, H, W)
        return (
            l0 * vals[:, 0, None, None] + l1 * vals[:, 1, None, None]
        ) + l2 * vals[:, 2, None, None]

    denom = interp_col(iw)
    inv_denom = (1.0 / xp.maximum(denom, 1e-20)).astype(xp.float32)

    def attr(j):
        return interp_col(aw[:, :, j]) * inv_denom

    if mode == MODE_GOURAUD:
        return xp.stack([attr(0), attr(1), attr(2)], axis=-1).astype(xp.float32)
    if mode == MODE_TEXTURED:
        # lit tint lives in attr slots 2..4; transparent surfaces sample
        # no texture (v1 scope)
        return xp.stack([attr(2), attr(3), attr(4)], axis=-1).astype(xp.float32)

    assert mode == MODE_PHONG
    world = xp.stack([attr(0), attr(1), attr(2)], axis=-1)
    normal = xp.stack([attr(3), attr(4), attr(5)], axis=-1)
    nrm = xp.sqrt(xp.sum(normal * normal, axis=-1, keepdims=True))
    normal = normal / xp.maximum(nrm, 1e-12)
    mats = scene.materials
    mid = tri.mat_id[sl]  # (ch,)
    base = mats.base_color[mid][:, None, None, :]
    return sm.shade_phong(
        world,
        normal,
        eye,
        xp.broadcast_to(base, world.shape),
        xp.broadcast_to(mats.ka[mid][:, None, None], world.shape[:-1]),
        xp.broadcast_to(mats.kd[mid][:, None, None], world.shape[:-1]),
        xp.broadcast_to(mats.ks[mid][:, None, None], world.shape[:-1]),
        xp.broadcast_to(mats.shininess[mid][:, None, None], world.shape[:-1]),
        scene.lights,
        shadow_factor=None,
        xp=xp,
    )
