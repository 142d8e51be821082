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

v2 (VERDICT r4 #5): the composite is a `lax.scan` over fixed-size record
chunks — program size is bounded by blend_chunk, CONSTANT in
blend_capacity (v1 unrolled a Python loop per chunk and per record, so
hundreds of transparent tris meant minutes of XLA compile). Transparent
fragments are now also TEXTURED (perspective-correct trilinear + analytic
LOD, textured/phong modes) and SHADOW-TESTED (phong + shadow map) — the
same sampling/shadow code the deferred pass uses, so a blend-state PSO
carries the full shading model, not a vertex-lit subset. Texture sampling
runs under a per-chunk runtime cond: scenes whose transparent materials
are untextured trace the sampler but never execute it.

Shared by the CPU oracle and the device pipeline (xp-generic, like the
deferred pass) — blending semantics exist once (SURVEY.md §7.3.3).
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
    shadow_depth=None,
    light_viewproj=None,
):
    """Composite transparent records over the shaded frame.

    color: (H, W, 3) f32 linear (post-background, pre-u8-resolve).
    depth: (H, W) f32 opaque depth (1.0 = background clear value).
    shadow_depth/light_viewproj: the opaque pass's shadow map (phong mode)
    — transparent fragments receive the same shadow test as opaque ones.
    Returns (color', overflow) — overflow counts transparent records beyond
    config.blend_capacity (loud, like every capacity in this framework).
    """
    H, W = depth.shape
    cap = config.blend_capacity
    ch = min(config.blend_chunk, cap)
    nchunks = -(-cap // ch)
    alpha = material_alpha(scene, xp)
    tmask = transparent_mask(tri, scene, xp)
    ids, total = _src_ordered_ids(tri, tmask, cap, xp)
    overflow = xp.maximum(total - cap, 0).astype(xp.int32)

    px, py = rc.pixel_grids(W, H, config.subpixel, xp)
    py = py + xp.asarray(y_offset, xp.int32) * config.subpixel

    slot_valid = xp.arange(cap) < xp.minimum(total, cap)
    eye = xp.asarray(eye, xp.float32)

    # chunk-major views, padded to nchunks * ch (padding slots are dead)
    pad = nchunks * ch - cap
    if pad:
        ids = xp.concatenate([ids, xp.zeros((pad,), xp.int32)])
        slot_valid = xp.concatenate(
            [slot_valid, xp.zeros((pad,), bool)]
        )
    sl_all = ids.reshape(nchunks, ch)
    ok_all = slot_valid.reshape(nchunks, ch)

    def chunk(color, sl, ok):
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
            tri, sl, scene, config, eye, e0, e1, e2, mask, xp,
            shadow_depth=shadow_depth, light_viewproj=light_viewproj,
        )
        a = alpha[tri.mat_id[sl]]  # (ch,)

        # back-to-front over: sequential WITHIN the chunk too (composite
        # order is semantics; chunking only batches the fragment math).
        # ch is small and static, so this unroll bounds program size.
        for j in range(ch):
            aj = a[j]
            m = mask[j][..., None]
            color = xp.where(
                m,
                (color * (1.0 - aj) + frag[j] * aj).astype(xp.float32),
                color,
            )
        return color

    # capacity is static but the live transparent count is not: dead
    # chunks are skipped at runtime (lax.cond executes one branch), so a
    # scene with 4 transparent tris pays for 1 chunk, not cap/ch
    if _is_np(xp):
        for c in range(nchunks):
            if bool(ok_all[c].any()):
                color = chunk(color, sl_all[c], ok_all[c])
    else:
        import jax

        def body(color, inp):
            sl, ok = inp
            color = jax.lax.cond(
                ok.any(), lambda c: chunk(c, sl, ok), lambda c: c, color
            )
            return color, None

        color, _ = jax.lax.scan(body, color, (sl_all, ok_all))
    return color.astype(xp.float32), overflow


def _fragment_colors(
    tri, sl, scene, config, eye, e0, e1, e2, mask, xp,
    shadow_depth=None, light_viewproj=None,
):
    """(ch, H, W, 3) linear colors of the chunk's fragments: the deferred
    pass's shading model (interpolation, trilinear texturing with analytic
    LOD, Phong + shadow test) applied to the chunk's transparent records.

    mask: (ch, H, W) final coverage — uncovered lanes' attrs are zeroed at
    the source (the denominator underflow fix deferred.py applies at its
    bg pixels; VERDICT r4 'mirror the fix')."""
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
    # uncovered pixels read a record's plane far outside the triangle,
    # where denom can underflow to the 1e-20 floor and blow attrs up to
    # ~1e20 (f32 overflow in the squaring downstream). Their color is
    # masked away either way; zero the attrs at the source so covered
    # pixels are untouched and both backends agree (deferred.py's fix).
    inv_denom = xp.where(mask, inv_denom, xp.float32(0.0))

    def attr(j):
        return interp_col(aw[:, :, j]) * inv_denom

    if mode == MODE_GOURAUD:
        return xp.stack([attr(0), attr(1), attr(2)], axis=-1).astype(xp.float32)

    mid = tri.mat_id[sl]  # (ch,)
    if mode == MODE_TEXTURED:
        # lit tint lives in attr slots 2..4; uv in 0..1
        u, v = attr(0), attr(1)
        lit = xp.stack([attr(2), attr(3), attr(4)], axis=-1).astype(xp.float32)
        texc = _chunk_texture(
            tri, sl, scene, config, u, v, 0, e0, e1, e2, denom, mid, mask, xp
        )
        return (texc * lit).astype(xp.float32)

    assert mode == MODE_PHONG
    world = xp.stack([attr(0), attr(1), attr(2)], axis=-1)
    normal = xp.stack([attr(3), attr(4), attr(5)], axis=-1)
    nrm = xp.sqrt(xp.sum(normal * normal, axis=-1, keepdims=True))
    normal = normal / xp.maximum(nrm, 1e-12)
    u, v = attr(6), attr(7)
    mats = scene.materials
    base = mats.base_color[mid][:, None, None, :]
    base = xp.broadcast_to(base, world.shape) * _chunk_texture(
        tri, sl, scene, config, u, v, 6, e0, e1, e2, denom, mid, mask, xp
    )
    shadow = None
    if shadow_depth is not None and light_viewproj is not None:
        # same test as the opaque deferred pass; world is zeroed at
        # uncovered lanes (inv_denom above), so the gather indices are
        # benign there and the result is masked by the composite anyway
        shadow = sm.shadow_test(
            shadow_depth, world, light_viewproj, config.shadow_bias, xp
        )
    return sm.shade_phong(
        world,
        normal,
        eye,
        base,
        xp.broadcast_to(mats.ka[mid][:, None, None], world.shape[:-1]),
        xp.broadcast_to(mats.kd[mid][:, None, None], world.shape[:-1]),
        xp.broadcast_to(mats.ks[mid][:, None, None], world.shape[:-1]),
        xp.broadcast_to(mats.shininess[mid][:, None, None], world.shape[:-1]),
        scene.lights,
        shadow_factor=shadow,
        xp=xp,
    )


def _chunk_texture(
    tri, sl, scene, config, u, v, uv_slot, e0, e1, e2, denom, mid, mask, xp
):
    """(ch, H, W, 3) trilinear texture colors for a chunk's fragments —
    the deferred pass's sampler (analytic per-record LOD terms, same
    quotient-rule per-pixel derivatives), run under a RUNTIME cond: a
    chunk with no live textured record returns white without executing a
    single gather (so untextured transparent scenes pay nothing)."""
    pyr = scene.textures
    if pyr is None or pyr.num_levels == 0:
        return xp.ones(u.shape + (3,), xp.float32)

    tex_id = scene.materials.tex_id[mid]  # (ch,)
    live_tex = mask.any(axis=(1, 2)) & (tex_id >= 0)

    def sample():
        from xr.shading.deferred import _lod_terms

        lod6_c = _lod_terms(tri, uv_slot, config, xp)  # 6 x (C,)
        lod6 = tuple(t[sl][:, None, None] for t in lod6_c)  # (ch,1,1)
        area2 = (e0 + e1 + e2).astype(xp.float32)
        D = denom * area2
        invD = (1.0 / xp.where(D == 0.0, 1e-30, D)).astype(xp.float32)
        dudx = (lod6[2] - u * lod6[0]) * invD
        dudy = (lod6[3] - u * lod6[1]) * invD
        dvdx = (lod6[4] - v * lod6[0]) * invD
        dvdy = (lod6[5] - v * lod6[1]) * invD
        has_tex = (tex_id >= 0)[:, None, None]
        tid_safe = xp.where(has_tex, tex_id[:, None, None], 0)
        if hasattr(pyr, "base_size_per_tex"):
            base = pyr.base_size_per_tex[tid_safe].astype(xp.float32)
        else:
            base = pyr.base_size
        lod = sm.lod_from_derivs(dudx, dvdx, dudy, dvdy, base, xp)
        addr = None
        if scene.materials.tex_addr is not None:
            addr = scene.materials.tex_addr[mid][:, None, None]
        texc = sm.sample_trilinear(
            pyr, tid_safe, u, v, lod, xp, fetch=config.tex_fetch,
            addr=addr, split=config.tex_split, mip_math=config.mip_math,
        )
        return xp.where(has_tex[..., None], texc, 1.0).astype(xp.float32)

    if _is_np(xp):
        if bool(live_tex.any()):
            return sample()
        return xp.ones(u.shape + (3,), xp.float32)
    import jax

    return jax.lax.cond(
        live_tex.any(),
        sample,
        lambda: xp.ones(u.shape + (3,), xp.float32),
    )
