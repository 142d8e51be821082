"""Deferred shading pass — shades every pixel exactly once.

The reference shades fragments inline in the pixel shader with overdraw
(SURVEY.md §3.3); a TPU-first design splits the frame into a cheap integer
visibility pass (winning triangle id per pixel — the Pallas kernel's job) and
ONE dense, fully vectorized shading pass over the whole framebuffer, where
texture fetches become large batched gathers and lighting becomes fused VPU
math (BASELINE.json:5). Overdraw therefore costs visibility-pass ALU only,
never shading/texture bandwidth. "Mpixels shaded/sec" (BASELINE.json:2)
counts exactly H*W shaded fragments per frame plus shadow-pass texels.

Parameterized by ``xp`` so the CPU oracle shades with literally this code
(numpy) — shading semantics exist once (SURVEY.md §7.3.3).
"""

from __future__ import annotations

import numpy as np

from xr.core import fixedpoint as fp
from xr.core import shade_math as sm
from xr.core.types import (
    MODE_DEPTH_ONLY,
    MODE_FLAT,
    MODE_GOURAUD,
    MODE_PHONG,
    MODE_TEXTURED,
    RenderConfig,
    Scene,
)
from typing import Any, NamedTuple, Optional

from xr.pipeline.geometry import TriBuf
from xr.raster.common import BG_TRI_ID, pixel_grids


class Frag(NamedTuple):
    """Per-pixel G-buffer exposed to rich shade_hooks (flat (N,) layout;
    the reference pixel shader's interstage inputs — SURVEY.md §3.4).
    Fields are None when the active mode doesn't produce them."""

    bg: Any  # (N,) bool — background mask
    depth: Optional[Any] = None  # (N,) f32, 1.0 = background
    uv: Optional[Any] = None  # ((N,), (N,)) perspective-correct u, v
    world: Optional[Any] = None  # (N, 3) world position (phong)
    normal: Optional[Any] = None  # (N, 3) unit world normal (phong)


def _hook_wants_frag(hook) -> bool:
    import inspect

    try:
        params = inspect.signature(hook).parameters
    except (TypeError, ValueError):
        return False
    return "frag" in params or any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
    )


def shade_deferred(
    tri: TriBuf,
    tid,
    scene: Scene,
    config: RenderConfig,
    eye=None,
    shadow_depth=None,
    light_viewproj=None,
    px=None,
    py=None,
    y_offset: int = 0,
    xp=np,
    shade_hook=None,
    depth=None,
):
    """Shade a visibility buffer into (H, W, 3) f32 linear color.

    tid: (H, W) i32 winning triangle ids (BG_TRI_ID = background).
    Internally shades flat (H*W,) pixel vectors (layout-friendly gathers).
    px, py: optional precomputed fixed-point pixel grids; y_offset shifts the
    pixel rows for sharded framebuffer bands (SURVEY.md §5.8).
    shade_hook: optional custom pixel-shader stage applied to the
    pre-background linear color (the reference's editable-HLSL analog; see
    render_step). Two forms:
      hook(color, scene, mat_id, xp) -> (N, 3)                  (v1)
      hook(color, scene, mat_id, xp, frag=Frag) -> (N, 3)       (declare a
        `frag` parameter to receive the full per-pixel G-buffer: Frag
        fields bg (N,) bool, depth (N,) f32 or None, uv ((N,),(N,)) or
        None, world (N,3) or None, normal (N,3) or None — what exists
        depends on config.mode, like the reference's interstage registers)
    depth: optional (H, W) resolved depth (1.0 background) for hook Frag.
    """
    if config.mode == MODE_DEPTH_ONLY:
        raise ValueError("depth-only pass has no shading")
    H, W = tid.shape
    if px is None or py is None:
        px, py = pixel_grids(W, H, config.subpixel, xp)
        py = py + xp.asarray(y_offset, xp.int32) * config.subpixel

    # shade on FLAT (H*W,) pixels: gathers then produce natural {1,0}-layout
    # rows and XLA inserts no relayout copies; reshape once at the end
    tid = tid.reshape(-1)
    px = px.reshape(-1)
    py = py.reshape(-1)

    def out(color_flat):
        return color_flat.reshape(H, W, 3)

    wants_frag = shade_hook is not None and _hook_wants_frag(shade_hook)

    def finish(color, mat_id=None, uv=None, world=None, normal=None):
        if shade_hook is not None:
            if wants_frag:
                frag = Frag(
                    bg=bg,
                    depth=depth.reshape(-1) if depth is not None else None,
                    uv=uv,
                    world=world,
                    normal=normal,
                )
                color = shade_hook(color, scene, mat_id, xp, frag=frag)
            else:
                color = shade_hook(color, scene, mat_id, xp)
        return out(_with_bg(color, bg, config, xp))

    bg = tid == BG_TRI_ID
    t = xp.where(bg, 0, tid)

    if config.mode == MODE_FLAT:
        color = tri.face_rgb[t]
        return finish(color)

    # Per-pixel record fetch. Two bit-identical strategies (PERF.md r2/r3):
    #   "wide": ONE wide-row gather for all per-pixel triangle data. TPU
    #     gather cost is set by the lane-PADDED {1,0:T(8,128)}
    #     materialization of the output (K of 128 lanes used), so a 31-col
    #     gather costs the same as a 13-col one (per-op traces: 13/18/31-col
    #     all ~3.7 ms at 1080p). Every consumer below is a COLUMN slice
    #     (XLA inserts one {0,1} relayout, then slices are contiguous).
    #   "fields": one gather per FIELD from its own dense (C,) column
    #     array — dense (N,) outputs, no padded materialization, no
    #     relayout copy; the gathers fuse into the consuming VPU math.
    A = config.attr_width
    uv_slot = None
    if scene.textures is not None and scene.textures.num_levels > 0:
        if config.mode == MODE_TEXTURED:
            uv_slot = 0
        elif config.mode == MODE_PHONG:
            uv_slot = 6

    if config.deferred_fetch == "fields":
        # integer edge values straight from gathered vertex columns — the
        # exact same int32 expressions as fp.coverage on (N, 3) rows
        xg = [tri.xs[:, i][t] for i in range(3)]
        yg = [tri.ys[:, i][t] for i in range(3)]

        def edge(k):
            k1 = (k + 1) % 3
            a = yg[k1] - yg[k]
            b = xg[k] - xg[k1]
            return a * (px - xg[k]) + b * (py - yg[k])

        # e_k is the edge value OPPOSITE vertex k (fp.coverage order)
        e0, e1, e2 = edge(1), edge(2), edge(0)
        l0, l1, l2 = fp.barycentrics_f32(e0, e1, e2, xp)

        def interp(g):  # same product set / add order as the wide path
            if g < A:
                cs = [tri.attr_w[:, v, g] for v in range(3)]
            else:
                cs = [tri.inv_w[:, v] for v in range(3)]
            return (l0 * cs[0][t] + l1 * cs[1][t]) + l2 * cs[2][t]

        def fetch_mat():
            return tri.mat_id[t]

        lod6 = (
            tuple(c[t] for c in _lod_terms(tri, uv_slot, config, xp))
            if uv_slot is not None
            else None
        )
    else:
        # the MEASURED round-2 shape: one row gather, XLA inserts ONE
        # {0,1} relayout, every consumer is a contiguous column slice.
        # (Round 3 measured and rejected every alternative: per-field
        # gathers 21x slower; multi-record packed tables with select
        # chains or an explicit transpose 4-13x slower at BOTH config3
        # and config5 scale. Touch this block only with a trace in hand.)
        # when lod_fetch == "recompute" the 6 LOD columns stay OUT of the
        # record and are rebuilt per pixel below (bit-exact; pays only in
        # the element-rate gather regime — see RenderConfig.lod_fetch)
        pack_uv = uv_slot if config.lod_fetch == "record" else None
        if config.record_pack == "split":
            # int fields in their OWN int32 table, gathered natively — no
            # int bit patterns ever ride f32 lanes (hazard-free fallback;
            # costs a second (N, 7) gather + relayout vs "value")
            C = tri.capacity
            itab = xp.concatenate(
                [tri.xs, tri.ys, tri.mat_id.reshape(C, 1)], axis=1
            )
            irec = itab[t]  # (H*W, 7) i32
            xs, ys = irec[..., 0:3], irec[..., 3:6]
            fetch_mat_col = lambda: irec[..., 6]
            table, lod_base = _pack_records(
                tri, A, xp, config, pack_uv, ints=False
            )
            rec = table[t]  # (H*W, K-7)
        else:
            table, lod_base = _pack_records(tri, A, xp, config, pack_uv)
            rec = _gather_rows(table, t, config.record_split, xp)  # (N, K)
            unpack_i32 = (
                _bits_to_i32
                if config.record_pack == "bits"
                else (lambda a, xp: a.astype(xp.int32))
            )
            xs = unpack_i32(rec[..., 0:3], xp)
            ys = unpack_i32(rec[..., 3:6], xp)
            fetch_mat_col = lambda: unpack_i32(rec[..., 6], xp)

        _, (e0, e1, e2) = fp.coverage(xs, ys, px, py, xp)
        l0, l1, l2 = fp.barycentrics_f32(e0, e1, e2, xp)

        # perspective-correct interpolation with EXPLICIT per-column math:
        # raw_j = (l0*a0j + l1*a1j) + l2*a2j — the same product set and
        # left-associated add order as a sum(lam[..., None] * attr_w,
        # axis=-2) over (N, 3, A+1), so results are bit-identical, but
        # every consumer is a cheap column slice of the one relayouted
        # record (no (N, 3, A+1) reshape materialization, ~0.9 ms at 1080p).
        att0 = lod_base + (6 if pack_uv is not None else 0)

        def interp(g):  # vertex-major group of 3 columns at att0 + 3*g
            c = att0 + 3 * g
            return (
                l0 * rec[..., c] + l1 * rec[..., c + 1]
            ) + l2 * rec[..., c + 2]

        def fetch_mat():
            return fetch_mat_col()

        if uv_slot is None:
            lod6 = None
        elif config.lod_fetch == "record":
            lod6 = tuple(rec[..., lod_base + i] for i in range(6))
        else:
            lod6 = _lod_terms_px(xs, ys, rec, att0, uv_slot, A, config, xp)

    denom = interp(A)  # interpolated 1/w (last group)
    inv_denom = (1.0 / xp.maximum(denom, 1e-20)).astype(xp.float32)
    # background pixels read record 0's plane far outside the triangle,
    # where denom can underflow to the 1e-20 floor and blow attrs up to
    # ~1e20 (f32 overflow in the squaring downstream — RuntimeWarnings on
    # the numpy path, and garbage in hook-visible Frag fields). Their
    # color is replaced by bg_color either way; zero the attrs at the
    # source so covered pixels are untouched and both backends agree.
    inv_denom = xp.where(bg, xp.float32(0.0), inv_denom)

    def attr(j):
        return interp(j) * inv_denom

    if config.mode == MODE_GOURAUD:
        rgb = xp.stack([attr(0), attr(1), attr(2)], axis=-1)
        return finish(rgb)

    mat_id = fetch_mat()
    mats = scene.materials

    if config.mode == MODE_TEXTURED:
        u, v = attr(0), attr(1)
        lit = xp.stack([attr(2), attr(3), attr(4)], axis=-1)
        texc = _sample_texture(
            scene, config, u, v, lod6, e0, e1, e2, denom, mat_id, xp,
        )
        return finish(texc * lit, mat_id, uv=(u, v))

    assert config.mode == MODE_PHONG
    world = xp.stack([attr(0), attr(1), attr(2)], axis=-1)
    normal = xp.stack([attr(3), attr(4), attr(5)], axis=-1)
    nrm = xp.sqrt(xp.sum(normal * normal, axis=-1, keepdims=True))
    normal = normal / xp.maximum(nrm, 1e-12)
    u, v = attr(6), attr(7)

    # per-CHANNEL gathers from the tiny material table: a multi-column
    # (N, 3) row gather pays the full padded-output tax (~3.7 ms + 1.4 ms
    # relayout at 1080p) while single-column gathers from small tables
    # lower to selects and the stack stays a dense fusion output — same
    # values, ~5 ms cheaper per frame (config4 trace, PERF.md round 3)
    base = xp.stack(
        [mats.base_color[:, c][mat_id] for c in range(3)], axis=-1
    )
    texc = _sample_texture(
        scene, config, u, v, lod6, e0, e1, e2, denom, mat_id, xp,
    )
    base = base * texc

    shadow = None
    if shadow_depth is not None and light_viewproj is not None:
        shadow = sm.shadow_test(
            shadow_depth, world, light_viewproj, config.shadow_bias, xp
        )

    color = sm.shade_phong(
        world,
        normal,
        xp.asarray(eye, xp.float32),
        base,
        mats.ka[mat_id],
        mats.kd[mat_id],
        mats.ks[mat_id],
        mats.shininess[mat_id],
        scene.lights,
        shadow_factor=shadow,
        xp=xp,
    )
    return finish(color, mat_id, uv=(u, v), world=world, normal=normal)


def _is_np(xp) -> bool:
    return xp is np


def _i32_to_bits(a, xp):
    """Reinterpret int32 as float32 (for packing into one record row)."""
    if _is_np(xp):
        return np.ascontiguousarray(a).view(np.float32)
    import jax

    return jax.lax.bitcast_convert_type(a, xp.float32)


def _bits_to_i32(a, xp):
    if _is_np(xp):
        return np.ascontiguousarray(a).view(np.int32)
    import jax

    return jax.lax.bitcast_convert_type(a, xp.int32)


def _pack_records(tri: TriBuf, A: int, xp, config=None, uv_slot=None, ints=True):
    """ONE record table (C, K) f32, gathered per pixel by triangle id:
    xs(3) ys(3) mat_id(1) (ints bitcast), then — when uv_slot is given —
    6 per-RECORD texture-LOD derivative terms (dDdx dDdy dNudx dNudy dNvdx
    dNvdy; the screen-space uv-derivative numerator/denominator derivatives
    depend only on edge coefficients and per-vertex uw/vw/1w, i.e. they are
    constant per triangle — computed per record, not per pixel), then A
    attribute groups of 3 vertex-major columns, then the 1/w group.
    Returns (table, lod_base); LOD terms sit at lod_base..lod_base+5.

    Int fields ride as converted f32 VALUES by default (exact: guard-band
    bounded coords << 2^24) rather than bitcast bit patterns — see
    RenderConfig.record_pack for why bitcast packing is TPU-hazardous."""
    C = tri.capacity
    as_bits = config is not None and getattr(config, "record_pack", "value") == "bits"
    pack_i32 = _i32_to_bits if as_bits else (lambda a, xp: a.astype(xp.float32))
    cols = (
        [
            pack_i32(tri.xs, xp),
            pack_i32(tri.ys, xp),
            pack_i32(tri.mat_id.reshape(C, 1), xp),
        ]
        if ints
        else []
    )
    if uv_slot is not None:
        terms = _lod_terms(tri, uv_slot, config, xp)
        cols.append(xp.stack(terms, axis=-1).astype(xp.float32))
    # attribute groups, vertex-major per attribute, then the 1/w group
    # (whose lam-interpolation is the perspective denominator)
    aw = xp.transpose(tri.attr_w, (0, 2, 1)).reshape(C, 3 * A)
    cols.append(aw.astype(xp.float32))
    cols.append(tri.inv_w.astype(xp.float32))
    return xp.concatenate(cols, axis=1), (7 if ints else 0)


def _gather_rows(table, t, split: int, xp):
    """Per-pixel record-row gather — see sm.split_row_gather
    (RenderConfig.record_split)."""
    return sm.split_row_gather(table, t, split, xp)


def _lod_terms_px(xs, ys, rec, att0, uv_slot, A, config, xp):
    """Per-PIXEL recomputation of the six LOD derivative terms from
    columns the record already carries (RenderConfig.lod_fetch =
    "recompute"): the identical f32 expressions as _lod_terms evaluated on
    the gathered xs/ys/uw/vw/1w instead of per record — same inputs, same
    op order, bit-identical results."""
    sub = float(config.subpixel)
    a, b = fp.edge_coeffs(xs, ys, xp)  # (N, 3) exact ints
    a_opp = xp.stack([a[:, 1], a[:, 2], a[:, 0]], axis=-1).astype(xp.float32)
    b_opp = xp.stack([b[:, 1], b[:, 2], b[:, 0]], axis=-1).astype(xp.float32)
    uw = rec[..., att0 + 3 * uv_slot : att0 + 3 * uv_slot + 3]
    vw = rec[..., att0 + 3 * (uv_slot + 1) : att0 + 3 * (uv_slot + 1) + 3]
    iw = rec[..., att0 + 3 * A : att0 + 3 * A + 3]
    return (
        ((a_opp * iw).sum(-1) * sub).astype(xp.float32),  # dD/dx
        ((b_opp * iw).sum(-1) * sub).astype(xp.float32),  # dD/dy
        ((a_opp * uw).sum(-1) * sub).astype(xp.float32),  # dNu/dx
        ((b_opp * uw).sum(-1) * sub).astype(xp.float32),  # dNu/dy
        ((a_opp * vw).sum(-1) * sub).astype(xp.float32),  # dNv/dx
        ((b_opp * vw).sum(-1) * sub).astype(xp.float32),  # dNv/dy
    )


def _lod_terms(tri: TriBuf, uv_slot, config, xp):
    """The six per-RECORD texture-LOD derivative terms (dDdx dDdy dNudx
    dNudy dNvdx dNvdy), as a list of (C,) f32 arrays. The screen-space
    uv-derivative numerator/denominator derivatives depend only on edge
    coefficients and per-vertex uw/vw/1w — constant per triangle."""
    sub = float(config.subpixel)
    a, b = fp.edge_coeffs(tri.xs, tri.ys, xp)  # (C, 3) exact ints
    # edge OPPOSITE vertex k is edge index (k+1) % 3 (fixedpoint.coverage)
    a_opp = xp.stack([a[:, 1], a[:, 2], a[:, 0]], axis=-1).astype(xp.float32)
    b_opp = xp.stack([b[:, 1], b[:, 2], b[:, 0]], axis=-1).astype(xp.float32)
    uw = tri.attr_w[:, :, uv_slot]
    vw = tri.attr_w[:, :, uv_slot + 1]
    iw = tri.inv_w
    return [
        ((a_opp * iw).sum(-1) * sub).astype(xp.float32),  # dD/dx
        ((b_opp * iw).sum(-1) * sub).astype(xp.float32),  # dD/dy
        ((a_opp * uw).sum(-1) * sub).astype(xp.float32),  # dNu/dx
        ((b_opp * uw).sum(-1) * sub).astype(xp.float32),  # dNu/dy
        ((a_opp * vw).sum(-1) * sub).astype(xp.float32),  # dNv/dx
        ((b_opp * vw).sum(-1) * sub).astype(xp.float32),  # dNv/dy
    ]


def _sample_texture(
    scene, config, u, v, lod6, e0, e1, e2, denom, mat_id, xp,
):
    """Trilinear texture fetch with analytic per-pixel LOD.

    LOD comes from analytic screen-space uv derivatives via the quotient
    rule on the perspective-correct interpolation u = N(p)/D(p)
    (SURVEY.md §7.2.6: no quad-derivative trick needed):
      N(p) = sum_k E_k(p) * (u_k/w_k),  D(p) = sum_k E_k(p) * (1/w_k)
      du/dx = (dNu/dx - u * dD/dx) / D   (u = Nu/D already interpolated)
    The six derivative terms dNu/d{x,y}, dNv/d{x,y}, dD/d{x,y} are constant
    per TRIANGLE and arrive pre-computed in the record row (lod6); only the
    quotient is per-pixel. D is reconstructed as denom * area2 (denom is
    the interpolated 1/w, area2 = e0+e1+e2 exact).
    Returns (N, 3); white where the material has no texture.
    """
    pyr = scene.textures
    if pyr is None or pyr.num_levels == 0:
        return xp.ones(u.shape + (3,), xp.float32)

    area2 = (e0 + e1 + e2).astype(xp.float32)
    D = denom * area2
    invD = (1.0 / xp.where(D == 0.0, 1e-30, D)).astype(xp.float32)
    dudx = (lod6[2] - u * lod6[0]) * invD
    dudy = (lod6[3] - u * lod6[1]) * invD
    dvdx = (lod6[4] - v * lod6[0]) * invD
    dvdy = (lod6[5] - v * lod6[1]) * invD

    tex_id = scene.materials.tex_id[mat_id]
    has_tex = tex_id >= 0
    tid_safe = xp.where(has_tex, tex_id, 0)

    if hasattr(pyr, "base_size_per_tex"):  # RaggedPyramid: per-pixel scale
        base = pyr.base_size_per_tex[tid_safe].astype(xp.float32)
    else:
        base = pyr.base_size
    lod = sm.lod_from_derivs(dudx, dvdx, dudy, dvdy, base, xp)
    addr = None
    if scene.materials.tex_addr is not None:
        addr = scene.materials.tex_addr[mat_id]
    texc = sm.sample_trilinear(
        pyr, tid_safe, u, v, lod, xp, fetch=config.tex_fetch, addr=addr,
        split=config.tex_split, mip_math=config.mip_math,
    )
    return xp.where(has_tex[..., None], texc, 1.0).astype(xp.float32)


def _with_bg(color, bg, config: RenderConfig, xp):
    bgc = xp.asarray(config.bg_color, xp.float32)
    return xp.where(bg[..., None], bgc, color).astype(xp.float32)
