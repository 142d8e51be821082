"""Shared shading formulas — lighting, texture sampling, shadow test.

These are the reference's HLSL pixel/vertex-shader bodies (SURVEY.md §2.1
"Vertex stage"/"Pixel stage") as vectorized array math. Written once against
``xp`` (numpy or jax.numpy) so the CPU oracle and the TPU pipeline shade with
IDENTICAL formulas (SURVEY.md §7.3.3): any remaining cross-backend diff is
sub-ULP transcendental noise, absorbed by the 8-bit golden tolerance.

All color math is float32 in [0,1]-ish linear space; resolve clamps.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Lighting
# ---------------------------------------------------------------------------


def split_row_gather(table, idx, split: int, xp=np):
    """Per-row gather table[idx], optionally as `split` row-range slice
    gathers + one range select (RenderConfig.record_split / tex_split).

    Built for tables past XLA's ~300k-row layout-flip threshold, where a
    single gather runs at element rate (~1.3 ns/element) instead of row
    rate: each sub-threshold slice keeps the row-major {1,0:T(8,128)}
    regime, each pixel still materializes row-rate outputs, and ONE
    xp.where chain keeps its own range's row. Values are identical to
    table[idx] by construction, so the numpy oracle always takes the
    direct path. Measure before enabling (PERF.md gather economics)."""
    if split <= 1 or xp is np:
        return table[idx]
    n = table.shape[0]
    n2 = -(-n // split)
    parts = []
    for i in range(split):
        if i * n2 >= n:
            break  # over-split of a small table: no rows left to slice
        sl = table[i * n2 : min((i + 1) * n2, n)]
        j = xp.clip(idx - i * n2, 0, sl.shape[0] - 1)
        parts.append(sl[j])
    out = parts[-1]
    for i in range(len(parts) - 2, -1, -1):
        keep = (idx < (i + 1) * n2)[..., None]
        out = xp.where(keep, parts[i], out)
    return out


def lambert(normal, light_dir, xp=np):
    """Diffuse factor for a directional light. `light_dir` is the direction
    the light TRAVELS; shading uses -light_dir."""
    return xp.maximum(-xp.sum(normal * light_dir, axis=-1), 0.0)


def shade_vertex_lit(normal, base_color, kd, lights, xp=np, world_pos=None):
    """Per-vertex Gouraud color: ambient + directional diffuse + (when
    `world_pos` is given) attenuated point-light diffuse — the classic
    vertex-lighting model; point lights use the same 1/(1 + 0.05 d^2)
    falloff as shade_phong. With no point lights in the scene the output
    is bit-identical to the directional-only path (the term is not
    traced at all).

    normal (N,3), base_color (N,3), kd (N,), lights: Lights pytree,
    world_pos optional (N,3). Returns (N,3). Used for MODE_GOURAUD and
    the lit tint of MODE_TEXTURED.
    """
    col = lights.ambient[None, :] * base_color
    ld = lights.dir_dirs  # (L,3)
    if ld.shape[0]:
        # (N,L) diffuse factors
        nl = xp.maximum(-(normal @ ld.T), 0.0)
        col = col + kd[:, None] * base_color * (nl @ lights.dir_colors)
    if world_pos is not None and lights.pt_pos.shape[0]:
        for i in range(lights.pt_pos.shape[0]):
            l_vec = lights.pt_pos[i] - world_pos  # (N,3) toward the light
            d2 = xp.sum(l_vec * l_vec, axis=-1)
            l = l_vec / xp.maximum(
                xp.sqrt(xp.sum(l_vec * l_vec, axis=-1, keepdims=True)), 1e-12
            )
            ndl = xp.maximum(xp.sum(normal * l, axis=-1), 0.0)
            att = 1.0 / (1.0 + 0.05 * d2)
            col = col + (
                kd[:, None] * base_color * (ndl * att)[:, None]
            ) * lights.pt_colors[i]
    return col.astype(xp.float32)


def shade_flat_face(face_normal, base_color, kd, lights, xp=np, centroid=None):
    """Per-face flat color (config 1, BASELINE.json:7): same lighting model
    as Gouraud but evaluated once per triangle with the geometric normal
    (point lights, when present, use the face CENTROID as the surface
    position — pass the identical centroid expression from every caller
    so oracle/device stay bit-equal)."""
    return shade_vertex_lit(
        face_normal, base_color, kd, lights, xp, world_pos=centroid
    )


def shade_phong(
    world_pos,
    normal,
    view_pos,
    base_color,
    ka,
    kd,
    ks,
    shininess,
    lights,
    shadow_factor=None,
    xp=np,
):
    """Blinn-Phong with multiple directional + point lights (config 4,
    BASELINE.json:10). All per-pixel args are (..., 3) / (...,).

    shadow_factor: optional (...,) multiplier applied to light 0's
    (directional) contribution — the shadow-map test result.

    SHADOW CONTRACT: only DIRECTIONAL LIGHT 0 casts shadows. The frame
    program renders exactly one shadow-map depth pass, from the light that
    xr.pipeline.shadow.light_matrices_for_scene fits (directional light 0);
    additional directional lights and all point lights are always unshadowed
    fill lights. Contract test: tests/test_textured_phong.py::
    test_only_light0_casts_shadows.
    """
    n = normal
    v = view_pos - world_pos
    v = v / xp.maximum(xp.sqrt(xp.sum(v * v, axis=-1, keepdims=True)), 1e-12)

    col = ka[..., None] * lights.ambient * base_color

    def one_light(l_vec, l_color, att, shadowed):
        # l_vec: direction from surface TOWARD the light, unnormalized ok
        l = l_vec / xp.maximum(
            xp.sqrt(xp.sum(l_vec * l_vec, axis=-1, keepdims=True)), 1e-12
        )
        ndl = xp.maximum(xp.sum(n * l, axis=-1), 0.0)
        h = l + v
        h = h / xp.maximum(xp.sqrt(xp.sum(h * h, axis=-1, keepdims=True)), 1e-12)
        ndh = xp.maximum(xp.sum(n * h, axis=-1), 0.0)
        spec = xp.where(ndl > 0.0, ndh**shininess, 0.0)
        c = (kd[..., None] * base_color * ndl[..., None] + (ks * spec)[..., None]) * l_color
        c = c * att[..., None]
        if shadowed is not None:
            c = c * shadowed[..., None]
        return c

    out = col
    nd = lights.dir_dirs.shape[0]
    for i in range(nd):
        l_vec = xp.broadcast_to(-lights.dir_dirs[i], world_pos.shape).astype(xp.float32)
        att = xp.ones(world_pos.shape[:-1], xp.float32)
        sf = shadow_factor if i == 0 else None
        out = out + one_light(l_vec, lights.dir_colors[i], att, sf)
    for i in range(lights.pt_pos.shape[0]):
        l_vec = lights.pt_pos[i] - world_pos
        d2 = xp.sum(l_vec * l_vec, axis=-1)
        att = 1.0 / (1.0 + 0.05 * d2)
        out = out + one_light(l_vec, lights.pt_colors[i], att, None)
    return out.astype(xp.float32)


# ---------------------------------------------------------------------------
# Texture sampling (flattened mip pyramid; see types.TexturePyramid)
# ---------------------------------------------------------------------------


def lod_from_derivs(dudx, dvdx, dudy, dvdy, base_size, xp=np):
    """Mip LOD from screen-space uv derivatives (per pixel), texels/pixel.

    lod = 0.5 * log2(max(|d(uv*S)/dx|^2, |d(uv*S)/dy|^2)) — the standard
    GPU footprint rule with the max-axis metric. base_size is a scalar for
    the uniform pyramid or a per-pixel f32 array for RaggedPyramid.
    """
    s = float(base_size) if np.isscalar(base_size) else base_size
    # clamp before squaring: degenerate/background pixels can carry huge
    # derivatives (1/D blowup) that overflow f32 in the square; the lod is
    # clamped to the last mip level either way
    lim = xp.float32(1e18)

    def _sq(d):
        c = xp.clip(d * s, -lim, lim)
        return c * c

    rx = _sq(dudx) + _sq(dvdx)
    ry = _sq(dudy) + _sq(dvdy)
    rho2 = xp.maximum(xp.maximum(rx, ry), 1e-12)
    return (0.5 * (xp.log(rho2) * (1.0 / np.log(2.0)))).astype(xp.float32)


def sample_trilinear(pyramid, tex_id, u, v, lod, xp=np, fetch="wide",
                     addr=None, split: int = 1, mip_math: str = "table"):
    """Perspective-correct trilinear texture sample.

    pyramid: TexturePyramid; tex_id (...,) i32; u, v (...,) f32 (any range,
    repeat-wrapped); lod (...,) f32. Returns (..., 3) f32.
    fetch: "wide" = one 13-col row gather per pixel (default, fastest
    measured at every scale); "twolevel" = two 4-texel own-quad gathers
    (l0 + l1 rows); "fields" = 13 dense per-column gathers. All
    bit-identical — RenderConfig.tex_fetch (see its comment for the
    measured economics).
    addr: optional (...,) i32 per-pixel address mode (Material.tex_addr):
    0 = repeat-wrap, 1 = clamp-to-edge. Clamp is implemented by clamping
    the sample position to the COARSER mip level's half-texel interior, so
    no bilinear footprint ever crosses an edge and the wrap-packed quad
    layout stays valid — border filtering is clamped at the l1 half-texel
    (a documented, oracle-shared approximation of per-level clamping).

    Implementation: sample BOTH bracketing mip levels for every pixel by
    gathering from the flattened QUAD pyramid (one gather fetches the whole
    2x2 bilinear footprint as four RGB8-packed u32 texels; see
    TexturePyramid.quads) with per-pixel level offsets. The level tables are
    tiny static arrays; everything else is gathers + VPU unpack/lerps
    (BASELINE.json:5 "vectorized gathers with mip selection").
    """
    L = pyramid.num_levels

    lf = xp.clip(lod, 0.0, float(L - 1))
    l0 = xp.floor(lf)
    frac = (lf - l0).astype(xp.float32)
    l0 = l0.astype(xp.int32)
    l1 = xp.minimum(l0 + 1, L - 1)

    ragged = hasattr(pyramid, "base_size_per_tex")  # RaggedPyramid
    if ragged:
        if mip_math == "closed":
            raise ValueError(
                "mip_math='closed' needs a uniform TexturePyramid (one "
                "shared power-of-two chain); RaggedPyramid sizes/offsets "
                "are per-texture data, not closed-form"
            )
        ls_flat = xp.asarray(pyramid.level_size).reshape(-1)
        lo_flat = xp.asarray(pyramid.level_offset).reshape(-1)

        def size_at(lk):
            return ls_flat[tex_id * L + lk]

        def qbase(lk):
            return lo_flat[tex_id * L + lk]
    elif mip_math == "closed":
        # Closed-form mip sizes/offsets: the tiny static level tables lower
        # to per-pixel compare/select chains (~1 ms each at 1080p); the
        # same values fall out of exact (N,) integer VPU math instead.
        #   s(l)      = base >> l          (power-of-two chain, no clamp)
        #   offset(l) = sum_{j<l} (base>>j)^2 = 4*(base^2 - s^2) / 3
        # The numerator is 4^(m-l)*(4^l - 1), always divisible by 3, so
        # the floor division is exact — bit-identical to the table values.
        base = pyramid.base_size
        if (base >> (L - 1)) < 1:
            raise ValueError(
                "mip_math='closed' requires num_levels <= log2(base)+1 "
                f"(base {base}, levels {L}: the 1x1 clamp breaks the "
                "geometric offset form)"
            )
        if base & (base - 1):
            # a non-pow2 base makes s = base >> l diverge from the true
            # level sizes (10 >> 1 == 5 but the table halves to 5 too —
            # yet offsets diverge: verified 128 vs 125 at base=10, L=3);
            # build_pyramid asserts pow2, but a hand-built pyramid must
            # fail loudly here instead of sampling wrong texels (ADVICE r4)
            raise ValueError(
                f"mip_math='closed' requires a power-of-two base (got {base})"
            )
        if base > 16384:
            # (b2 - s*s) * 4 is int32: base^2*4 overflows past 2^31 for
            # base >= 32768, producing garbage offsets silently (ADVICE r4)
            raise ValueError(
                f"mip_math='closed' requires base <= 16384 (got {base}: "
                "4*base^2 overflows int32)"
            )
        P = pyramid.quads.shape[1]
        base_i = xp.asarray(base, xp.int32)
        b2 = xp.asarray(base * base, xp.int32)

        def size_at(lk):
            return base_i >> lk

        def qbase(lk):
            s = base_i >> lk
            return tex_id * P + ((b2 - s * s) * 4) // 3
    else:
        base = pyramid.base_size
        sizes = xp.asarray([max(base >> k, 1) for k in range(L)], xp.int32)
        offsets = xp.asarray(
            [pyramid.level_offset(k) for k in range(L)], xp.int32
        )
        P = pyramid.quads.shape[1]

        def size_at(lk):
            return sizes[lk]

        def qbase(lk):
            return tex_id * P + offsets[lk]

    inv255 = xp.float32(1.0 / 255.0)

    uw = u - xp.floor(u)
    vw = v - xp.floor(v)
    if addr is None:
        u, v = uw, vw
    else:
        # clamp-to-edge: pin to the coarser level's half-texel interior
        # (keeps both levels' footprints off the wrap seam; see docstring)
        s1f = size_at(l1).astype(xp.float32)
        half = xp.float32(0.5) / s1f
        uc = xp.clip(u, half, 1.0 - half).astype(xp.float32)
        vc = xp.clip(v, half, 1.0 - half).astype(xp.float32)
        clamped = addr == 1
        u = xp.where(clamped, uc, uw).astype(xp.float32)
        v = xp.where(clamped, vc, vw).astype(xp.float32)

    def unpack_ch(q, shift):
        # one RGB8 channel of a packed u32 -> (...,) f32 in [0, 1].
        # Channel-at-a-time keeps every intermediate a single framebuffer-
        # sized array (the (..., 3) stacked variant materialized 8 stacks
        # per sample = ~200 MB/frame of extra HBM traffic at 1080p).
        c = (q >> shift) & 0xFF if shift else q & 0xFF
        return c.astype(xp.float32) * inv255

    def fractions(lk):
        """Bilinear anchor + fractions at per-pixel level lk."""
        s = size_at(lk)
        sf = s.astype(xp.float32)
        tu = u * sf - 0.5
        tv = v * sf - 0.5
        i0 = xp.floor(tu)
        j0 = xp.floor(tv)
        fu = (tu - i0).astype(xp.float32)
        fv = (tv - j0).astype(xp.float32)
        return i0.astype(xp.int32), j0.astype(xp.int32), fu, fv, s

    def bilerp_ch(t00, t01, t10, t11, fu, fv):
        # scalar-channel bilerp: same op order as the stacked version
        top = t00 + (t01 - t00) * fu
        bot = t10 + (t11 - t10) * fu
        return top + (bot - top) * fv

    i0, j0, fu0, fv0, s0 = fractions(l0)
    # the ONLY texture gather — own quad + parent 3x3. Indexed through a
    # FLAT 2-D view: gathering from the 3-D (Ntex, P, 13) table made XLA
    # assign the operand a {2,0,1:T(2,128)} layout (13-axis across lanes,
    # ~90% waste) that ran 7 ns/row; the 2-D view gets the natural
    # {1,0:T(8,128)} VMEM layout like every other record table (~2 ns/row).
    # (A transposed (13, Ntex*P) column gather was also tried: XLA lowers it
    # to per-field slice-reduce ops, 10x slower — see PERF.md round 2.)
    K = pyramid.quads.shape[-1]
    flat_q = pyramid.quads.reshape(-1, K)
    qidx = qbase(l0) + (j0 & (s0 - 1)) * s0 + (i0 & (s0 - 1))
    if fetch == "twolevel":
        # The l1 anchor's OWN quad row holds exactly the four texels the
        # wide path's parent-3x3 select picks (the 3x3 anchored at
        # (j0//2-1, i0//2-1) contains the 2x2 at (j1, i1)), so fetching it
        # directly is bit-identical and needs no di/dj selects. Fetches
        # 2Mx8 elements vs wide's 2Mx13, which should win in the big-table
        # element-rate gather regime (459k-row config6 table: the 13-col
        # gather flips column-major and costs 12.8 ms) — but MEASURED 8.4
        # ms SLOWER end-to-end (97.1 vs 88.7 ms, two runs); kept
        # selectable for re-testing. See PERF.md round 3.
        i1, j1, fu1, fv1, s1 = fractions(l1)
        own = flat_q[:, :4]
        rowA = own[qidx]
        qidx1 = qbase(l1) + (j1 & (s1 - 1)) * s1 + (i1 & (s1 - 1))
        rowB = own[qidx1]
        chans = []
        for shift in (0, 8, 16):
            c0 = bilerp_ch(
                unpack_ch(rowA[..., 0], shift), unpack_ch(rowA[..., 1], shift),
                unpack_ch(rowA[..., 2], shift), unpack_ch(rowA[..., 3], shift),
                fu0, fv0,
            )
            c1 = bilerp_ch(
                unpack_ch(rowB[..., 0], shift), unpack_ch(rowB[..., 1], shift),
                unpack_ch(rowB[..., 2], shift), unpack_ch(rowB[..., 3], shift),
                fu1, fv1,
            )
            chans.append(c0 + (c1 - c0) * frac)
        return xp.stack(chans, axis=-1).astype(xp.float32)
    if fetch == "fields":
        qcols = [flat_q[:, c] for c in range(K)]

        def rowc(c):
            return qcols[c][qidx]
    else:
        # one row gather + one relayout; split > 1 cuts the table into
        # sub-threshold row ranges (split_row_gather — the lossless dodge
        # for >~300k-row ragged tables whose single gather flips to
        # element rate, e.g. config6's 459k rows at 12.8 ms)
        row = split_row_gather(flat_q, qidx, split, xp)

        def rowc(c):
            return row[..., c]

    # parent level: 3x3 block anchored at (j0//2 - 1, i0//2 - 1); the true
    # bilinear anchor (i1, j1) is inside it with relative offset in {0, 1}
    i1, j1, fu1, fv1, _ = fractions(l1)
    # NOTE floor division of the possibly-negative unwrapped i0 matches the
    # packer's (i//2 - 1) on wrapped coords because both are mod size/2
    di = i1 - (_floor_div2(i0, xp) - 1)  # in {0, 1}
    dj = j1 - (_floor_div2(j0, xp) - 1)
    di1 = di == 1
    dj1 = dj == 1

    # select the parent 2x2 quad in PACKED u32 space (4 selects on u32
    # instead of 12 on unpacked f32 triples)
    def parent_q(r, c):
        # texel (dj+r, di+c) of the 3x3 block: channels 4 + 3*(dj+r)+(di+c)
        base_idx = 4 + 3 * r + c
        a = xp.where(di1, rowc(base_idx + 1), rowc(base_idx))
        b = xp.where(di1, rowc(base_idx + 4), rowc(base_idx + 3))
        return xp.where(dj1, b, a)

    p00 = parent_q(0, 0)
    p01 = parent_q(0, 1)
    p10 = parent_q(1, 0)
    p11 = parent_q(1, 1)

    chans = []
    for shift in (0, 8, 16):
        c0 = bilerp_ch(
            unpack_ch(rowc(0), shift), unpack_ch(rowc(1), shift),
            unpack_ch(rowc(2), shift), unpack_ch(rowc(3), shift),
            fu0, fv0,
        )
        c1 = bilerp_ch(
            unpack_ch(p00, shift), unpack_ch(p01, shift),
            unpack_ch(p10, shift), unpack_ch(p11, shift),
            fu1, fv1,
        )
        chans.append(c0 + (c1 - c0) * frac)
    return xp.stack(chans, axis=-1).astype(xp.float32)


def _floor_div2(a, xp):
    """Floor division by 2 for possibly-negative int32 (arithmetic shift)."""
    return a >> 1


# ---------------------------------------------------------------------------
# Shadow-map test
# ---------------------------------------------------------------------------


def shadow_test(shadow_depth, world_pos, light_viewproj, bias, xp=np):
    """1.0 where lit, 0.0 where in shadow (nearest-sample compare).

    shadow_depth: (Hs, Ws) f32 depth map rendered from the light (depth-only
    pass, config 4 two-pass frame, BASELINE.json:10). world_pos (..., 3).
    """
    hs, ws = shadow_depth.shape
    n = world_pos.shape[:-1]
    p4 = xp.concatenate(
        [world_pos, xp.ones(n + (1,), xp.float32)], axis=-1
    )
    clip = p4 @ light_viewproj.T
    w = xp.maximum(clip[..., 3], 1e-12)
    ndc_x = clip[..., 0] / w
    ndc_y = clip[..., 1] / w
    z = clip[..., 2] / w
    sx = (ndc_x * 0.5 + 0.5) * ws
    sy = (0.5 - ndc_y * 0.5) * hs
    # sanitize before the f32->i32 cast: background pixels carry garbage
    # world positions whose NaN/inf survive to sx/sy, and a NaN->int cast
    # is undefined (and differs between numpy and XLA). The result is
    # masked by `inside` below either way; this just pins the bits.
    sx = xp.nan_to_num(sx, nan=0.0, posinf=0.0, neginf=0.0)
    sy = xp.nan_to_num(sy, nan=0.0, posinf=0.0, neginf=0.0)
    # clip in f32 BEFORE the int cast: a finite but out-of-int32-range
    # float -> int32 cast is undefined (and warns under numpy); clipping
    # first pins the bits identically on both backends.
    ix = xp.clip(xp.floor(sx), 0.0, float(ws - 1)).astype(xp.int32)
    iy = xp.clip(xp.floor(sy), 0.0, float(hs - 1)).astype(xp.int32)
    flat = iy * ws + ix
    if (hs * ws) % 8 == 0:
        # fetch the 8-texel row containing the sample and select the slot:
        # single-element gathers cost ~10 ns/texel on this TPU (21 ms/frame
        # at 1080p for a 1024^2 map), and a 2-texel-row view of a 1024^2
        # map still has 524k rows — past the table layout-flip threshold,
        # where the gather degrades to element rate (~9 ms, round-3
        # config4 trace). An 8-texel row view (131k rows) stays row-major:
        # one amortized row gather + one relayout + fused selects (~5 ms).
        r = shadow_depth.reshape(-1, 8)[flat >> 3]
        s = flat & 7
        d = r[..., 0]
        for k in range(1, 8):
            d = xp.where(s == k, r[..., k], d)
    elif (hs * ws) % 2 == 0:
        r = shadow_depth.reshape(-1, 2)[flat >> 1]
        d = xp.where((flat & 1) == 1, r[..., 1], r[..., 0])
    else:
        d = shadow_depth.reshape(-1)[flat]
    inside = (
        (ndc_x >= -1.0) & (ndc_x <= 1.0) & (ndc_y >= -1.0) & (ndc_y <= 1.0)
        & (z >= 0.0) & (z <= 1.0)
    )
    lit = xp.where(inside & (z - bias > d), 0.0, 1.0)
    return lit.astype(xp.float32)


# ---------------------------------------------------------------------------
# Resolve
# ---------------------------------------------------------------------------


def resolve_u8(color_f32, xp=np):
    """Linear f32 color -> u8 with round-half-up; identical on both sides."""
    c = xp.clip(color_f32, 0.0, 1.0)
    return xp.floor(c * 255.0 + 0.5).astype(xp.uint8)
