"""Geometry stage: vertex transform, clipping, triangle setup.

This is the reference's vertex shader PLUS the fixed-function stages that are
invisible in its repo — primitive assembly, near/guard-band clipping,
viewport transform, triangle setup (SURVEY.md §3.3: "this invisible middle is
~60% of the new framework's code"). Everything here is static-shape,
vectorized array code parameterized by ``xp`` (numpy or jax.numpy): executed
with numpy it IS the CPU oracle's geometry stage; traced with jax.numpy it is
the device pipeline — one source of semantics (SURVEY.md §7.3.3).

Clipping is Sutherland-Hodgman against 6 clip-space planes (near z>=0,
far z<=w, guard-band |x|<=g*w, |y|<=g*w) with STATIC topology: a triangle
clipped by 6 planes yields at most 9 vertices, fanned into at most 7
triangles (SURVEY.md §7.3.2 — no variable vertex counts in an XLA world).
The guard band keeps post-clip screen coordinates bounded so integer edge
functions cannot overflow (xr/core/fixedpoint.py).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
from flax import struct

from xr.core import fixedpoint as fp
from xr.core import math3d as m3
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

# Max vertices a triangle can have after clipping by 6 planes; max fan tris.
MAX_CLIP_VERTS = 9
MAX_FAN = MAX_CLIP_VERTS - 2  # 7


class TriBuf(struct.PyTreeNode):
    """Setup triangles, compacted to a static capacity (SoA).

    xs, ys:   (C, 3) i32 — fixed-point screen coords (positive orientation)
    z:        (C, 3) f32 — NDC depth per vertex
    inv_w:    (C, 3) f32 — 1/clip.w per vertex
    attr_w:   (C, 3, A) f32 — per-vertex attributes premultiplied by 1/w
    face_rgb: (C, 3) f32 — flat-shading payload (per source triangle)
    mat_id:   (C,)  i32 — material index payload
    src_id:   (C,)  i32 — SOURCE triangle index (input mesh order); clipped
                    fan records carry their parent triangle's id. The blend
                    pass composites in src_id order, so back-to-front blend
                    semantics survive clipping (ADVICE r3: fans are emitted
                    at the buffer end, so record order alone is wrong for
                    partially-clipped transparent geometry)
    valid:    (C,)  bool
    count:    ()    i32 — number of valid entries (<= C)
    overflow: ()    i32 — triangles dropped because capacity was exceeded
                    (SURVEY.md §7.3.1: fixed capacity + loud overflow counter)
    """

    xs: Any
    ys: Any
    z: Any
    inv_w: Any
    attr_w: Any
    face_rgb: Any
    mat_id: Any
    src_id: Any
    valid: Any
    count: Any
    overflow: Any
    # static SOURCE triangle count (0 = unknown): bounds live records at
    # num_src + clip_budget*(MAX_FAN-1) even when the identity record
    # layout makes capacity much larger — the streaming kernel sizes its
    # block count from this bound instead of from capacity (which silently
    # multiplied record-gather cost; VERDICT r4 #3 / PERF.md round 3)
    num_src: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.xs.shape[0]


def clip_capacity(num_tris: int, config: RenderConfig) -> int:
    return int(np.ceil(num_tris * config.clip_expand)) + 64


def clip_budget(num_tris: int, config: RenderConfig) -> int:
    """Static Sutherland-Hodgman budget (tris that CROSS a clip plane)."""
    b = config.clip_budget or max(1024, num_tris // 16)
    return min(b, num_tris)


def identity_layout(num_tris: int, config: RenderConfig, capacity: int) -> bool:
    """True when geometry() takes the identity record-layout branch
    (capacity covers every possible output; no compaction gather). The
    stream kernel's entry sizing stays honest here because it bounds live
    records by TriBuf.num_src — see stream_blocks."""
    return capacity >= num_tris + clip_budget(num_tris, config) * MAX_FAN


def _is_np(xp) -> bool:
    return xp is np


def _no_fuse(x, xp):
    """Materialize (round) an intermediate so XLA cannot FMA-fuse across it
    (numpy always rounds; identical rounding keeps oracle/device bit-equal —
    this environment forces --xla_allow_excess_precision)."""
    if _is_np(xp):
        return x
    import jax

    return jax.lax.optimization_barrier(x)


def _plane_distances(pos4, planes, xp):
    """Signed distances of (..., 4) clip positions to (P, 4) planes, with a
    FIXED f32 op order (each product rounded, left-assoc adds) so the numpy
    oracle and XLA produce bit-identical values; classification and clip
    interpolation both hinge on these exact bits (SURVEY.md §7.3.3)."""
    terms = [
        _no_fuse(pos4[..., None, c] * planes[:, c], xp) for c in range(4)
    ]
    return ((terms[0] + terms[1]) + terms[2]) + terms[3]  # (..., P)


def _row_scatter(dst, rows, cols, src, mask, xp):
    """dst[rows, cols] = src where mask (rows/cols/src/mask same shape).

    numpy and jax have different scatter APIs; this is the one place the
    backends diverge. Masked-out writes go to a discard column.
    """
    ncols = dst.shape[1]
    cols = xp.where(mask, cols, ncols)  # out-of-range = dropped
    if _is_np(xp):
        out = np.concatenate([dst, np.zeros_like(dst[:, :1])], axis=1)
        r = np.broadcast_to(rows, cols.shape)
        out[r.reshape(-1), cols.reshape(-1)] = src.reshape((-1,) + src.shape[2:])
        return out[:, :ncols]
    import jax.numpy as jnp

    pad = [(0, 0), (0, 1)] + [(0, 0)] * (dst.ndim - 2)
    out = jnp.pad(dst, pad)
    r = jnp.broadcast_to(rows, cols.shape)
    out = out.at[r, cols].set(src, mode="drop")
    return out[:, :ncols]


def _plane_vectors(guard: float, xp):
    """6 clip planes as (6,4) rows p with keep-condition dot(p, clip) >= 0."""
    g = float(guard)
    return xp.asarray(
        [
            [0.0, 0.0, 1.0, 0.0],  # near: z >= 0
            [0.0, 0.0, -1.0, 1.0],  # far:  w - z >= 0
            [1.0, 0.0, 0.0, g],  # left:  x + g*w >= 0
            [-1.0, 0.0, 0.0, g],  # right: g*w - x >= 0
            [0.0, 1.0, 0.0, g],  # y-:    y + g*w >= 0
            [0.0, -1.0, 0.0, g],  # y+:    g*w - y >= 0
        ],
        xp.float32,
    )


def clip_triangles(pos, attr, guard: float, xp=np):
    """Sutherland-Hodgman clip of (T,3,4) clip-space triangles (+ (T,3,A)
    attributes) against the 6 planes. Static shapes throughout.

    Returns (poly_pos (T,MAXV,4), poly_attr (T,MAXV,A), counts (T,)).
    Polygons with count < 3 are fully clipped away.
    """
    T = pos.shape[0]
    A = attr.shape[2]
    MAXV = MAX_CLIP_VERTS
    poly = xp.zeros((T, MAXV, 4 + A), xp.float32)
    poly = _row_scatter(
        poly,
        xp.arange(T)[:, None],
        xp.broadcast_to(xp.arange(3)[None, :], (T, 3)),
        xp.concatenate([pos, attr], axis=2).astype(xp.float32),
        xp.ones((T, 3), bool),
        xp,
    )
    cnt = xp.full((T,), 3, xp.int32)

    planes = _plane_vectors(guard, xp)
    slot = xp.broadcast_to(xp.arange(MAXV)[None, :], (T, MAXV))

    for p in range(6):
        pl = planes[p : p + 1]
        d = _plane_distances(poly[:, :, :4], pl, xp)[..., 0]  # (T, MAXV)
        live = slot < cnt[:, None]
        # "next" vertex = roll by one with the polygon wrap fixed up at the
        # last live slot (elementwise; gathers here dominated the frame)
        is_last = slot == (cnt[:, None] - 1)
        d_next = xp.where(is_last, d[:, 0][:, None], xp.roll(d, -1, axis=1))
        v_next = xp.where(
            is_last[:, :, None],
            poly[:, 0][:, None, :],
            xp.roll(poly, -1, axis=1),
        )
        inside = (d >= 0.0) & live
        crosses = ((d >= 0.0) != (d_next >= 0.0)) & live
        denom = d - d_next
        t = xp.where(crosses, d / xp.where(denom == 0.0, 1.0, denom), 0.0).astype(
            xp.float32
        )
        # round the product BEFORE the add on both backends: XLA otherwise
        # contracts this lerp into an FMA, and vertices cut exactly on a
        # plane get z = +-eps instead of numpy's exact 0 — which flips
        # (z, id) depth ties between coplanar clipped surfaces
        step = _no_fuse(t[:, :, None] * (v_next - poly), xp)
        inter = poly + step

        emit = inside.astype(xp.int32) + crosses.astype(xp.int32)
        start = xp.cumsum(emit, axis=1) - emit  # exclusive prefix sum
        new_poly = xp.zeros_like(poly)
        rows = xp.arange(T)[:, None]
        new_poly = _row_scatter(new_poly, rows, start, poly, inside, xp)
        new_poly = _row_scatter(
            new_poly, rows, start + inside.astype(xp.int32), inter, crosses, xp
        )
        poly = new_poly
        cnt = xp.sum(emit, axis=1).astype(xp.int32)

    return poly[:, :, :4], poly[:, :, 4:], cnt


def _vertex_stage(scene: Scene, view, proj, config: RenderConfig, xp=np):
    """Transform vertices and compute per-vertex attributes / per-tri payload.

    Returns (clip_pos (V,4), attrs (V,A), face_rgb (T,3)).
    The view-proj transform is the fused MXU matmul of BASELINE.json:5.
    """
    mesh = scene.mesh
    mode = config.mode
    prec = None if _is_np(xp) else "highest"

    mats = scene.model_matrices[mesh.transform_id]  # (V,4,4) gather
    p4 = xp.concatenate(
        [mesh.positions, xp.ones((mesh.num_vertices, 1), xp.float32)], axis=1
    )
    world4 = xp.einsum("vij,vj->vi", mats, p4).astype(xp.float32)
    world = world4[:, :3]
    n_world = xp.einsum("vij,vj->vi", mats[:, :3, :3], mesh.normals).astype(xp.float32)
    n_world = m3.normalize(n_world, xp)

    vp = (proj @ view).astype(xp.float32)
    clip = m3.transform_points(world, vp, xp, precision=prec).astype(xp.float32)

    A = config.attr_width
    attrs = xp.zeros((mesh.num_vertices, A), xp.float32)
    T = mesh.num_triangles
    face_rgb = xp.zeros((T, 3), xp.float32)

    # point lights (when present) need surface positions in the vertex-lit
    # modes; None when absent so the directional-only trace is unchanged
    has_pt = scene.lights.pt_pos.shape[0] > 0
    mat = scene.materials
    if mode == MODE_FLAT:
        i0, i1, i2 = mesh.indices[:, 0], mesh.indices[:, 1], mesh.indices[:, 2]
        e1 = world[i1] - world[i0]
        e2 = world[i2] - world[i0]
        fn = m3.normalize(m3.cross(e1, e2, xp), xp)
        base = mat.base_color[mesh.material_id]
        kd = mat.kd[mesh.material_id]
        centroid = (
            ((world[i0] + world[i1]) + world[i2]) * xp.float32(1.0 / 3.0)
            if has_pt
            else None
        )
        face_rgb = sm.shade_flat_face(
            fn, base, kd, scene.lights, xp, centroid=centroid
        )
    elif mode == MODE_GOURAUD:
        vm = _vert_mat(mesh, xp)
        base = mat.base_color[vm]
        kd = mat.kd[vm]
        attrs = sm.shade_vertex_lit(
            n_world, base, kd, scene.lights, xp,
            world_pos=world if has_pt else None,
        )
    elif mode == MODE_TEXTURED:
        vm = _vert_mat(mesh, xp)
        base = mat.base_color[vm]
        kd = mat.kd[vm]
        lit = sm.shade_vertex_lit(
            n_world, base, kd, scene.lights, xp,
            world_pos=world if has_pt else None,
        )
        attrs = xp.concatenate([mesh.uvs, lit], axis=1).astype(xp.float32)
    elif mode == MODE_PHONG:
        attrs = xp.concatenate([world, n_world, mesh.uvs], axis=1).astype(xp.float32)
    elif mode == MODE_DEPTH_ONLY:
        pass
    return clip, attrs, face_rgb


def _vert_mat(mesh, xp):
    """Per-vertex material id: the LOWEST material id among triangles using
    the vertex. A min-reduction scatter is order-independent, so numpy and
    XLA (whose duplicate-index scatter-set order is unspecified) agree
    bit-for-bit (SURVEY.md §7.3.3).

    SCENE-STATIC: prefer attaching it host-side (Mesh.vert_mat, see
    xr.scene.procedural.with_vert_mat) — the device scatter serializes
    (22 ms/frame at 1M tris). This fallback keeps ad-hoc scenes working."""
    if mesh.vert_mat is not None:
        return mesh.vert_mat
    V = mesh.num_vertices
    idx = mesh.indices.reshape(-1)
    val = xp.repeat(mesh.material_id, 3).astype(xp.int32)
    big = xp.full((V,), 2**30, xp.int32)
    if _is_np(xp):
        out = big.copy()
        np.minimum.at(out, idx, val)
    else:
        out = big.at[idx].min(val)
    return xp.where(out == 2**30, 0, out)



def _swap_v12(arr, flip, xp):
    """Swap vertices 1 and 2 where `flip`; vertex axis is -1 for coord
    arrays (..., 3) and -2 for attr arrays (..., 3, A)."""
    if arr.shape[-1] == 3 and arr.ndim == flip.ndim + 1:
        fm = flip[..., None]
        swapped = xp.stack([arr[..., 0], arr[..., 2], arr[..., 1]], axis=-1)
    else:
        fm = flip[..., None, None]
        swapped = xp.stack(
            [arr[..., 0, :], arr[..., 2, :], arr[..., 1, :]], axis=-2
        )
    return xp.where(fm, swapped, arr)


def _project_snap(fpos, fattr, config: RenderConfig, xp):
    """Project clip-space triangles to snapped screen ints + setup culls.

    fpos: (..., 3, 4); fattr: (..., 3, A).
    Returns (xs, ys, z, inv_w, attr_w, valid), leading shape preserved.
    Op order here is the binding f32 sequence (oracle == device,
    SURVEY.md §7.3.3).
    """
    sub = config.subpixel
    w = xp.maximum(fpos[..., 3], 1e-12)
    inv_w = (1.0 / w).astype(xp.float32)
    ndc_x = fpos[..., 0] * inv_w
    ndc_y = fpos[..., 1] * inv_w
    z = (fpos[..., 2] * inv_w).astype(xp.float32)
    sx = (ndc_x * 0.5 + 0.5) * config.width
    sy = (0.5 - ndc_y * 0.5) * config.height
    # clamp only affects tris already outside the guard band (they are
    # culled by the validity mask); keeps the f32->i32 snap well-defined
    lim = float(8 * max(config.width, config.height) + 64)
    sx = xp.clip(sx, -lim, lim)
    sy = xp.clip(sy, -lim, lim)
    xs = fp.snap_to_fixed(sx, sub, xp)
    ys = fp.snap_to_fixed(sy, sub, xp)

    area2 = fp.doubled_area(xs, ys, xp)
    if config.cull_backfaces:
        orient_ok = area2 > 0
        flip = xp.zeros(area2.shape, bool)
    else:
        orient_ok = area2 != 0
        flip = area2 < 0
    xs = _swap_v12(xs, flip, xp)
    ys = _swap_v12(ys, flip, xp)
    z = _swap_v12(z, flip, xp)
    inv_w = _swap_v12(inv_w, flip, xp)
    if fattr.shape[-1]:
        fattr = _swap_v12(fattr, flip, xp)

    # screen-rect reject (pixel centers live at sub/2 + k*sub)
    half = sub // 2
    min_x = xp.min(xs, axis=-1)
    max_x = xp.max(xs, axis=-1)
    min_y = xp.min(ys, axis=-1)
    max_y = xp.max(ys, axis=-1)
    on_screen = (
        (max_x >= half)
        & (min_x <= (config.width - 1) * sub + half)
        & (max_y >= half)
        & (min_y <= (config.height - 1) * sub + half)
    )
    valid = orient_ok & on_screen
    attr_w = (
        (fattr * inv_w[..., None]).astype(xp.float32)
        if fattr.shape[-1]
        else fattr
    )
    return xs, ys, z, inv_w, attr_w, valid


def _project_snap_cols(corners, A, config: RenderConfig, xp):
    """Per-corner COLUMN variant of _project_snap (path A, (T,) leading
    shape): identical per-element f32/int op order, but inputs are three
    gathered (T, 4+A) corner rows (corner_fetch='percorner') and all math
    runs on dense (T,) column slices — no (T,3,4) materialization, no 3-D
    layout copies. Stacks to the (T,3)/(T,3,A) output shapes once at the
    end. Bit-identical to _project_snap by construction (elementwise ops
    commute with the vertex-axis permutation; min/max/selects are exact)."""
    sub = config.subpixel
    lim = float(8 * max(config.width, config.height) + 64)
    xs_c, ys_c, z_c, iw_c, aw_c = [], [], [], [], []
    for c in corners:
        w = xp.maximum(c[:, 3], 1e-12)
        inv_w = (1.0 / w).astype(xp.float32)
        ndc_x = c[:, 0] * inv_w
        ndc_y = c[:, 1] * inv_w
        z_c.append((c[:, 2] * inv_w).astype(xp.float32))
        sx = xp.clip((ndc_x * 0.5 + 0.5) * config.width, -lim, lim)
        sy = xp.clip((0.5 - ndc_y * 0.5) * config.height, -lim, lim)
        xs_c.append(fp.snap_to_fixed(sx, sub, xp))
        ys_c.append(fp.snap_to_fixed(sy, sub, xp))
        iw_c.append(inv_w)
        if A:
            aw_c.append((c[:, 4:] * inv_w[:, None]).astype(xp.float32))

    # same int32 expression as fp.doubled_area on the stacked (T,3) arrays
    area2 = (ys_c[1] - ys_c[0]) * (xs_c[2] - xs_c[0]) - (
        xs_c[1] - xs_c[0]
    ) * (ys_c[2] - ys_c[0])
    if config.cull_backfaces:
        orient_ok = area2 > 0
        flip = xp.zeros(area2.shape, bool)
    else:
        orient_ok = area2 != 0
        flip = area2 < 0

    def swap12(cols, fm):
        return [
            cols[0],
            xp.where(fm, cols[2], cols[1]),
            xp.where(fm, cols[1], cols[2]),
        ]

    xs_c = swap12(xs_c, flip)
    ys_c = swap12(ys_c, flip)
    z_c = swap12(z_c, flip)
    iw_c = swap12(iw_c, flip)
    if A:
        aw_c = swap12(aw_c, flip[:, None])

    half = sub // 2
    min_x = xp.minimum(xp.minimum(xs_c[0], xs_c[1]), xs_c[2])
    max_x = xp.maximum(xp.maximum(xs_c[0], xs_c[1]), xs_c[2])
    min_y = xp.minimum(xp.minimum(ys_c[0], ys_c[1]), ys_c[2])
    max_y = xp.maximum(xp.maximum(ys_c[0], ys_c[1]), ys_c[2])
    on_screen = (
        (max_x >= half)
        & (min_x <= (config.width - 1) * sub + half)
        & (max_y >= half)
        & (min_y <= (config.height - 1) * sub + half)
    )
    valid = orient_ok & on_screen
    T = valid.shape[0]
    return (
        xp.stack(xs_c, axis=-1),
        xp.stack(ys_c, axis=-1),
        xp.stack(z_c, axis=-1),
        xp.stack(iw_c, axis=-1),
        xp.stack(aw_c, axis=1) if A else xp.zeros((T, 3, 0), xp.float32),
        valid,
    )


def _sort_compact_ids(mask, n_out, xp):
    """Indices of True entries of `mask`, ascending, padded to n_out.

    Scatter-free order-preserving compaction (XLA TPU scatters serialize):
    sort (index if set else BIG) and truncate/pad. Returns (idx (n_out,),
    count ()). Padded entries point at 0 — mask separately.
    """
    n = mask.shape[0]
    big = xp.int32(2**30)
    keys = xp.where(mask, xp.arange(n, dtype=xp.int32), big)
    skeys = xp.sort(keys)
    if n_out <= n:
        idx = skeys[:n_out]
    else:
        idx = xp.concatenate(
            [skeys, xp.full((n_out - n,), big, xp.int32)]
        )
    count = xp.sum(mask.astype(xp.int32))
    return xp.minimum(idx, n - 1), xp.minimum(count, n_out), count


def geometry(
    scene: Scene,
    view,
    proj,
    config: RenderConfig,
    xp=np,
    capacity: Optional[int] = None,
    stats_out: Optional[dict] = None,
) -> TriBuf:
    """Full geometry stage: vertex transform -> classify -> clip (crossing
    tris only) -> project -> snap -> cull -> compact. Static shapes.

    stats_out: optional dict that receives exact stage-occupancy counts
    (crossing_total, live_records, fan_records) — the measured inputs the
    capacity auto-sizer derives budgets from (xr/app/autosize.py).

    Two-path design (SURVEY.md §7.3.2 + perf): triangles fully inside all 6
    clip planes (the overwhelming majority) skip Sutherland-Hodgman
    entirely; only tris CROSSING a plane are compacted into a small static
    budget and clipped. Output order: inside tris (ascending input id),
    then clipped fans — deterministic and identical for the numpy oracle
    and the device pipeline (shared code), which fixes (z, id) tie-breaks.
    """
    mesh = scene.mesh
    T = mesh.num_triangles
    A = config.attr_width
    C = capacity if capacity is not None else clip_capacity(T, config)

    clip, vattrs, face_rgb = _vertex_stage(scene, view, proj, config, xp)
    planes = _plane_vectors(config.guard_band, xp)  # (6,4)

    percorner = config.corner_fetch == "percorner"
    if percorner:
        # three (T, 4+A) row gathers from ONE packed [clip|attr] vertex
        # table; every consumer slices contiguous columns and the per-
        # corner plane distances / projection run on dense (T,) vectors.
        # Bit-identical to the pertri path (see RenderConfig.corner_fetch).
        vtab = xp.concatenate([clip, vattrs], axis=1) if A else clip
        corners = [vtab[mesh.indices[:, v]] for v in range(3)]
        dv = [_plane_distances(c[:, :4], planes, xp) for c in corners]
        inside_all = (
            xp.all(dv[0] >= 0.0, axis=1)
            & xp.all(dv[1] >= 0.0, axis=1)
            & xp.all(dv[2] >= 0.0, axis=1)
        )
        outside_any = xp.any(
            (dv[0] < 0.0) & (dv[1] < 0.0) & (dv[2] < 0.0), axis=1
        )
    else:
        tri_pos = clip[mesh.indices]  # (T,3,4)
        tri_attr = (
            vattrs[mesh.indices] if A else xp.zeros((T, 3, 0), xp.float32)
        )
        d = _plane_distances(tri_pos, planes, xp)  # (T,3,6)
        inside_all = xp.all(d >= 0.0, axis=(1, 2))
        outside_any = xp.any(xp.all(d < 0.0, axis=1), axis=1)
    crossing = (~inside_all) & (~outside_any)

    # ---- path B: Sutherland-Hodgman on the (few) crossing triangles -----
    B = clip_budget(T, config)
    sel, _, crossing_total = _sort_compact_ids(crossing, B, xp)
    sel_valid = xp.arange(B) < xp.minimum(crossing_total, B)
    if percorner:
        cpos = xp.stack([c[sel][:, :4] for c in corners], axis=1)
        cattr = (
            xp.stack([c[sel][:, 4:] for c in corners], axis=1)
            if A
            else xp.zeros((B, 3, 0), xp.float32)
        )
    else:
        cpos = tri_pos[sel]
        cattr = tri_attr[sel]
    poly_pos, poly_attr, cnt = clip_triangles(
        cpos, cattr, config.guard_band, xp
    )
    cnt = xp.where(sel_valid, cnt, 0)

    F = MAX_FAN
    k = xp.arange(F)
    fan_valid = (k[None, :] + 2) < cnt[:, None]  # (B,F)

    def fan(arr):
        # fan triangle k = polygon verts (0, k+1, k+2): STATIC slices
        v0 = xp.broadcast_to(arr[:, None, 0], (B, F) + arr.shape[2:])
        return xp.stack(
            [v0, arr[:, 1 : 1 + F], arr[:, 2 : 2 + F]], axis=2
        )

    fposB = fan(poly_pos)  # (B,F,3,4)
    fattrB = (
        fan(poly_attr) if A else xp.zeros((B, F, 3, 0), xp.float32)
    )

    # ---- project/snap/cull both paths ------------------------------------
    if percorner:
        xsA, ysA, zA, iwA, awA, validA = _project_snap_cols(
            corners, A, config, xp
        )
    else:
        xsA, ysA, zA, iwA, awA, validA = _project_snap(
            tri_pos, tri_attr, config, xp
        )
    validA = validA & inside_all
    xsB, ysB, zB, iwB, awB, validB = _project_snap(fposB, fattrB, config, xp)
    validB = validB & fan_valid

    # ---- payloads ---------------------------------------------------------
    rgbA, matA = face_rgb, mesh.material_id.astype(xp.int32)
    rgbB = xp.broadcast_to(face_rgb[sel][:, None, :], (B, F, 3))
    matB = xp.broadcast_to(
        mesh.material_id.astype(xp.int32)[sel][:, None], (B, F)
    )
    src_idA = xp.arange(T, dtype=xp.int32)
    src_idB = xp.broadcast_to(sel.astype(xp.int32)[:, None], (B, F))

    # ---- identity record layout (capacity covers every triangle) ----------
    # When C >= T + B*F no compaction is needed: record id == input triangle
    # id (fans appended at T + fan slot), invalid slots just stay masked.
    # This skips the (C, K)-wide compaction gather entirely — at ~1M-tri
    # scale XLA lays the packed record table out column-major and the
    # strided compaction gather alone costs ~20 ms/frame (PERF.md round 2).
    # Record ids remain ascending in input order, so (z, id) depth ties
    # resolve to the same triangle as the compacted layout; the oracle
    # (numpy) takes this same branch for identical semantics.
    BF_id = B * F
    if identity_layout(T, config, C):  # C >= T + B*F
        pad = C - T - BF_id

        def cat(a_field, b_field):
            b2 = b_field.reshape((BF_id,) + b_field.shape[2:])
            out = xp.concatenate([a_field, b2], axis=0)
            if pad:
                out = xp.concatenate(
                    [out, xp.zeros((pad,) + out.shape[1:], out.dtype)],
                    axis=0,
                )
            return out

        validI = cat(validA, validB)
        totalA_i = xp.sum(validA.astype(xp.int32))
        totalB_i = xp.sum(validB.astype(xp.int32))
        if stats_out is not None:
            stats_out["crossing_total"] = crossing_total
            stats_out["live_records"] = totalA_i + totalB_i
            stats_out["fan_records"] = totalB_i
        return TriBuf(
            xs=cat(xsA, xsB),
            ys=cat(ysA, ysB),
            z=cat(zA, zB),
            inv_w=cat(iwA, iwB),
            attr_w=(
                cat(awA, awB)
                if A
                else xp.zeros((C, 3, 0), xp.float32)
            ),
            face_rgb=cat(rgbA, rgbB),
            mat_id=cat(matA, matB),
            src_id=cat(src_idA, src_idB),
            valid=validI,
            count=(totalA_i + totalB_i).astype(xp.int32),
            overflow=xp.maximum(crossing_total - B, 0).astype(xp.int32),
            num_src=T,
        )

    # ---- order-preserving compaction into capacity C ----------------------
    BF = B * F
    idxA, countA, totalA = _sort_compact_ids(validA, C, xp)
    idxB, countB, totalB = _sort_compact_ids(validB.reshape(BF), C, xp)
    slot = xp.arange(C, dtype=xp.int32)
    from_a = slot < countA
    jb = xp.minimum(xp.maximum(slot - countA, 0), C - 1)
    srcB = idxB[jb]

    # Merge ALL fields through ONE packed (rows, K) table per path: 2 wide
    # gathers + select instead of 14 narrow gathers (gather cost on TPU is
    # per ROW regardless of width; 14 separate ops cost ~3.7 ms/frame at
    # 100k tris, the packed pair ~0.6 ms — PERF.md round 2).
    def bits(x):
        if _is_np(xp):
            return np.ascontiguousarray(x).view(np.float32)
        import jax

        return jax.lax.bitcast_convert_type(x, xp.float32)

    def pack(xs_, ys_, z_, iw_, aw_, rgb_, mat_, src_, rows):
        cols = [
            bits(xs_.reshape(rows, 3)),
            bits(ys_.reshape(rows, 3)),
            z_.reshape(rows, 3),
            iw_.reshape(rows, 3),
            aw_.reshape(rows, 3 * A) if A else aw_.reshape(rows, 0),
            rgb_.reshape(rows, 3),
            bits(mat_.reshape(rows, 1).astype(xp.int32)),
            bits(src_.reshape(rows, 1).astype(xp.int32)),
        ]
        return xp.concatenate(cols, axis=1)

    packA = pack(xsA, ysA, zA, iwA, awA, rgbA, matA, src_idA, T)
    packB = pack(xsB, ysB, zB, iwB, awB, rgbB, matB, src_idB, BF)
    fm = from_a[:, None]
    merged = xp.where(fm, packA[idxA], packB[srcB])  # (C, K)

    def ubits(x):
        if _is_np(xp):
            return np.ascontiguousarray(x).view(np.int32)
        import jax

        return jax.lax.bitcast_convert_type(x, xp.int32)

    out_count = xp.minimum(countA + countB, C).astype(xp.int32)
    valid = slot < out_count
    overflow = (
        xp.maximum(totalA + totalB - C, 0)
        + xp.maximum(crossing_total - B, 0)
    ).astype(xp.int32)
    if stats_out is not None:
        stats_out["crossing_total"] = crossing_total
        stats_out["live_records"] = totalA + totalB
        stats_out["fan_records"] = totalB

    return TriBuf(
        xs=ubits(merged[:, 0:3]),
        ys=ubits(merged[:, 3:6]),
        z=merged[:, 6:9],
        inv_w=merged[:, 9:12],
        attr_w=merged[:, 12 : 12 + 3 * A].reshape(C, 3, A),
        face_rgb=merged[:, 12 + 3 * A : 15 + 3 * A],
        mat_id=ubits(merged[:, 15 + 3 * A]),
        src_id=ubits(merged[:, 16 + 3 * A]),
        valid=valid,
        count=out_count,
        overflow=overflow,
        num_src=T,
    )
