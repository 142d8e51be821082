"""SMEM-records variant of the Pallas visibility kernel (experimental).

Identical semantics to xr/raster/pallas_backend.py; the difference is where
per-triangle records live. The VMEM variant extracts each scalar with a
masked reduction (vector->scalar moves serialize the triangle loop); here
records are SMEM windows shaped (ntiles, 1, cap) — block dims equal to the
array dims, which Mosaic's tiling rules accept — so per-triangle reads are
plain scalar loads. Kept separate so both can be benchmarked/verified; the
renderer picks via RenderConfig.backend == "pallas_smem".
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xr.core.types import RenderConfig
from xr.pipeline.geometry import TriBuf
from xr.raster import common as rc
from xr.raster.jnp_backend import bin_triangles, grid_dims, _pad_to

BG = rc.BG_TRI_ID


def pack_tri_records(tri: TriBuf, yo):
    """(C, 10) i32 rows: xs*3, ys*3 (band-translated), z-bits*3, id."""
    C = tri.capacity
    zbits = jax.lax.bitcast_convert_type(tri.z, jnp.int32)
    tri_ids = jnp.arange(C, dtype=jnp.int32).reshape(C, 1)
    return jnp.concatenate([tri.xs, tri.ys - yo, zbits, tri_ids], axis=1)


def gather_field_records(lists, packed, C: int):
    """Gather per-entry record FIELD arrays for an id-list array (padded to
    a 128 multiple): 10 arrays, z fields bitcast back to f32, id field set
    to BG for empty slots. The masking/sentinel choices here are semantics-
    bearing and shared by every kernel that consumes records."""
    n = lists.shape[-1]
    npad = _pad_to(n, 128)
    if npad != n:
        pad = jnp.full(lists.shape[:-1] + (npad - n,), 2**30, jnp.int32)
        lists = jnp.concatenate([lists, pad], axis=-1)
    safe = jnp.minimum(lists, C - 1)
    rows = packed[safe]
    empty = (lists >= C)[..., None]
    rows = jnp.where(empty & (jnp.arange(10) == 9), BG, rows)
    fields = [rows[..., k] for k in range(10)]
    for k in (6, 7, 8):
        fields[k] = jax.lax.bitcast_convert_type(fields[k], jnp.float32)
    return fields


def _raster_scalar_records(
    read, n, tile_i, tile_j, zb_ref, tid_ref, sub_iota,
    *, th: int, tw: int, sub: int, depth_test: bool = True,
):
    """Triangle loop with scalar record reads. `read(field, k)` -> scalar.

    Fields 0..9 = x0,x1,x2,y0,y1,y2 (i32), z0,z1,z2 (f32), id (i32).
    Every triangle gets a scalar tile-x bbox test plus per-row-band bbox
    predication, so off-tile triangles (e.g. global large-bucket entries)
    cost only scalar work.

    depth_test=False is PAINTER'S ORDER: the highest-id covered triangle
    wins (callers init tid to -1 and map -1 -> BG afterwards), exactly the
    jnp backend's fold (SURVEY.md §2.1 "Pipeline state")."""
    half = sub // 2
    nbands = th // 8
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    px = (lane_iota + tile_j * tw) * sub + half
    tile_px0 = tile_j * tw * sub + half
    tile_px1 = (tile_j * tw + tw - 1) * sub + half
    tile_py = tile_i * th * sub + half

    def tri_body(k, _):
        x0 = read(0, k)
        x1 = read(1, k)
        x2 = read(2, k)
        y0 = read(3, k)
        y1 = read(4, k)
        y2 = read(5, k)
        z0 = read(6, k)
        z1 = read(7, k)
        z2 = read(8, k)
        tri_id = read(9, k)

        a0, b0 = y2 - y1, x1 - x2
        a1, b1 = y0 - y2, x2 - x0
        a2, b2 = y1 - y0, x0 - x1
        t0 = (a0 > 0) | ((a0 == 0) & (b0 > 0))
        t1 = (a1 > 0) | ((a1 == 0) & (b1 > 0))
        t2 = (a2 > 0) | ((a2 == 0) & (b2 > 0))

        bx0 = jnp.minimum(jnp.minimum(x0, x1), x2)
        bx1 = jnp.maximum(jnp.maximum(x0, x1), x2)
        by0 = jnp.minimum(jnp.minimum(y0, y1), y2)
        by1 = jnp.maximum(jnp.maximum(y0, y1), y2)
        x_overlap = (bx1 >= tile_px0) & (bx0 <= tile_px1)

        def band(b):
            py = (sub_iota + tile_i * th + b * 8) * sub + half

            def do_band():
                e0 = a0 * (px - x1) + b0 * (py - y1)
                e1 = a1 * (px - x2) + b1 * (py - y2)
                e2 = a2 * (px - x0) + b2 * (py - y0)
                mask = (
                    ((e0 > 0) | ((e0 == 0) & t0))
                    & ((e1 > 0) | ((e1 == 0) & t1))
                    & ((e2 > 0) | ((e2 == 0) & t2))
                )
                area2 = (e0 + e1 + e2).astype(jnp.float32)
                inv = jnp.where(area2 != 0.0, 1.0 / area2, 0.0).astype(
                    jnp.float32
                )
                zf = (
                    e0.astype(jnp.float32) * inv * z0
                    + e1.astype(jnp.float32) * inv * z1
                    + e2.astype(jnp.float32) * inv * z2
                ).astype(jnp.float32)
                mask = mask & (zf >= 0.0) & (zf <= 1.0)
                zb = zb_ref[b * 8 : b * 8 + 8, :]
                tb = tid_ref[b * 8 : b * 8 + 8, :]
                if depth_test:
                    better = mask & ((zf < zb) | ((zf == zb) & (tri_id < tb)))
                else:
                    better = mask & (tri_id > tb)
                zb_ref[b * 8 : b * 8 + 8, :] = jnp.where(better, zf, zb)
                tid_ref[b * 8 : b * 8 + 8, :] = jnp.where(better, tri_id, tb)

            band_py0 = tile_py + b * 8 * sub
            band_py1 = band_py0 + 7 * sub
            hit = x_overlap & (by1 >= band_py0) & (by0 <= band_py1)

            @pl.when(hit)
            def _():
                do_band()

        for b in range(nbands):
            band(b)
        return 0

    jax.lax.fori_loop(0, n, tri_body, 0)


def _vis_kernel(
    counts_ref,  # SMEM (ntiles,)
    lcount_ref,  # SMEM (1,)
    sx0, sx1, sx2, sy0, sy1, sy2, sz0, sz1, sz2, sid,  # SMEM (1, 1, cap)
    lx0, lx1, lx2, ly0, ly1, ly2, lz0, lz1, lz2, lid,  # SMEM (lcap,)
    tid_ref,
    zb_ref,
    *,
    th: int,
    tw: int,
    sub: int,
    ntx: int,
    depth_test: bool = True,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tid_ref[:] = jnp.full((th, tw), BG if depth_test else -1, jnp.int32)
    zb_ref[:] = jnp.full((th, tw), jnp.inf, jnp.float32)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    larges = (lx0, lx1, lx2, ly0, ly1, ly2, lz0, lz1, lz2, lid)
    _raster_scalar_records(
        lambda f, k: larges[f][k],
        lcount_ref[0],
        i, j, zb_ref, tid_ref, sub_iota,
        th=th, tw=tw, sub=sub, depth_test=depth_test,
    )
    smalls = (sx0, sx1, sx2, sy0, sy1, sy2, sz0, sz1, sz2, sid)
    _raster_scalar_records(
        lambda f, k: smalls[f][0, 0, k],
        counts_ref[i * ntx + j],
        i, j, zb_ref, tid_ref, sub_iota,
        th=th, tw=tw, sub=sub, depth_test=depth_test,
    )


def visibility_binned(
    tri: TriBuf,
    config: RenderConfig,
    y_offset=0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Same contract as pallas_backend.visibility_binned."""
    H, W = config.height, config.width
    TH, TW = config.tile_h, config.tile_w
    nty, ntx = grid_dims(config)
    ntiles = ntx * nty
    sub = config.subpixel

    b = bin_triangles(tri, config, y_offset=y_offset)
    yo = jnp.asarray(y_offset, jnp.int32) * sub
    C = tri.capacity
    packed = pack_tri_records(tri, yo)

    small = gather_field_records(b.lists, packed, C)  # (ntiles, capp) x10
    large = gather_field_records(b.large_ids, packed, C)  # (lcapp,) x10
    capp = small[0].shape[1]

    kernel = functools.partial(
        _vis_kernel, th=TH, tw=TW, sub=sub, ntx=ntx,
        depth_test=config.depth_test,
    )

    def small_spec():
        return pl.BlockSpec(
            (1, 1, capp),
            lambda i, j: (i * ntx + j, 0, 0),
            memory_space=pltpu.SMEM,
        )

    grid_spec = pl.GridSpec(
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [small_spec() for _ in range(10)]
        + [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(10)],
        out_specs=[
            pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
    )

    tid, zb = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nty * TH, ntx * TW), jnp.int32),
            jax.ShapeDtypeStruct((nty * TH, ntx * TW), jnp.float32),
        ],
        interpret=interpret,
    )(
        b.counts,
        b.large_count.reshape(1),
        *[r.reshape(ntiles, 1, capp) for r in small],
        *large,
    )

    if not config.depth_test:
        tid = jnp.where(tid < 0, BG, tid)
        zb = jnp.where(tid == BG, jnp.inf, zb)
    return tid[:H, :W], zb[:H, :W], b.dropped
