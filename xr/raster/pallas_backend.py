"""Pallas TPU visibility kernel — per-tile edge-function raster + z resolve.

This is the GPU's fixed-function rasterizer/depth unit rebuilt as an
explicit TPU kernel (BASELINE.json:5: "tile binning plus edge-function
rasterization and z-buffer resolve as Pallas kernels over HBM framebuffer
tiles"; SURVEY.md §2.1 "Rasterizer + depth test" — "the heart of the new
framework").

Pipeline position: geometry (xr/pipeline) -> sort-based binning
(xr/raster/jnp_backend.bin_triangles) -> THIS kernel -> deferred shading.

Layout strategy: per-tile triangle records (snapped coords, depths, ids) are
pre-gathered into dense (ntiles, capq, 8, 128) arrays by XLA (one coalesced
gather), so each grid step's records arrive in VMEM via the automatic block
pipeline. Mosaic only allows dynamic indexing on non-tiled dims, so the
kernel walks record CHUNKS of 8x128 = 1024 triangles (dynamic index on the
free capq dim) and extracts per-triangle scalars from the in-register chunk
with a masked reduction — no scalar memory traffic at all. "Large"
triangles (bbox spanning > 2x2 tiles) live in a small global record set
scanned by every tile behind a scalar bbox reject. Per triangle
(lexicographic (z, id) resolve => order-independent):

    evaluate 3 integer edge functions over the (TH, TW) pixel block
    top-left fill rule, exact int32 (matches the CPU oracle bit-for-bit)
    interpolate depth, depth-range clip
    (z, id) lexicographic min update of the tile's z/tid block

The math replicates xr/core/fixedpoint.py and xr/raster/common.py op-for-op.
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

# triangles per record chunk: one (sublane, lane) = (8, 128) int32 tile
CHUNK = 1024


def _raster_records(
    recs, n, tile_i, tile_j, zb_ref, tid_ref, sub_iota, lane_iota,
    *, th: int, tw: int, sub: int,
):
    """Fold `n` triangles from chunked records into the (z, tid) tile state.

    recs: 10 refs/arrays shaped (capq, 8, 128) (already tile-local views):
    x0,x1,x2,y0,y1,y2 (i32), z0,z1,z2 (f32), id (i32).

    Per triangle, only the (8, 128) ROW BANDS its bbox touches are
    evaluated (predicated via pl.when): small triangles cover a few dozen
    pixels while a whole tile has th*tw — banding removes most of that
    wasted VPU work. The x extent rides free in the 128 lanes.
    """
    (x0r, x1r, x2r, y0r, y1r, y2r, z0r, z1r, z2r, idr) = recs
    half = sub // 2
    nbands = th // 8
    px = (lane_iota + tile_j * tw) * sub + half  # (8, 128)
    tile_px0 = tile_j * tw * sub + half
    tile_px1 = (tile_j * tw + tw - 1) * sub + half
    tile_py = tile_i * th * sub + half  # first pixel-center row

    def chunk_body(q, _):
        cx0 = x0r[q]
        cx1 = x1r[q]
        cx2 = x2r[q]
        cy0 = y0r[q]
        cy1 = y1r[q]
        cy2 = y2r[q]
        cz0 = z0r[q]
        cz1 = z1r[q]
        cz2 = z2r[q]
        cid = idr[q]

        def tri_body(k, _):
            sel = (sub_iota == k // 128) & (lane_iota == k % 128)

            def ext(chunk):
                return jnp.sum(jnp.where(sel, chunk, jnp.zeros_like(chunk)))

            x0, x1, x2 = ext(cx0), ext(cx1), ext(cx2)
            y0, y1, y2 = ext(cy0), ext(cy1), ext(cy2)
            z0 = ext(cz0)
            z1 = ext(cz1)
            z2 = ext(cz2)
            tri_id = ext(cid)

            # edge k: v_k -> v_{k+1}; A = y_next - y_k, B = x_k - x_next
            # (xr/core/fixedpoint.edge_coeffs). e0/e1/e2 are the edges
            # (1,2,0) — opposite vertices 0/1/2 (fixedpoint.coverage).
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
                    better = mask & (
                        (zf < zb) | ((zf == zb) & (tri_id < tb))
                    )
                    zb_ref[b * 8 : b * 8 + 8, :] = jnp.where(better, zf, zb)
                    tid_ref[b * 8 : b * 8 + 8, :] = jnp.where(
                        better, tri_id, tb
                    )

                band_py0 = tile_py + b * 8 * sub
                band_py1 = band_py0 + 7 * sub
                hit = x_overlap & (by1 >= band_py0) & (by0 <= band_py1)

                @pl.when(hit)
                def _():
                    do_band()

            for b in range(nbands):
                band(b)
            return 0

        jax.lax.fori_loop(0, jnp.minimum(CHUNK, n - q * CHUNK), tri_body, 0)
        return 0

    nq = (n + CHUNK - 1) // CHUNK
    jax.lax.fori_loop(0, nq, chunk_body, 0)


def _vis_kernel(
    counts_ref,  # SMEM (ntiles,) — whole array, indexed by tile
    lcount_ref,  # SMEM (1,)
    # 10 small-record refs: VMEM (1, capq, 8, 128)
    sx0, sx1, sx2, sy0, sy1, sy2, sz0, sz1, sz2, sid,
    # 10 large-record refs: VMEM (lcapq, 8, 128), shared by all tiles
    lx0, lx1, lx2, ly0, ly1, ly2, lz0, lz1, lz2, lid,
    tid_ref,  # out VMEM (TH, TW) i32
    zb_ref,  # out VMEM (TH, TW) f32
    *,
    th: int,
    tw: int,
    sub: int,
    ntx: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # For sharded bands the caller translates all triangle Y coords by
    # -y_offset (exact int translation; coverage/depth are translation-
    # invariant), so rows here are band-local.
    tid_ref[:] = jnp.full((th, tw), BG, jnp.int32)
    zb_ref[:] = jnp.full((th, tw), jnp.inf, jnp.float32)

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    _raster_records(
        (lx0, lx1, lx2, ly0, ly1, ly2, lz0, lz1, lz2, lid),
        lcount_ref[0],
        i, j, zb_ref, tid_ref, sub_iota, lane_iota, th=th, tw=tw, sub=sub,
    )
    small = tuple(r.at[0] for r in (sx0, sx1, sx2, sy0, sy1, sy2, sz0, sz1, sz2, sid))
    _raster_records(
        small,
        counts_ref[i * ntx + j],
        i, j, zb_ref, tid_ref, sub_iota, lane_iota, th=th, tw=tw, sub=sub,
    )


def visibility_binned(
    tri: TriBuf,
    config: RenderConfig,
    y_offset=0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pallas counterpart of jnp_backend.visibility_binned (same contract).

    interpret=True runs the kernel in the Pallas interpreter on any backend
    (the "sanitizer build", SURVEY.md §5.2)."""
    H, W = config.height, config.width
    TH, TW = config.tile_h, config.tile_w
    nty, ntx = grid_dims(config)
    ntiles = ntx * nty
    sub = config.subpixel

    b = bin_triangles(tri, config, y_offset=y_offset)
    yo = jnp.asarray(y_offset, jnp.int32) * sub
    C = tri.capacity

    # one packed (C, 10) i32 record row per triangle (xs*3, ys*3 translated,
    # z-bits*3, id) so the per-list gather below is a single wide-row gather
    # instead of 10 narrow ones (XLA TPU gathers cost ~per row)
    zbits = jax.lax.bitcast_convert_type(tri.z, jnp.int32)
    tri_ids = jnp.arange(C, dtype=jnp.int32).reshape(C, 1)
    packed = jnp.concatenate(
        [tri.xs, tri.ys - yo, zbits, tri_ids], axis=1
    )  # (C, 10)

    def records(lists):
        """Gather record field arrays for an id-list array, padded to CHUNK
        multiples and reshaped to (..., q, 8, 128) each."""
        n = lists.shape[-1]
        npad = _pad_to(n, CHUNK)
        if npad != n:
            pad = jnp.full(lists.shape[:-1] + (npad - n,), 2**30, jnp.int32)
            lists = jnp.concatenate([lists, pad], axis=-1)
        safe = jnp.minimum(lists, C - 1)
        rows = packed[safe]  # (..., npad, 10) — ONE gather
        empty = (lists >= C)[..., None]
        rows = jnp.where(
            empty & (jnp.arange(10) == 9), BG, rows
        )  # id field -> BG for empty slots
        q = npad // CHUNK
        fields = [rows[..., k] for k in range(10)]
        out = [f.reshape(lists.shape[:-1] + (q, 8, 128)) for f in fields]
        # z fields back to f32
        for k in (6, 7, 8):
            out[k] = jax.lax.bitcast_convert_type(out[k], jnp.float32)
        # reorder to kernel layout: x0..x2, y0..y2, z0..z2, id
        return out

    small_recs = records(b.lists)  # each (ntiles, capq, 8, 128)
    large_recs = records(b.large_ids)  # each (lcapq, 8, 128)
    capq = small_recs[0].shape[1]
    lcapq = large_recs[0].shape[0]

    kernel = functools.partial(_vis_kernel, th=TH, tw=TW, sub=sub, ntx=ntx)

    def small_spec():
        return pl.BlockSpec(
            (1, capq, 8, 128),
            lambda i, j: (i * ntx + j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def large_spec():
        return pl.BlockSpec(
            (lcapq, 8, 128), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pl.GridSpec(
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [small_spec() for _ in range(10)]
        + [large_spec() for _ in range(10)],
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
        *small_recs,
        *large_recs,
    )

    return tid[:H, :W], zb[:H, :W], b.dropped
