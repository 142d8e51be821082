"""Streaming Pallas visibility kernel — block-aligned sorted segments.

The windowed kernel (pallas_smem) materializes per-tile
record arrays of a fixed capacity, so their gather cost scales with
ntiles * capacity even when bins are mostly empty — and worst-case tiles
(1M-triangle horizons, SURVEY.md §5.7 "the long-context case") force huge
capacities. This kernel instead walks the binning sort's output directly:

  * bin_triangles' sorted (tile, id) pairs are compacted into BLOCK-aligned
    per-tile segments (each tile padded to a multiple of BLK records, >= 1
    block per tile), sized by the ACTUAL total entry count — memory and
    gather cost scale with the scene, not with worst-case tiles.
  * the grid is 1-D over record blocks. Scalar-prefetched block->tile and
    block->offset tables drive DATA-DEPENDENT BlockSpec index maps
    (pltpu.PrefetchScalarGridSpec): each step's records window DMAs the
    next block, and the OUTPUT block index is the block's tile — Pallas
    keeps the tile's framebuffer block in VMEM across consecutive blocks of
    the same tile and flushes when the tile changes.
  * the kernel initializes the tile (and rasters the global large-triangle
    bucket) on the FIRST block of each tile, then folds the block's records
    with the same exact int32 semantics as every other backend.

Per-tile capacity ceases to exist; overflow is only the global streaming
capacity (loud, like every other capacity in this framework).
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
from xr.raster.pallas_smem import (
    NFIELDS,
    _raster_scalar_records,
    gather_field_records,
    pack_tri_records,
)

BG = rc.BG_TRI_ID
BLK_DEFAULT = 512  # see RenderConfig.stream_block


def stream_blocks(config: RenderConfig, num_records: int, num_src: int = 0) -> int:
    """Static block capacity: config.stream_expand entries per LIVE
    post-clip triangle (<= 4 by construction, ~1.2 typical), plus one pad
    block per tile — or the absolute config.stream_entry_cap override.
    Live records never exceed num_src + clip_budget*(MAX_FAN-1), so when
    the identity record layout makes num_records (the capacity) much
    larger, sizing follows the source-count bound instead — the old
    capacity-based sizing silently multiplied record-gather cost by
    ~capacity/live (VERDICT r4 #3). Overflow stays loudly counted."""
    nty, ntx = grid_dims(config)
    BLK = getattr(config, "stream_block", BLK_DEFAULT)
    cap = getattr(config, "stream_entry_cap", 0)
    if not cap:
        bound = num_records
        if num_src:
            from xr.pipeline.geometry import MAX_FAN, clip_budget

            bound = min(
                num_records,
                num_src + clip_budget(num_src, config) * (MAX_FAN - 1),
            )
        cap = int(bound * config.stream_expand) + 64
    return cap // BLK + nty * ntx + 1


CHUNK_G = 8  # records per chunk-level z-gate aggregate (z_earlyout only)


def _vis_kernel(
    bt_ref,  # prefetch SMEM (NB,) block -> tile
    bbase_ref,  # prefetch SMEM (NB,) block -> first record offset in its tile
    counts_ref,  # prefetch SMEM (ntiles,)
    lcount_ref,  # prefetch SMEM (1,)
    reci_ref,  # SMEM (1, 1, BLK*12) — int fields 0..8, 14..16, record-major
    recf_ref,  # SMEM (1, 1, BLK*nf32) — z0..z2, inv (+ z_min iff z_earlyout)
    *rest,  # [chz_ref iff z_chunk_gate], NFIELDS large SMEM refs, outs
    th: int,
    tw: int,
    sub: int,
    ntx: int,
    blk: int,
    depth_test: bool = True,
    z_earlyout: bool = False,
    z_chunk_gate: bool = False,
    z_band_gate: bool = False,
):
    if z_chunk_gate:
        chz_ref, rest = rest[0], rest[1:]
    larges = rest[:NFIELDS]
    tid_ref, zb_ref = rest[NFIELDS], rest[NFIELDS + 1]
    b = pl.program_id(0)
    t = bt_ref[b]
    i = t // ntx
    j = t % ntx
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    prev_t = bt_ref[jnp.maximum(b - 1, 0)]
    first = (b == 0) | (prev_t != t)

    @pl.when(first)
    def _():
        tid_ref[:] = jnp.full((th, tw), BG if depth_test else -1, jnp.int32)
        zb_ref[:] = jnp.full((th, tw), jnp.inf, jnp.float32)
        _raster_scalar_records(
            lambda f, ci, cf: larges[f][ci],
            lcount_ref[0],
            i, j, zb_ref, tid_ref, sub_iota,
            th=th, tw=tw, sub=sub, depth_test=depth_test, x_test=True,
        )

    n_here = jnp.clip(counts_ref[t] - bbase_ref[b], 0, blk)

    nf32 = 5 if z_earlyout else 4

    def read(f, ci, cf):
        # Mosaic has no scalar bitcast, so int and f32 fields arrive in
        # separate SMEM windows (split from ONE HBM gather on the XLA side);
        # int fields 0..8 and 14..16 pack record-major into 12 slots —
        # EXCEPT that slot 11 (field 16) carries the PRECOMPUTED per-entry
        # y-band hit mask instead of the packed y bbox (the prep resolves
        # each entry's band overlaps in XLA, vectorized at entries scale,
        # so the kernel's scalar core tests one bit per band instead of
        # unpacking a bbox and comparing — see _raster_scalar_records
        # ymask). Field 17 (bxpacked) is NOT packed — binned records always
        # overlap their tile in x, so only the large-bucket path
        # (full-field SMEM arrays) ever reads it. z_min (13) is packed only
        # when the early-out is on. ci/cf are the loop-carried
        # strength-reduced record base offsets (see _raster_scalar_records
        # strides).
        assert f != 17, "bxpacked is not packed into the stream records"
        if f in (9, 10, 11, 12, 13):
            assert f != 13 or z_earlyout
            return recf_ref[0, 0, cf + (f - 9)]
        slot = f if f < 9 else f - 5
        return reci_ref[0, 0, ci + slot]

    # Occlusion bound for the early-out (see _raster_scalar_records): an
    # upper bound of the tile's current max z, recomputed once per BLOCK
    # (zb only decreases, so staleness within a block stays conservative);
    # +inf until every pixel of the tile is covered. z_band_gate refines it
    # to per-8-row-band bounds (their max is the record/chunk gate);
    # z_chunk_gate additionally gates CHUNK_G-record groups on a
    # prep-aggregated min — both off by default (PERF.md round 5: the
    # extra per-record/chunk scalar ops cost more than the skipped work on
    # the configs that use the early-out).
    if depth_test and z_earlyout:
        if z_band_gate and th > 8:
            nbands = th // 8
            band_zmax = [
                jnp.max(zb_ref[bb * 8 : bb * 8 + 8, :]) for bb in range(nbands)
            ]
            zmax = band_zmax[0]
            for v in band_zmax[1:]:
                zmax = jnp.maximum(zmax, v)
        else:
            band_zmax = None
            zmax = jnp.max(zb_ref[:])
        chunk = (
            (CHUNK_G, lambda kc: chz_ref[0, 0, kc]) if z_chunk_gate else None
        )
    else:
        zmax = band_zmax = chunk = None

    _raster_scalar_records(
        read, n_here, i, j, zb_ref, tid_ref, sub_iota,
        th=th, tw=tw, sub=sub, depth_test=depth_test, zmax=zmax,
        band_zmax=band_zmax, strides=(12, nf32), chunk=chunk, ymask=True,
    )


def visibility_binned(
    tri: TriBuf,
    config: RenderConfig,
    y_offset=0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Same contract as the other visibility backends."""
    H, W = config.height, config.width
    TH, TW = config.tile_h, config.tile_w
    nty, ntx = grid_dims(config)
    ntiles = ntx * nty
    sub = config.subpixel

    b = bin_triangles(tri, config, y_offset=y_offset)
    yo = jnp.asarray(y_offset, jnp.int32) * sub
    C = tri.capacity
    BLK = getattr(config, "stream_block", BLK_DEFAULT)
    NB = stream_blocks(config, C, tri.num_src)

    # ---- block-aligned segment layout (all gathers/searchsorted) ---------
    counts = b.raw_counts
    nb_t = jnp.maximum(-(-counts // BLK), 1)  # blocks per tile, >= 1
    bstart_t = jnp.cumsum(nb_t) - nb_t  # first block of tile t
    nb_total = jnp.sum(nb_t)
    dropped_blocks = jnp.maximum(nb_total - NB, 0)

    bidx = jnp.arange(NB, dtype=jnp.int32)
    # block -> tile: last t with bstart_t <= b
    bt = (
        jnp.searchsorted(bstart_t, bidx, side="right").astype(jnp.int32) - 1
    )
    bt = jnp.clip(bt, 0, ntiles - 1)
    live_block = bidx < nb_total
    # park dead trailing blocks on the last live tile (no re-init, 0 records)
    last_tile = bt[jnp.maximum(nb_total - 1, 0)]
    bt = jnp.where(live_block, bt, last_tile)
    bbase = jnp.where(live_block, (bidx - bstart_t[bt]) * BLK, jnp.int32(2**30))

    # ---- compacted records: (NB, BLK) global entries -> packed rows ------
    packed = pack_tri_records(tri, yo)

    slot = bbase[:, None] + jnp.arange(BLK, dtype=jnp.int32)[None, :]  # (NB,BLK)
    seg_ok = slot < counts[bt][:, None]
    gidx = jnp.clip(b.starts[bt][:, None] + slot, 0, b.sid.shape[0] - 1)
    # fetch sorted ids through a PAIRED (2C, 2) view: single-column gathers
    # cost ~5-7 ns/ELEMENT on this TPU while row gathers amortize — fetch
    # the 2-entry row containing the slot and select the half (exact)
    sidp = b.sid.reshape(-1, 2)
    rows2 = sidp[gidx >> 1]  # (NB, BLK, 2)
    picked = jnp.where((gidx & 1) == 1, rows2[..., 1], rows2[..., 0])
    ids = jnp.where(seg_ok, picked, C)  # (NB, BLK)
    rows = packed[jnp.minimum(ids, C - 1)]  # (NB, BLK, NFIELDS) — THE gather
    rows = jnp.where(
        (ids >= C)[..., None] & (jnp.arange(NFIELDS) == 13), BG, rows
    )
    # int fields 0..8 (edge planes) + 14..15 (id, oflags) + the per-entry
    # y-band hit MASK (replacing field 16's packed y bbox: band overlap is
    # resolved HERE, vectorized at entries scale, so the kernel's scalar
    # core — its bottleneck — tests one bit per band instead of unpacking
    # a bbox and range-comparing). Record-major, 12 slots; field 17
    # (bxpacked) is skipped — binned records always overlap their tile in x
    byp_e = rows[..., 16]
    by0 = (byp_e & 0xFFFF) - 32768
    by1 = ((byp_e >> 16) & 0xFFFF) - 32768
    half = sub // 2
    band_py = ((bt // ntx) * TH * sub + half)[:, None]  # (NB, 1)
    ymask = jnp.zeros_like(byp_e)
    for bb in range(TH // 8):
        p0 = band_py + bb * 8 * sub
        p1 = p0 + 7 * sub
        ymask = ymask | (((by1 >= p0) & (by0 <= p1)).astype(jnp.int32) << bb)
    rec_i = jnp.concatenate(
        [rows[..., 0:9], rows[..., 14:16], ymask[..., None]], axis=-1
    ).reshape(NB, 1, BLK * 12)
    # f32 fields: ONE contiguous slice — z0 z1 z2 inv_area (+ z_min under
    # the early-out), record-major
    nf32 = 5 if config.z_earlyout else 4
    rec_f = jax.lax.bitcast_convert_type(
        rows[..., 9 : 9 + nf32], jnp.float32
    ).reshape(NB, 1, BLK * nf32)
    # chunk-level z-gate aggregates: min of each CHUNK_G consecutive
    # records' deflated z_min (empty slots ride +inf, so a partial tail
    # chunk aggregates only its live members) — one scalar gates G records
    if config.z_chunk_gate:
        assert BLK % CHUNK_G == 0, "stream_block must be a CHUNK_G multiple"
        zmin_e = jax.lax.bitcast_convert_type(rows[..., 13], jnp.float32)
        zmin_e = jnp.where(seg_ok, zmin_e, jnp.inf)
        chz = (
            zmin_e.reshape(NB, BLK // CHUNK_G, CHUNK_G)
            .min(axis=-1)
            .reshape(NB, 1, BLK // CHUNK_G)
        )

    # ---- large bucket (shared by all tiles) ------------------------------
    large = gather_field_records(b.large_ids, packed, C)

    kernel = functools.partial(
        _vis_kernel, th=TH, tw=TW, sub=sub, ntx=ntx, blk=BLK,
        depth_test=config.depth_test, z_earlyout=config.z_earlyout,
        z_chunk_gate=config.z_chunk_gate, z_band_gate=config.z_band_gate,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # bt, bbase, counts, large_count
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, BLK * 12),
                lambda bi, bt_ref, bb, cn, lc: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, BLK * nf32),
                lambda bi, bt_ref, bb, cn, lc: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ]
        + (
            [
                pl.BlockSpec(
                    (1, 1, BLK // CHUNK_G),
                    lambda bi, bt_ref, bb, cn, lc: (bi, 0, 0),
                    memory_space=pltpu.SMEM,
                )
            ]
            if config.z_chunk_gate
            else []
        )
        + [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(NFIELDS)],
        out_specs=[
            pl.BlockSpec(
                (TH, TW),
                lambda bi, bt_ref, bb, cn, lc: (bt_ref[bi] // ntx, bt_ref[bi] % ntx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TH, TW),
                lambda bi, bt_ref, bb, cn, lc: (bt_ref[bi] // ntx, bt_ref[bi] % ntx),
                memory_space=pltpu.VMEM,
            ),
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
        bt,
        bbase,
        counts,
        b.large_count.reshape(1),
        rec_i,
        rec_f,
        *([chz] if config.z_chunk_gate else []),
        *large,
    )

    # On stream-capacity overflow, tiles whose FIRST block fell beyond NB
    # never ran — their framebuffer blocks are uninitialized HBM. Mask them
    # to background so overflow degrades like every other backend (the
    # dropped counter still reports it loudly).
    if not config.depth_test:
        # painter's order: the kernel carried -1 for "none"; map to BG
        tid = jnp.where(tid < 0, BG, tid)
        zb = jnp.where(tid == BG, jnp.inf, zb)
    tile_ran = bstart_t < jnp.minimum(nb_total, NB)  # (ntiles,)
    ran_rows = tile_ran.reshape(nty, ntx)
    ran_px = jnp.repeat(jnp.repeat(ran_rows, TH, axis=0), TW, axis=1)
    tid = jnp.where(ran_px, tid, BG)
    zb = jnp.where(ran_px, zb, jnp.inf)

    # stream overflow = dropped whole blocks; the lists-path per-tile cap
    # does not apply here, but the large-bucket cap still does
    dropped = (dropped_blocks * BLK + b.large_dropped).astype(jnp.int32)
    return tid[:H, :W], zb[:H, :W], dropped