"""Portable jnp visibility backends: chunked brute-force and tile-binned.

These produce the per-pixel visibility buffer (winning triangle id + depth)
with EXACTLY the semantics of xr/raster/common.py — the same results as the
CPU oracle's bbox loop and the Pallas TPU kernel, bit-for-bit, because
coverage is integer math and the resolve order is a lexicographic (z, id)
min (order-independent; SURVEY.md §5.2 determinism).

The jnp path is the portable fallback that runs on the CPU backend, which is
what makes multi-chip sharding testable without a pod (SURVEY.md §4.2:
"Pallas TPU kernels don't run on the CPU backend — keep a pure-jnp raster
path"). It is also a perfectly respectable TPU program: everything compiles
to fused VPU loops over (tiles, K, th, tw) blocks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from xr.core.types import RenderConfig
from xr.pipeline.geometry import TriBuf
from xr.raster import common as rc

BG = rc.BG_TRI_ID
LIST_EMPTY = jnp.int32(2**30)  # bin-list sentinel (any id >= capacity works)


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


# ---------------------------------------------------------------------------
# Brute force: every triangle vs every pixel, in chunks (config 1 scale;
# SURVEY.md §7.2 step 2).
# ---------------------------------------------------------------------------


def visibility_brute(
    tri: TriBuf, config: RenderConfig, chunk: int = 32, y_offset=0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tid (H,W) i32, zbuf (H,W) f32 with +inf background).

    y_offset (may be traced): this framebuffer is rows [y_offset,
    y_offset+H) of the full frame (sharded bands, SURVEY.md §5.8)."""
    H, W = config.height, config.width
    px, py = rc.pixel_grids(W, H, config.subpixel, jnp)
    py = py + jnp.asarray(y_offset, jnp.int32) * config.subpixel

    C = tri.capacity
    Cp = _pad_to(C, chunk)
    nk = Cp // chunk

    def pad(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((Cp - C,) + a.shape[1:], fill, a.dtype)], axis=0
        )

    xs = pad(tri.xs).reshape(nk, chunk, 3)
    ys = pad(tri.ys).reshape(nk, chunk, 3)
    z = pad(tri.z).reshape(nk, chunk, 3)
    valid = pad(tri.valid, False).reshape(nk, chunk)
    ids = jnp.arange(Cp, dtype=jnp.int32).reshape(nk, chunk)

    def step(carry, inp):
        zb, tb = carry
        cxs, cys, cz, cvalid, cids = inp
        mask, zf = rc.tri_fragment(
            cxs[:, None, None, :],
            cys[:, None, None, :],
            cz[:, None, None, :],
            px[None],
            py[None],
            xp=jnp,
        )  # (chunk, H, W)
        mask = mask & cvalid[:, None, None]
        zf = jnp.where(mask, zf, rc.BG_DEPTH)
        # first-min along chunk == lowest id among equal z (ids ascending)
        k = jnp.argmin(zf, axis=0)
        z_new = jnp.take_along_axis(zf, k[None], axis=0)[0]
        id_new = jnp.where(jnp.isinf(z_new), BG, cids[k])
        upd = rc.resolve_better(z_new, id_new, zb, tb, jnp)
        return (
            jnp.where(upd, z_new, zb),
            jnp.where(upd, id_new, tb),
        ), None

    zb0 = jnp.full((H, W), rc.BG_DEPTH, jnp.float32)
    tb0 = jnp.full((H, W), BG, jnp.int32)
    (zb, tb), _ = jax.lax.scan(step, (zb0, tb0), (xs, ys, z, valid, ids))
    return tb, zb


# ---------------------------------------------------------------------------
# Binning: triangles -> per-screen-tile lists (SURVEY.md §3.5 "bin")
# ---------------------------------------------------------------------------


def bin_triangles(
    tri: TriBuf, config: RenderConfig, chunk: int = 4096, y_offset=0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build fixed-capacity per-tile triangle lists by scan-compaction.

    Returns (lists (ntiles, cap) i32 [LIST_EMPTY-filled], counts (ntiles,),
    overflow () i32 = total dropped list entries). Entries within a tile are
    in ascending triangle order, preserving resolve determinism.
    """
    TH, TW = config.tile_h, config.tile_w
    ntx = _pad_to(config.width, TW) // TW
    nty = _pad_to(config.height, TH) // TH
    ntiles = ntx * nty
    cap = config.bin_capacity
    sub = config.subpixel
    half = sub // 2

    C = tri.capacity
    Cp = _pad_to(C, chunk)
    nk = Cp // chunk

    def pad(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((Cp - C,) + a.shape[1:], fill, a.dtype)], axis=0
        )

    # triangle bbox -> pixel range -> tile range (matches oracle bbox rule)
    min_x = jnp.min(tri.xs, axis=1)
    max_x = jnp.max(tri.xs, axis=1)
    min_y = jnp.min(tri.ys, axis=1)
    max_y = jnp.max(tri.ys, axis=1)
    yo = jnp.asarray(y_offset, jnp.int32)
    ix0 = jnp.maximum(0, -(-(min_x - half) // sub))
    ix1 = jnp.minimum(config.width - 1, (max_x - half) // sub)
    iy0 = jnp.maximum(0, -(-(min_y - half) // sub) - yo)
    iy1 = jnp.minimum(config.height - 1, (max_y - half) // sub - yo)
    tvalid = tri.valid & (ix1 >= ix0) & (iy1 >= iy0)
    tx0 = pad(ix0 // TW).reshape(nk, chunk)
    tx1 = pad(ix1 // TW).reshape(nk, chunk)
    ty0 = pad(iy0 // TH).reshape(nk, chunk)
    ty1 = pad(iy1 // TH).reshape(nk, chunk)
    val = pad(tvalid, False).reshape(nk, chunk)
    ids = jnp.arange(Cp, dtype=jnp.int32).reshape(nk, chunk)

    txs = jnp.arange(ntx, dtype=jnp.int32)
    tys = jnp.arange(nty, dtype=jnp.int32)
    tile_idx = jnp.broadcast_to(
        jnp.arange(ntiles, dtype=jnp.int32)[None, :], (chunk, ntiles)
    )

    def step(carry, inp):
        lists, counts, dropped = carry
        cx0, cx1, cy0, cy1, cval, cids = inp
        mx = (txs[None, :] >= cx0[:, None]) & (txs[None, :] <= cx1[:, None])
        my = (tys[None, :] >= cy0[:, None]) & (tys[None, :] <= cy1[:, None])
        mask = (my[:, :, None] & mx[:, None, :]).reshape(chunk, ntiles)
        mask = mask & cval[:, None]
        mi = mask.astype(jnp.int32)
        excl = jnp.cumsum(mi, axis=0) - mi
        dest = counts[None, :] + excl  # (chunk, ntiles)
        ok = mask & (dest < cap)
        dest_safe = jnp.where(ok, dest, cap)  # cap column = discard pad
        lists_p = jnp.concatenate(
            [lists, jnp.full((ntiles, 1), LIST_EMPTY, jnp.int32)], axis=1
        )
        lists_p = lists_p.at[tile_idx, dest_safe].set(
            jnp.broadcast_to(cids[:, None], (chunk, ntiles)), mode="drop"
        )
        new_counts = counts + mi.sum(axis=0)
        new_dropped = dropped + (mask & (dest >= cap)).sum()
        return (lists_p[:, :cap], new_counts, new_dropped), None

    # `+ 0 * yo` makes the initial carries inherit y_offset's device-varying
    # type under shard_map (scan carries must match input varyingness).
    lists0 = jnp.full((ntiles, cap), LIST_EMPTY, jnp.int32) + 0 * yo
    counts0 = jnp.zeros((ntiles,), jnp.int32) + 0 * yo
    (lists, counts, dropped), _ = jax.lax.scan(
        step, (lists0, counts0, jnp.int32(0) + 0 * yo), (tx0, tx1, ty0, ty1, val, ids)
    )
    return lists, jnp.minimum(counts, cap), dropped


# ---------------------------------------------------------------------------
# Tiled visibility from bin lists (jnp fallback for the Pallas kernel)
# ---------------------------------------------------------------------------


def visibility_binned(
    tri: TriBuf,
    config: RenderConfig,
    chunk: int = 8,
    y_offset: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (tid (H,W), zbuf (H,W), bin_overflow ()).

    y_offset shifts pixel rows (for sharded framebuffer bands, SURVEY.md
    §5.8): the band renders rows [y_offset, y_offset+H) of the full frame.
    """
    H, W = config.height, config.width
    TH, TW = config.tile_h, config.tile_w
    ntx = _pad_to(W, TW) // TW
    nty = _pad_to(H, TH) // TH
    ntiles = ntx * nty
    sub = config.subpixel

    lists, counts, dropped = bin_triangles(tri, config, y_offset=y_offset)
    cap = lists.shape[1]
    kchunks = _pad_to(cap, chunk) // chunk
    if kchunks * chunk != cap:
        lists = jnp.concatenate(
            [lists, jnp.full((ntiles, kchunks * chunk - cap), LIST_EMPTY, jnp.int32)],
            axis=1,
        )
    lists_s = lists.reshape(ntiles, kchunks, chunk).transpose(1, 0, 2)

    # per-tile pixel grids (ntiles, TH, TW), in FULL-frame fixed coords
    tyi = jnp.arange(nty * TH, dtype=jnp.int32)
    txi = jnp.arange(ntx * TW, dtype=jnp.int32)
    pxf = txi * sub + sub // 2
    pyf = (tyi + y_offset) * sub + sub // 2
    px = (
        pxf.reshape(1, ntx, 1, TW)
        .repeat(nty, axis=0)
        .reshape(ntiles, 1, TW)
    )
    py = (
        pyf.reshape(nty, 1, TH, 1)
        .repeat(ntx, axis=1)
        .reshape(ntiles, TH, 1)
    )

    C = tri.capacity

    def step(carry, cids):
        zb, tb = carry  # (ntiles, TH, TW)
        safe = jnp.minimum(cids, C - 1)
        ok = (cids < C)[:, :, None, None]
        cxs = tri.xs[safe][:, :, None, None, :]  # (ntiles, chunk, 1, 1, 3)
        cys = tri.ys[safe][:, :, None, None, :]
        cz = tri.z[safe][:, :, None, None, :]
        mask, zf = rc.tri_fragment(
            cxs, cys, cz, px[:, None, :, :], py[:, None, :, :], xp=jnp
        )  # (ntiles, chunk, TH, TW)
        mask = mask & ok
        zf = jnp.where(mask, zf, rc.BG_DEPTH)
        k = jnp.argmin(zf, axis=1)  # first min == lowest id (list ordered)
        z_new = jnp.take_along_axis(zf, k[:, None], axis=1)[:, 0]
        id_new = jnp.take_along_axis(cids, k.reshape(ntiles, -1), axis=1).reshape(
            z_new.shape
        )
        id_new = jnp.where(jnp.isinf(z_new), BG, id_new)
        upd = rc.resolve_better(z_new, id_new, zb, tb, jnp)
        return (jnp.where(upd, z_new, zb), jnp.where(upd, id_new, tb)), None

    # inherit y_offset's device-varying type (see bin_triangles)
    yvar = 0 * jnp.asarray(y_offset, jnp.int32)
    zb0 = jnp.full((ntiles, TH, TW), rc.BG_DEPTH, jnp.float32) + yvar.astype(
        jnp.float32
    )
    tb0 = jnp.full((ntiles, TH, TW), BG, jnp.int32) + yvar
    (zb, tb), _ = jax.lax.scan(step, (zb0, tb0), lists_s)

    def untile(a):
        return (
            a.reshape(nty, ntx, TH, TW)
            .transpose(0, 2, 1, 3)
            .reshape(nty * TH, ntx * TW)[:H, :W]
        )

    return untile(tb), untile(zb), dropped
