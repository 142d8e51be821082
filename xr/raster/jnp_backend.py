"""Portable jnp visibility backends: chunked brute-force and tile-binned.

These produce the per-pixel visibility buffer (winning triangle id + depth)
with EXACTLY the semantics of xr/raster/common.py — the same results as the
CPU oracle's bbox loop and the Pallas TPU kernel, bit-for-bit, because
coverage is integer math and the resolve is a lexicographic (z, id) min
(order-independent; SURVEY.md §5.2 determinism).

Binning is SORT-based and scatter-free (XLA TPU scatters serialize; sorts
and gathers vectorize): each triangle emits at most 4 (tile, id) pairs (its
bbox spans <= 2x2 tiles, or it goes to a global "large" bucket; the Pallas
kernels scan it behind a cheap scalar bbox reject, while this dense jnp
fallback evaluates it fully and skips the pass only when the bucket is
empty). Pairs are sorted by a packed
(tile << idbits | id) key, per-tile segments fall out contiguous and
id-ascending, and per-tile lists are pure gathers from the sorted array
(SURVEY.md §7.3.1: fixed capacities + loud overflow counters).

The jnp path runs on the CPU backend, which is what makes multi-chip
sharding testable without a pod (SURVEY.md §4.2); it is also the portable
fallback for the Pallas kernels (xr/raster/pallas_stream.py, pallas_smem.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from xr.core.types import RenderConfig
from xr.pipeline.geometry import TriBuf, _sort_compact_ids
from xr.raster import common as rc

BG = rc.BG_TRI_ID
LIST_EMPTY = jnp.int32(2**30)  # list sentinel (any id >= capacity works)


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def grid_dims(config: RenderConfig) -> Tuple[int, int]:
    return (
        _pad_to(config.height, config.tile_h) // config.tile_h,
        _pad_to(config.width, config.tile_w) // config.tile_w,
    )


# ---------------------------------------------------------------------------
# Brute force: every triangle vs every pixel, in chunks (config 1 scale;
# SURVEY.md §7.2 step 2).
# ---------------------------------------------------------------------------


def _chunk_best(zf, cids, xp=jnp):
    """Lexicographic (z, id) min across a chunk axis (axis 0 of zf).

    zf: (K, ...) with +inf where uncovered; cids: (K,) int32.
    Order-independent: among equal-z entries the smallest id wins.
    """
    z_min = zf.min(axis=0)
    bshape = (cids.shape[0],) + (1,) * (zf.ndim - 1)
    ids_b = cids.reshape(bshape)
    id_min = jnp.where(zf == z_min[None], ids_b, BG).min(axis=0)
    return z_min, jnp.where(jnp.isinf(z_min), BG, id_min)


def _chunk_last(zf, cids):
    """Painter's order (depth_test=False): the HIGHEST-id covered triangle
    wins; returns its id (or -1 if none) and its depth."""
    bshape = (cids.shape[0],) + (1,) * (zf.ndim - 1)
    ids_b = jnp.broadcast_to(cids.reshape(bshape), zf.shape)
    keyed = jnp.where(jnp.isinf(zf), -1, ids_b)
    idx = jnp.argmax(keyed, axis=0)
    id_new = jnp.take_along_axis(keyed, idx[None], axis=0)[0]
    z_new = jnp.take_along_axis(zf, idx[None], axis=0)[0]
    return jnp.where(id_new < 0, rc.BG_DEPTH, z_new), id_new


def _fold(carry, z_new, id_new, depth_test: bool):
    """Merge a chunk result into the (zb, tb) carry. With depth_test the
    resolve is the lexicographic (z, id) min; without it, painter's order
    (tb carries -1 for background; callers map -1 -> BG at the end)."""
    zb, tb = carry
    if depth_test:
        upd = rc.resolve_better(z_new, id_new, zb, tb, jnp)
    else:
        upd = id_new > tb
    return jnp.where(upd, z_new, zb), jnp.where(upd, id_new, tb)


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
        if config.depth_test:
            z_new, id_new = _chunk_best(zf, cids)
        else:
            z_new, id_new = _chunk_last(zf, cids)
        return _fold(carry, z_new, id_new, config.depth_test), None

    zb0 = jnp.full((H, W), rc.BG_DEPTH, jnp.float32)
    tb0 = jnp.full((H, W), BG if config.depth_test else -1, jnp.int32)
    (zb, tb), _ = jax.lax.scan(step, (zb0, tb0), (xs, ys, z, valid, ids))
    if not config.depth_test:
        tb = jnp.where(tb < 0, BG, tb)
    return tb, zb


# ---------------------------------------------------------------------------
# Sort-based binning: triangles -> per-screen-tile lists + global "large"
# bucket (SURVEY.md §3.5 "bin")
# ---------------------------------------------------------------------------


class BinResult(NamedTuple):
    lists: jnp.ndarray  # (ntiles, cap) i32 small-tri ids, LIST_EMPTY-padded
    counts: jnp.ndarray  # (ntiles,) i32 (<= cap)
    large_ids: jnp.ndarray  # (lcap,) i32, LIST_EMPTY-padded
    large_count: jnp.ndarray  # () i32 (<= lcap)
    dropped: jnp.ndarray  # () i32 — entries lost to capacity overflow
    # sorted-segment view (scatter-free streaming consumers): sid holds all
    # (tile, id) pair ids sorted by (tile, id); tile t's segment is
    # sid[starts[t] : starts[t] + raw_counts[t]]. Length depends on the
    # emission scheme (bin_pairs=4: 4C + medium keys; bin_pairs=2:
    # 2C + 2*bin_quad_capacity + medium keys) — the INVARIANT consumers
    # may rely on is that it is always EVEN (pallas_stream reads it
    # through a paired (len/2, 2) view)
    sid: jnp.ndarray = None  # (even length,) i32
    starts: jnp.ndarray = None  # (ntiles,) i32
    raw_counts: jnp.ndarray = None  # (ntiles,) i32 (uncapped)
    large_dropped: jnp.ndarray = None  # () i32


def _tile_ranges(tri: TriBuf, config: RenderConfig, y_offset, xp=jnp):
    """Per-triangle tile bbox ranges, clamped to this band's tile grid.

    xp-generic: the device binning calls it with jnp; the host-side
    capacity auto-sizer (xr/app/autosize.py) reuses THE SAME range rules
    with numpy so measured counts can never diverge from the real bins."""
    jnp = xp  # noqa: F841 — shadow so the body below is xp-generic
    nty, ntx = grid_dims(config)
    TH, TW = config.tile_h, config.tile_w
    sub = config.subpixel
    half = sub // 2
    yo = jnp.asarray(y_offset, jnp.int32)

    min_x = jnp.min(tri.xs, axis=1)
    max_x = jnp.max(tri.xs, axis=1)
    min_y = jnp.min(tri.ys, axis=1)
    max_y = jnp.max(tri.ys, axis=1)
    # pixel ranges (matches the oracle bbox rule), then tile ranges
    ix0 = -(-(min_x - half) // sub)
    ix1 = (max_x - half) // sub
    iy0 = -(-(min_y - half) // sub) - yo
    iy1 = (max_y - half) // sub - yo
    tx0 = jnp.clip(ix0 // TW, 0, ntx - 1)
    tx1 = jnp.clip(ix1 // TW, 0, ntx - 1)
    ty0 = jnp.clip(iy0 // TH, 0, nty - 1)
    ty1 = jnp.clip(iy1 // TH, 0, nty - 1)
    valid = (
        tri.valid
        & (ix1 >= jnp.maximum(ix0, 0))
        & (ix0 <= config.width - 1)
        & (iy1 >= jnp.maximum(iy0, 0))
        & (iy0 <= config.height - 1)
    )
    return tx0, tx1, ty0, ty1, valid


def span_classes(tx0, tx1, ty0, ty1, valid, config: RenderConfig, xp=jnp):
    """The bin-class predicates, THE definition shared by bin_triangles and
    diagnostics (__graft_entry__._bin_class_counts): `small` spans <= 2x2
    tiles (unmasked — and with valid for the emitted class), `med_ok` is
    the medium-ELIGIBLE set (spans < medium_span in both axes; the actual
    medium class is its first medium_capacity members in id order)."""
    small = (tx1 <= tx0 + 1) & (ty1 <= ty0 + 1)
    if config.medium_capacity > 0:
        med_ok = (
            valid & ~small
            & (tx1 - tx0 < config.medium_span)
            & (ty1 - ty0 < config.medium_span)
        )
    else:
        med_ok = xp.zeros_like(valid)
    return small, med_ok


def bin_triangles(
    tri: TriBuf, config: RenderConfig, y_offset=0
) -> BinResult:
    """Scatter-free binning: pair emission -> sort -> segment gather."""
    nty, ntx = grid_dims(config)
    ntiles = ntx * nty
    cap = config.bin_capacity
    lcap = config.large_capacity
    C = tri.capacity

    tx0, tx1, ty0, ty1, valid = _tile_ranges(tri, config, y_offset)
    small, med_ok = span_classes(tx0, tx1, ty0, ty1, valid, config)
    ids = jnp.arange(C, dtype=jnp.int32)

    idbits = max(1, int(C - 1).bit_length())
    assert (ntiles << idbits) < 2**31 - 1, (
        f"sort key overflow: ntiles={ntiles}, capacity={C} — use larger "
        "tiles or fewer triangles per frame"
    )

    # Front-to-back bin ordering (RenderConfig.bin_zorder): per-tile
    # segments sort by quantized triangle z_min instead of by id, so the
    # stream kernel's z early-out rejects occluded records after the
    # nearest few fill the tile. Emission classes carry (tile, id) as
    # SPLIT arrays and the sort is a stable two-operand key-value sort;
    # the z key rides each emission row by broadcast (a post-hoc
    # zq[id] gather over 4C keys would cost ~7 ns/element, PERF.md r2).
    zorder = config.bin_zorder
    if zorder:
        zbits = min(16, 30 - int(ntiles).bit_length())
        zq_c = jnp.clip(
            tri.z.min(axis=1) * float(2**zbits - 1), 0.0, float(2**zbits - 1)
        ).astype(jnp.int32)  # (C,) — garbage rows only ride sentinel slots
    else:
        zbits = 0
        zq_c = None

    def mk_keys(ptile, pid, zq=None):
        """Flatten one emission class to sort keys: packed (tile, id) i32
        (id order), or ((tile, zq) key, id payload) under bin_zorder."""
        if not zorder:
            return (((ptile << idbits) | pid).reshape(-1),)
        return (
            ((ptile << zbits) | zq).reshape(-1),
            jnp.broadcast_to(pid, ptile.shape).reshape(-1),
        )

    def cat_keys(parts):
        return tuple(
            jnp.concatenate([p[i] for p in parts]) for i in range(len(parts[0]))
        )

    # <= 4 (tile, id) pairs per small triangle; duplicates masked out
    sm = valid & small
    t00 = ty0 * ntx + tx0
    t01 = ty0 * ntx + tx1
    t10 = ty1 * ntx + tx0
    t11 = ty1 * ntx + tx1
    two_x = tx1 > tx0
    two_y = ty1 > ty0
    if config.bin_pairs == 2:
        # Lean emission (VERDICT r3 #3 lane B): the common case is 1-2
        # covered tiles (config3: 33k 1-tile + 12.3k 2-tile of 45k setup
        # records), so 4 static slots sort ~71% sentinels. Emit 2 slots —
        # home tile + the second tile of a 1x2/2x1 span (or t01 of a 2x2)
        # — and compact the ~2% of smalls spanning 2x2 into a static quad
        # budget carrying their remaining (t10, t11) pairs. Quad-budget
        # OVERFLOW routes to the global large bucket (never dropped); a
        # routed tri's 2 emitted slots stay live, which is benign — the
        # (z, id) resolve is duplicate-tolerant. Halves the sorted key
        # count; bit-identical per-tile candidate sets up to duplicates.
        quad = sm & two_x & two_y
        slot1 = jnp.where(two_x, t01, t10)
        m1 = sm & (two_x | two_y)
        pair_tile = jnp.stack(
            [
                jnp.where(sm, t00, ntiles),
                jnp.where(m1, slot1, ntiles),
            ],
            axis=1,
        )  # (C, 2); sentinel tile == ntiles sorts last
        key_parts = [
            mk_keys(pair_tile, ids[:, None], zq_c[:, None] if zorder else None)
        ]

        Q = config.bin_quad_capacity
        qid, _, qtotal = _sort_compact_ids(quad, Q, jnp)
        qlive = jnp.arange(Q) < jnp.minimum(qtotal, Q)
        qrank = jnp.cumsum(quad.astype(jnp.int32)) - 1
        in_quad = quad & (qrank < Q)  # the rest rides the large bucket
        qpair = jnp.stack([t10[qid], t11[qid]], axis=1)
        qtile = jnp.where(qlive[:, None], qpair, ntiles)
        qpid = jnp.where(qlive, qid.astype(jnp.int32), 0)[:, None]
        key_parts.append(
            mk_keys(qtile, qpid, zq_c[qid][:, None] if zorder else None)
        )
    else:
        in_quad = None
        m00 = sm
        m01 = sm & two_x
        m10 = sm & two_y
        m11 = sm & two_x & two_y
        pair_tile = jnp.stack(
            [
                jnp.where(m00, t00, ntiles),
                jnp.where(m01, t01, ntiles),
                jnp.where(m10, t10, ntiles),
                jnp.where(m11, t11, ntiles),
            ],
            axis=1,
        )  # (C, 4); sentinel tile == ntiles sorts last
        key_parts = [
            mk_keys(pair_tile, ids[:, None], zq_c[:, None] if zorder else None)
        ]

    # ---- hierarchical MEDIUM class (RenderConfig.medium_*): tris spanning
    # <= span x span tiles get REAL per-tile pairs instead of the global
    # bucket (which every tile scans). Compact up to medium_capacity of
    # them and emit span^2 masked pairs each into the SAME key sort — the
    # per-tile segments stay id-ascending, and the per-pixel candidate
    # sets are unchanged (the resolve is order-independent), so results
    # are bit-identical to the bucket route.
    span = config.medium_span
    mcap = config.medium_capacity
    medium = jnp.zeros_like(valid)
    if mcap > 0:
        mid, _, mtotal = _sort_compact_ids(med_ok, mcap, jnp)
        mlive = jnp.arange(mcap) < jnp.minimum(mtotal, mcap)
        # tris selected into the medium class (first mcap in id order);
        # the remainder keeps the large-bucket route (never dropped)
        mrank = jnp.cumsum(med_ok.astype(jnp.int32)) - 1
        medium = med_ok & (mrank < mcap)

        ox = jnp.arange(span, dtype=jnp.int32)
        tile_x = tx0[mid][:, None] + ox[None]  # (M, span)
        tile_y = ty0[mid][:, None] + ox[None]
        okx = tile_x <= tx1[mid][:, None]
        oky = tile_y <= ty1[mid][:, None]
        mtile = tile_y[:, :, None] * ntx + tile_x[:, None, :]  # (M, s, s)
        mmask = (
            oky[:, :, None] & okx[:, None, :] & mlive[:, None, None]
        )
        mtile = jnp.where(mmask, mtile, ntiles)
        mpid = jnp.where(mmask, mid[:, None, None], 0)
        key_parts.append(
            mk_keys(
                mtile, mpid, zq_c[mid][:, None, None] if zorder else None
            )
        )

    merged = cat_keys(key_parts)
    if merged[0].shape[0] % 2:
        # keep the total key count EVEN: pallas_stream fetches sorted
        # ids through a paired (2C, 2) view (sid.reshape(-1, 2)), which
        # an odd medium_capacity * medium_span^2 would break
        merged = tuple(
            jnp.concatenate(
                [m, jnp.full((1,), ntiles << (zbits if zorder else idbits) if i == 0 else 0, m.dtype)]
            )
            for i, m in enumerate(merged)
        )

    if zorder:
        # stable key-value sort: primary key packs (tile, quantized z_min);
        # the id rides as payload. Per-tile segments come out front-to-back
        # (ties keep emission order). Candidate sets are unchanged, so the
        # (z, id) lex-min resolve yields bit-identical images.
        k0, sid = jax.lax.sort(merged, num_keys=1, is_stable=True)
        stile = k0 >> zbits
    else:
        skeys = jnp.sort(merged[0])
        stile = skeys >> idbits
        sid = (skeys & ((1 << idbits) - 1)).astype(jnp.int32)

    tgt = jnp.arange(ntiles, dtype=jnp.int32)
    starts = jnp.searchsorted(stile, tgt, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(stile, tgt, side="right").astype(jnp.int32)
    raw_counts = ends - starts
    counts = jnp.minimum(raw_counts, cap)

    col = jnp.arange(cap, dtype=jnp.int32)
    gidx = jnp.clip(starts[:, None] + col[None, :], 0, sid.shape[0] - 1)
    lists = jnp.where(col[None, :] < counts[:, None], sid[gidx], LIST_EMPTY)

    # global large bucket (sorted ascending => resolve determinism for
    # free); medium-classified tris are excluded — they live in the lists.
    # bin_pairs==2 routes quad-budget OVERFLOW here (its 2 emitted slots
    # stay live; duplicate candidates are resolve-benign)
    to_large = valid & ~small & ~medium
    if in_quad is not None:
        to_large = to_large | (quad & ~in_quad)
    lkeys = jnp.where(to_large, ids, LIST_EMPTY)
    lsorted = jnp.sort(lkeys)
    large_count_raw = jnp.sum(to_large.astype(jnp.int32))
    large_count = jnp.minimum(large_count_raw, lcap)
    if lcap >= C:
        large_ids = jnp.concatenate(
            [lsorted, jnp.full((lcap - C,), LIST_EMPTY, jnp.int32)]
        )
    else:
        large_ids = lsorted[:lcap]

    large_dropped = jnp.maximum(large_count_raw - lcap, 0)
    dropped = jnp.sum(jnp.maximum(raw_counts - cap, 0)) + large_dropped
    return BinResult(
        lists, counts, large_ids, large_count, dropped.astype(jnp.int32),
        sid=sid, starts=starts, raw_counts=raw_counts,
        large_dropped=large_dropped.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Tiled visibility from bin lists (jnp fallback for the Pallas kernel)
# ---------------------------------------------------------------------------


def visibility_binned(
    tri: TriBuf,
    config: RenderConfig,
    chunk: int = 8,
    y_offset=0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (tid (H,W), zbuf (H,W), bin_overflow ()).

    y_offset shifts pixel rows (for sharded framebuffer bands, SURVEY.md
    §5.8): the band renders rows [y_offset, y_offset+H) of the full frame.
    """
    H, W = config.height, config.width
    TH, TW = config.tile_h, config.tile_w
    nty, ntx = grid_dims(config)
    ntiles = ntx * nty
    sub = config.subpixel

    b = bin_triangles(tri, config, y_offset=y_offset)

    # per-tile pixel grids (ntiles, TH, TW), in FULL-frame fixed coords
    tyi = jnp.arange(nty * TH, dtype=jnp.int32)
    txi = jnp.arange(ntx * TW, dtype=jnp.int32)
    pxf = txi * sub + sub // 2
    pyf = (tyi + jnp.asarray(y_offset, jnp.int32)) * sub + sub // 2
    px = pxf.reshape(1, ntx, 1, TW).repeat(nty, axis=0).reshape(ntiles, 1, TW)
    py = pyf.reshape(nty, 1, TH, 1).repeat(ntx, axis=1).reshape(ntiles, TH, 1)

    C = tri.capacity

    def scan_lists(carry, list_arr):
        """Fold one (ntiles, L) id-list array into the (zb, tb) carry."""
        L = list_arr.shape[1]
        Lp = _pad_to(L, chunk)
        if Lp != L:
            list_arr = jnp.concatenate(
                [list_arr, jnp.full((ntiles, Lp - L), LIST_EMPTY, jnp.int32)],
                axis=1,
            )
        seq = list_arr.reshape(ntiles, Lp // chunk, chunk).transpose(1, 0, 2)

        def step(cr, cids):
            safe = jnp.minimum(cids, C - 1)
            ok = (cids < C)[:, :, None, None]
            cxs = tri.xs[safe][:, :, None, None, :]
            cys = tri.ys[safe][:, :, None, None, :]
            cz = tri.z[safe][:, :, None, None, :]
            mask, zf = rc.tri_fragment(
                cxs, cys, cz, px[:, None, :, :], py[:, None, :, :], xp=jnp
            )  # (ntiles, chunk, TH, TW)
            mask = mask & ok
            zf = jnp.where(mask, zf, rc.BG_DEPTH)
            if config.depth_test:
                # lexicographic (z, id) min within the chunk
                z_new = zf.min(axis=1)
                idb = jnp.where(cids < C, cids, BG)[:, :, None, None]
                id_min = jnp.where(zf == z_new[:, None], idb, BG).min(axis=1)
                id_new = jnp.where(jnp.isinf(z_new), BG, id_min)
            else:
                idb = jnp.broadcast_to(
                    jnp.where(cids < C, cids, -1)[:, :, None, None], zf.shape
                )
                keyed = jnp.where(jnp.isinf(zf), -1, idb)
                idx = jnp.argmax(keyed, axis=1)
                id_new = jnp.take_along_axis(keyed, idx[:, None], axis=1)[:, 0]
                z_new = jnp.take_along_axis(zf, idx[:, None], axis=1)[:, 0]
                z_new = jnp.where(id_new < 0, rc.BG_DEPTH, z_new)
            return _fold(cr, z_new, id_new, config.depth_test), None

        return jax.lax.scan(step, carry, seq)[0]

    yvar = 0 * jnp.asarray(y_offset, jnp.int32)  # inherit vma under shard_map
    zb0 = jnp.full((ntiles, TH, TW), rc.BG_DEPTH, jnp.float32) + yvar.astype(
        jnp.float32
    )
    tb0 = jnp.full(
        (ntiles, TH, TW), BG if config.depth_test else -1, jnp.int32
    ) + yvar

    large_all = jnp.broadcast_to(b.large_ids[None, :], (ntiles, b.large_ids.shape[0]))
    carry = jax.lax.cond(
        b.large_count > 0,
        lambda c: scan_lists(c, large_all),
        lambda c: c,
        (zb0, tb0),
    )
    zb, tb = scan_lists(carry, b.lists)

    if not config.depth_test:
        tb = jnp.where(tb < 0, BG, tb)

    def untile(a):
        return (
            a.reshape(nty, ntx, TH, TW)
            .transpose(0, 2, 1, 3)
            .reshape(nty * TH, ntx * TW)[:H, :W]
        )

    return untile(tb), untile(zb), b.dropped
