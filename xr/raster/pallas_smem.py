"""SMEM-records Pallas visibility kernel (per-tile record windows).

Records are SMEM windows shaped (ntiles, 1, cap) — block dims equal to the
array dims, which Mosaic's tiling rules accept — so per-triangle reads are
plain scalar loads. (A round-1 VMEM variant extracted scalars with masked
reductions; vector->scalar moves serialize the triangle loop and it was
retired in round 3.) The streaming kernel (pallas_stream.py) shares this
module's record layout and scalar raster loop; the renderer picks via
RenderConfig.backend.
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


NFIELDS = 18  # record width; see pack_tri_records
_B16 = 32768  # bias packing signed 16-bit bbox coords into u16 halves


def pack_tri_records(tri: TriBuf, yo):
    """(C, 18) i32 PLANE-FORM records — the kernels' per-record scalar work
    is the bottleneck (the scalar core issues ~1 op/cycle), so everything
    derivable per RECORD is precomputed here, vectorized, at C scale:

      0..8   a_k, b_k, c_k per edge (k = edge opposite vertex k, the
             fp.coverage order): e_k(p) = a_k*px + b_k*py + c_k, exact
             int32 (c_k = e_k(0,0), |c_k| <= 2*span^2 by the fixedpoint
             bound; intermediate wraparound is modular-safe)
      9..11  z0 z1 z2 (f32 bits)
      12     inv_area = 1/area2 (f32 bits, 0 for degenerate) — the SAME
             f32 value chain as fp.barycentrics_f32 (area2 = c0+c1+c2 =
             e0+e1+e2 at every pixel, exactly), so the kernels never
             divide: the broadcast reciprocal is one scalar load. Packing
             it also removes the only Mosaic-vs-XLA float-op pairing in
             the pipeline (the divide now happens once, in XLA, for every
             backend).
      13     z_min = min(z0, z1, z2) DEFLATED by an 8-ulp margin (f32
             bits) — occlusion early-out: a record whose nearest vertex is
             strictly behind every pixel of the tile's current z-buffer
             cannot win any (z, id) lex-min test, so the kernels skip its
             band loop entirely; the margin absorbs f32 interpolation
             rounding (zf can land a few ulps below the true vertex min),
             keeping the early-out bit-exact. Fields 9..13 are contiguous
             so the stream prep's f32 window is ONE slice.
      14     triangle id
      15     top-left tie offsets o_k in bits 0..2 (accept iff e_k >= o_k)
      16     packed y bbox: (by0+32768) | (by1+32768) << 16 (band-translated)
      17     packed x bbox: (bx0+32768) | (bx1+32768) << 16
    """
    C = tri.capacity
    xs = tri.xs
    ys = tri.ys - yo
    cols = []
    of = jnp.zeros((C,), jnp.int32)
    for k, (i0, i1) in enumerate(((1, 2), (2, 0), (0, 1))):
        # edge opposite vertex k runs v_{i0} -> v_{i1}
        a = ys[:, i1] - ys[:, i0]
        b = xs[:, i0] - xs[:, i1]
        c = -a * xs[:, i0] - b * ys[:, i0]
        cols += [a, b, c]
        tie = (a > 0) | ((a == 0) & (b > 0))
        of = of | (jnp.where(tie, 0, 1) << k)
    zbits = jax.lax.bitcast_convert_type(tri.z, jnp.int32)

    def bpack(lo, hi):
        # DEFENSIVE clamp only: RenderConfig.__post_init__'s edge-overflow
        # assert bounds every post-clip (and band-translated) coordinate to
        # |span| << 32767, so this clamp is provably dead under that same
        # invariant — it exists so a future subpixel_bits/guard_band change
        # that outgrows i16 degrades to a too-small bbox (a loud visual
        # artifact) instead of packed-u16 wraparound garbage
        lo = jnp.clip(lo, -_B16, _B16 - 1)
        hi = jnp.clip(hi, -_B16, _B16 - 1)
        return ((lo + _B16) & 0xFFFF) | ((hi + _B16) << 16)

    byp = bpack(ys.min(axis=1), ys.max(axis=1))
    bxp = bpack(xs.min(axis=1), xs.max(axis=1))
    # Exactly fp.barycentrics_f32's reciprocal (area2 = e0+e1+e2 is the
    # same int32 value at every pixel, = c0+c1+c2 here by sum(a)=sum(b)=0)
    area2f = (cols[2] + cols[5] + cols[8]).astype(jnp.float32)
    safe = jnp.where(area2f == 0.0, jnp.float32(1.0), area2f)
    inva = jnp.where(area2f != 0.0, 1.0 / safe, 0.0).astype(jnp.float32)
    invb = jax.lax.bitcast_convert_type(inva, jnp.int32)
    # Deflated occlusion bound (ADVICE r3): interpolated zf = sum of three
    # rounded f32 products can land a few ulps BELOW min(z0,z1,z2), so a
    # record with z_min one ulp above the tile's zmax could be skipped yet
    # win a near-tie pixel. Deflate by 8 ulps relative + an absolute tiny
    # (covers z_min == 0) so "z_min' > zmax => cannot win" holds under the
    # <= ~5-ulp interpolation error; the early-out stays bit-exact vs the
    # no-early-out backends.
    zmin = tri.z.min(axis=1)
    zmin = (zmin * (1.0 - 8.0 * 2.0**-23) - 1e-35).astype(jnp.float32)
    zminb = jax.lax.bitcast_convert_type(zmin, jnp.int32)
    return jnp.concatenate(
        [jnp.stack(cols, axis=1), zbits]
        + [
            v.reshape(C, 1)
            for v in (invb, zminb, jnp.arange(C, dtype=jnp.int32), of, byp, bxp)
        ],
        axis=1,
    )


def gather_field_records(lists, packed, C: int):
    """Gather per-entry record FIELD arrays for an id-list array (padded to
    a 128 multiple): NFIELDS arrays, z fields bitcast back to f32, id field
    set to BG for empty slots. The masking/sentinel choices here are
    semantics-bearing and shared by every kernel that consumes records."""
    n = lists.shape[-1]
    npad = _pad_to(n, 128)
    if npad != n:
        pad = jnp.full(lists.shape[:-1] + (npad - n,), 2**30, jnp.int32)
        lists = jnp.concatenate([lists, pad], axis=-1)
    safe = jnp.minimum(lists, C - 1)
    rows = packed[safe]
    empty = (lists >= C)[..., None]
    rows = jnp.where(empty & (jnp.arange(NFIELDS) == 14), BG, rows)
    fields = [rows[..., k] for k in range(NFIELDS)]
    for k in (9, 10, 11, 12, 13):
        fields[k] = jax.lax.bitcast_convert_type(fields[k], jnp.float32)
    return fields


def _raster_scalar_records(
    read, n, tile_i, tile_j, zb_ref, tid_ref, sub_iota,
    *, th: int, tw: int, sub: int, depth_test: bool = True,
    x_test: bool = False, zmax=None, band_zmax=None, strides=None,
    chunk=None, ymask: bool = False,
):
    """Triangle loop with scalar PLANE-FORM record reads (pack_tri_records
    field map). `read(field, ci, cf)` -> scalar, where ci/cf are CURSORS:
    the record index k for direct per-field arrays (strides=None), or
    strength-reduced base offsets k*si / k*sf into packed int/f32 windows
    (strides=(si, sf)) — the loop carries the cursors so the scalar core
    never multiplies per field access (it is the kernel's bottleneck at
    ~1 op/cycle, one loop iteration per record).

    Per-record derivations (edge coefficients, tie offsets, bbox min/max,
    1/area2) arrive precomputed in the record and the loop body is mostly
    loads. The tie rule is an integer threshold: accept iff e_k >= o_k
    (o in {0,1}) — exact. The barycentric reciprocal is the packed
    inv_area field broadcast to one vector (a scalar f32 divide serializes
    on the scalar core: +14 ms/frame at 1M tris; the old in-kernel VECTOR
    divide burned ~10 VPU ops per record — both retired by packing).

    x_test: whole-record tile bbox reject for records not binned to this
    tile (the global large bucket) — two packed-bbox loads gate the other
    ~14 field loads; binned records always overlap the tile.

    depth_test=False is PAINTER'S ORDER: the highest-id covered triangle
    wins (callers init tid to -1 and map -1 -> BG afterwards), exactly the
    jnp backend's fold (SURVEY.md §2.1 "Pipeline state").

    zmax: optional SCALAR occlusion bound — an upper bound of the tile's
    current z-buffer max (the caller recomputes it at block granularity;
    zb only ever decreases, so a stale bound stays valid). A record with
    z_min > zmax has zf >= z_min > zmax >= zb at every pixel, so the
    strict (z, id) lex-min test cannot accept it and the whole band loop
    is skipped behind one scalar compare. Only sound with depth_test.

    band_zmax: optional list of PER-BAND occlusion bounds (same soundness
    argument per 8-row band): a surviving record skips the VECTOR work of
    bands it cannot win. Requires zmax (z_min must be in scope).

    chunk: optional (G, read_chunk_zmin) — records come in groups of G
    with a precomputed aggregate min of their deflated z_min values
    (read_chunk_zmin(kc) -> scalar). A chunk whose aggregate exceeds zmax
    is skipped whole: ~4 scalar ops instead of G gate evaluations. Exact:
    min(z_min) > zmax implies every member's z_min > zmax. Pays when
    occluded records cluster (bin_zorder sorts them to the segment tail).

    ymask: field 16 carries a PRECOMPUTED per-entry y-band hit mask (bit b
    set iff the record's y bbox overlaps 8-row band b of THIS tile — the
    stream prep resolves it in XLA, vectorized at entries scale) instead
    of the packed y bbox: the band test is one constant-mask AND + compare
    instead of a bbox unpack (4 scalar ops) and two range compares per
    band. Bit-exact — the mask encodes exactly the old by0/by1 overlap
    test. Only meaningful for binned (non-x_test) records.
    """
    half = sub // 2
    nbands = th // 8
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    px = (lane_iota + tile_j * tw) * sub + half
    tile_px0 = tile_j * tw * sub + half
    tile_px1 = (tile_j * tw + tw - 1) * sub + half
    tile_py = tile_i * th * sub + half
    tile_py1 = tile_py + (th - 1) * sub
    si, sf = strides if strides is not None else (1, 1)

    def tri_gate(ci, cf):
        # per-record z gate, then the bbox/record work
        if zmax is not None:
            assert depth_test, "z early-out requires depth testing"
            zmin_r = read(13, ci, cf)

            @pl.when(zmin_r <= zmax)
            def _():
                tri_pre(ci, cf, zmin_r)
        else:
            tri_pre(ci, cf, None)

    def tri_pre(ci, cf, zmin_r):
        if x_test:
            # whole-record bbox reject BEFORE the other ~14 loads: the
            # large bucket is scanned by every tile, and most records
            # miss most tiles
            bxp = read(17, ci, cf)
            bx0 = (bxp & 0xFFFF) - _B16
            bx1 = ((bxp >> 16) & 0xFFFF) - _B16
            byp = read(16, ci, cf)
            by0 = (byp & 0xFFFF) - _B16
            by1 = ((byp >> 16) & 0xFFFF) - _B16
            hit_tile = (
                (bx1 >= tile_px0) & (bx0 <= tile_px1)
                & (by1 >= tile_py) & (by0 <= tile_py1)
            )

            @pl.when(hit_tile)
            def _():
                tri_work(ci, cf, zmin_r, by0, by1, None)
        elif nbands > 1:
            if ymask:
                ym = read(16, ci, cf)
                tri_work(ci, cf, zmin_r, None, None, ym)
            else:
                byp = read(16, ci, cf)
                by0 = (byp & 0xFFFF) - _B16
                by1 = ((byp >> 16) & 0xFFFF) - _B16
                tri_work(ci, cf, zmin_r, by0, by1, None)
        else:
            # single-band binned records always hit their band: no bbox
            tri_work(ci, cf, zmin_r, None, None, None)

    def tri_work(ci, cf, zmin_r, by0, by1, ym):
        a0 = read(0, ci, cf)
        b0 = read(1, ci, cf)
        c0 = read(2, ci, cf)
        a1 = read(3, ci, cf)
        b1 = read(4, ci, cf)
        c1 = read(5, ci, cf)
        a2 = read(6, ci, cf)
        b2 = read(7, ci, cf)
        c2 = read(8, ci, cf)
        z0 = read(9, ci, cf)
        z1 = read(10, ci, cf)
        z2 = read(11, ci, cf)
        inv = jnp.full((8, 128), read(12, ci, cf))
        tri_id = read(14, ci, cf)
        of = read(15, ci, cf)

        o0 = of & 1
        o1 = (of >> 1) & 1
        o2 = (of >> 2) & 1

        def band(b):
            py = (sub_iota + tile_i * th + b * 8) * sub + half

            def do_band():
                e0 = a0 * px + b0 * py + c0
                e1 = a1 * px + b1 * py + c1
                e2 = a2 * px + b2 * py + c2
                mask = (e0 >= o0) & (e1 >= o1) & (e2 >= o2)
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

            hit = None
            if nbands > 1 and ym is not None:
                # precomputed band mask: one AND against a static constant
                hit = (ym & (1 << b)) != 0
            elif nbands > 1:
                # y-band overlap (the whole-record tile test already
                # covered y when nbands == 1 under x_test)
                band_py0 = tile_py + b * 8 * sub
                band_py1 = band_py0 + 7 * sub
                hit = (by1 >= band_py0) & (by0 <= band_py1)
            if band_zmax is not None and zmin_r is not None:
                zh = zmin_r <= band_zmax[b]
                hit = zh if hit is None else (hit & zh)
            if hit is None:
                do_band()
            else:
                @pl.when(hit)
                def _():
                    do_band()

        for b in range(nbands):
            band(b)

    zero = jnp.int32(0) * n  # loop-carried cursor init (traced i32)
    if chunk is not None:
        G, read_chunk_zmin = chunk
        assert zmax is not None, "chunk gating requires the z early-out"

        def ch_body(kc, _):
            @pl.when(read_chunk_zmin(kc) <= zmax)
            def _():
                k0 = kc * G

                def inner(_k, cur):
                    ci, cf = cur
                    tri_gate(ci, cf)
                    return (ci + si, cf + sf)

                jax.lax.fori_loop(
                    0, jnp.minimum(n - k0, G), inner, (k0 * si, k0 * sf)
                )
            return 0

        jax.lax.fori_loop(0, (n + G - 1) // G, ch_body, 0)
    else:

        def tri_body(_k, cur):
            ci, cf = cur
            tri_gate(ci, cf)
            return (ci + si, cf + sf)

        jax.lax.fori_loop(0, n, tri_body, (zero, zero))


def _vis_kernel(
    counts_ref,  # SMEM (ntiles,)
    lcount_ref,  # SMEM (1,)
    *refs,  # NFIELDS small windows (1, 1, cap), NFIELDS large (lcap,), outs
    th: int,
    tw: int,
    sub: int,
    ntx: int,
    depth_test: bool = True,
):
    smalls = refs[:NFIELDS]
    larges = refs[NFIELDS : 2 * NFIELDS]
    tid_ref, zb_ref = refs[2 * NFIELDS], refs[2 * NFIELDS + 1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    tid_ref[:] = jnp.full((th, tw), BG if depth_test else -1, jnp.int32)
    zb_ref[:] = jnp.full((th, tw), jnp.inf, jnp.float32)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    _raster_scalar_records(
        lambda f, ci, cf: larges[f][ci],
        lcount_ref[0],
        i, j, zb_ref, tid_ref, sub_iota,
        th=th, tw=tw, sub=sub, depth_test=depth_test, x_test=True,
    )
    _raster_scalar_records(
        lambda f, ci, cf: smalls[f][0, 0, ci],
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
    """Same contract as every visibility backend (see dispatch.py)."""
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
        + [small_spec() for _ in range(NFIELDS)]
        + [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(NFIELDS)],
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
