"""Pallas TPU visibility kernel — per-tile edge-function raster + z resolve.

This is the GPU's fixed-function rasterizer/depth unit rebuilt as an
explicit TPU kernel (BASELINE.json:5: "tile binning plus edge-function
rasterization and z-buffer resolve as Pallas kernels over HBM framebuffer
tiles"; SURVEY.md §2.1 "Rasterizer + depth test" — "the heart of the new
framework").

Pipeline position: geometry (xr/pipeline) -> jnp scan-compaction binning
(xr/raster/jnp_backend.bin_triangles) -> THIS kernel -> deferred shading.

Layout strategy: per-tile triangle records (snapped coords, depths, ids) are
pre-gathered into dense (ntiles, capq, 8, 128) arrays by XLA (one coalesced
gather), so each grid step's records arrive in VMEM via the automatic block
pipeline. Mosaic only allows dynamic indexing on non-tiled dims, so the
kernel walks record CHUNKS of 8x128 = 1024 triangles (dynamic index on the
free capq dim) and extracts per-triangle scalars from the in-register chunk
with a masked reduction — no scalar memory traffic at all. Then, per
triangle (sequential, ascending id == resolve order):

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
from xr.raster.jnp_backend import bin_triangles, _pad_to

BG = rc.BG_TRI_ID

# triangles per record chunk: one (sublane, lane) = (8, 128) int32 tile
CHUNK = 1024


def _vis_kernel(
    counts_ref,  # SMEM (ntiles,) — whole array, indexed by tile
    x0r, x1r, x2r, y0r, y1r, y2r,  # VMEM (1, capq, 8, 128) i32
    z0r, z1r, z2r,  # VMEM (1, capq, 8, 128) f32
    idr,  # VMEM (1, capq, 8, 128) i32
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
    half = sub // 2
    # fixed-point pixel centers for this tile. For sharded bands the caller
    # translates all triangle Y coords by -y_offset (exact int translation;
    # coverage/depth are translation-invariant), so rows here are band-local.
    iy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + i * th
    ix = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + j * tw
    px = ix * sub + half
    py = iy * sub + half

    tid_ref[:] = jnp.full((th, tw), BG, jnp.int32)
    zb_ref[:] = jnp.full((th, tw), jnp.inf, jnp.float32)

    n = counts_ref[i * ntx + j]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def chunk_body(q, _):
        cx0 = x0r[0, q]
        cx1 = x1r[0, q]
        cx2 = x2r[0, q]
        cy0 = y0r[0, q]
        cy1 = y1r[0, q]
        cy2 = y2r[0, q]
        cz0 = z0r[0, q]
        cz1 = z1r[0, q]
        cz2 = z2r[0, q]
        cid = idr[0, q]

        def tri_body(k, _):
            sel = (sub_iota == k // 128) & (lane_iota == k % 128)

            def ext(chunk):
                return jnp.sum(jnp.where(sel, chunk, jnp.zeros_like(chunk)))

            x0, x1, x2 = ext(cx0), ext(cx1), ext(cx2)
            y0, y1, y2 = ext(cy0), ext(cy1), ext(cy2)

            # edge k: v_k -> v_{k+1}; A = y_next - y_k, B = x_k - x_next
            # (xr/core/fixedpoint.edge_coeffs). e0/e1/e2 are the edges
            # (1,2,0) — opposite vertices 0/1/2 (fixedpoint.coverage).
            def edge(ax, ay, bx, by):
                a = by - ay
                b = ax - bx
                e = a * (px - ax) + b * (py - ay)
                tie = (a > 0) | ((a == 0) & (b > 0))
                acc = (e > 0) | ((e == 0) & tie)
                return e, acc

            e0, a0 = edge(x1, y1, x2, y2)
            e1, a1 = edge(x2, y2, x0, y0)
            e2, a2 = edge(x0, y0, x1, y1)
            mask = a0 & a1 & a2

            area2 = (e0 + e1 + e2).astype(jnp.float32)
            inv = jnp.where(area2 != 0.0, 1.0 / area2, 0.0).astype(jnp.float32)
            l0 = e0.astype(jnp.float32) * inv
            l1 = e1.astype(jnp.float32) * inv
            l2 = e2.astype(jnp.float32) * inv
            zf = (l0 * ext(cz0) + l1 * ext(cz1) + l2 * ext(cz2)).astype(
                jnp.float32
            )
            mask = mask & (zf >= 0.0) & (zf <= 1.0)

            tri_id = ext(cid)
            zb = zb_ref[:]
            tb = tid_ref[:]
            better = mask & ((zf < zb) | ((zf == zb) & (tri_id < tb)))
            zb_ref[:] = jnp.where(better, zf, zb)
            tid_ref[:] = jnp.where(better, tri_id, tb)
            return 0

        jax.lax.fori_loop(0, jnp.minimum(CHUNK, n - q * CHUNK), tri_body, 0)
        return 0

    nq = (n + CHUNK - 1) // CHUNK
    jax.lax.fori_loop(0, nq, chunk_body, 0)


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
    ntx = _pad_to(W, TW) // TW
    nty = _pad_to(H, TH) // TH
    ntiles = ntx * nty
    sub = config.subpixel

    lists, counts, dropped = bin_triangles(tri, config, y_offset=y_offset)
    cap = _pad_to(lists.shape[1], CHUNK)
    if cap != lists.shape[1]:
        lists = jnp.concatenate(
            [lists, jnp.full((ntiles, cap - lists.shape[1]), 2**30, jnp.int32)],
            axis=1,
        )
    capq = cap // CHUNK

    C = tri.capacity
    safe = jnp.minimum(lists, C - 1)
    recs_i = [tri.xs[safe, k] for k in range(3)] + [tri.ys[safe, k] for k in range(3)]
    recs_f = [tri.z[safe, k] for k in range(3)]
    ids = jnp.where(lists < C, lists, BG)

    # Sharded bands: translate all triangle Y coords by -y_offset (exact int
    # translation; E/area2/depth are translation-invariant), so the kernel's
    # band-local iota rows line up with full-frame semantics.
    yo = jnp.asarray(y_offset, jnp.int32) * sub
    recs_i = recs_i[:3] + [r - yo for r in recs_i[3:]]

    kernel = functools.partial(_vis_kernel, th=TH, tw=TW, sub=sub, ntx=ntx)

    def tile_spec():
        return pl.BlockSpec(
            (1, capq, 8, 128),
            lambda i, j: (i * ntx + j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pl.GridSpec(
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]  # counts, whole
        + [tile_spec() for _ in range(10)],
        out_specs=[
            pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
    )

    def rs(a):
        return a.reshape(ntiles, capq, 8, 128)

    tid, zb = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nty * TH, ntx * TW), jnp.int32),
            jax.ShapeDtypeStruct((nty * TH, ntx * TW), jnp.float32),
        ],
        interpret=interpret,
    )(counts, *[rs(r) for r in recs_i], *[rs(r) for r in recs_f], rs(ids))

    return tid[:H, :W], zb[:H, :W], dropped
