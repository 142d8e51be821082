"""Shared rasterization formulas used by every visibility backend.

Three backends produce the per-pixel visibility buffer (winning triangle id +
depth): the CPU oracle's bbox loop (xr/cpu_ref), the portable jnp path, and
the Pallas TPU kernel (xr/raster). They MUST agree bit-for-bit, so the
per-pixel math lives here once: integer coverage (xr/core/fixedpoint.py),
the depth interpolation formula, and the (z, tri_id) resolve order.

Resolve semantics (SURVEY.md §7.3.4 order-independent depth resolve):
a fragment wins iff (z < z_best) or (z == z_best and id < id_best) — a strict
lexicographic min over (z, id), so the result is independent of triangle
processing order and of tiling/sharding.
"""

from __future__ import annotations

import numpy as np

from xr.core import fixedpoint as fp

BG_TRI_ID = np.int32(2**31 - 1)  # background sentinel: loses every id tie
BG_DEPTH = np.float32(np.inf)  # background depth: loses every z test
# NOTE: the *returned* frame depth uses 1.0 for background (D3D clear value);
# inf is internal so fragments at exactly z==1.0 still pass the "empty" test.


def pixel_grids(width: int, height: int, subpixel: int, xp=np):
    """Fixed-point pixel-center coordinate grids (H, W) int32."""
    px = fp.pixel_center_fixed(xp.arange(width, dtype=xp.int32), subpixel, xp)
    py = fp.pixel_center_fixed(xp.arange(height, dtype=xp.int32), subpixel, xp)
    return (
        xp.broadcast_to(px[None, :], (height, width)),
        xp.broadcast_to(py[:, None], (height, width)),
    )


def fragment_depth(e0, e1, e2, z, xp=np):
    """Interpolated NDC depth from exact integer edge values.

    z: (..., 3) per-vertex NDC depth. NDC depth is affine in screen space,
    so plain (non-perspective) barycentric interpolation is correct.
    """
    l0, l1, l2 = fp.barycentrics_f32(e0, e1, e2, xp)
    return (l0 * z[..., 0] + l1 * z[..., 1] + l2 * z[..., 2]).astype(xp.float32)


def depth_range_mask(zf, xp=np):
    """D3D depth-range clip: fragments outside [0, 1] are discarded.

    (Far/near planes are also geometrically clipped; this catches exact
    boundary cases identically on all backends.)"""
    return (zf >= 0.0) & (zf <= 1.0)


def resolve_better(z_new, id_new, z_best, id_best, xp=np):
    """Lexicographic (z, id) strict improvement test."""
    return (z_new < z_best) | ((z_new == z_best) & (id_new < id_best))


def tri_fragment(xs, ys, z, px, py, depth_test_range=True, xp=np):
    """Coverage + depth of ONE setup triangle at fixed-point points.

    xs, ys: (3,) i32; z: (3,) f32; px, py: any shape i32.
    Returns (mask, zf) — the single source of per-fragment visibility truth.
    """
    mask, (e0, e1, e2) = fp.coverage(xs, ys, px, py, xp)
    zf = fragment_depth(e0, e1, e2, z, xp)
    if depth_test_range:
        mask = mask & depth_range_mask(zf, xp)
    return mask, zf
