"""Exact fixed-point edge functions — the heart of pixel-exact coverage.

The reference's rasterizer is GPU fixed-function hardware (SURVEY.md §3.3),
which snaps vertices to a subpixel grid and evaluates integer edge equations
with a top-left fill rule. We reproduce that in software: screen coordinates
snap to 1/2**subpixel_bits of a pixel and ALL coverage math is int32, so the
CPU oracle (numpy) and the TPU pipeline (XLA/Pallas) agree BIT-FOR-BIT on
which pixels each triangle covers — float associativity can never flip a
pixel (SURVEY.md §7.3.3 names exactly this mitigation).

Overflow analysis (why RenderConfig asserts a coordinate budget):
  with |fixed coord| <= C, edge terms are A*(px-X0) + B*(py-Y0) where
  |A|,|B| <= 2C span and |px-X0| <= 2C, so |E| <= 2*(2C)*(2C) = 8C^2; int32
  requires 8C^2 < 2^31, i.e. C < 2^14 = 16384. The BINDING runtime check is
  in RenderConfig.__post_init__ (xr/core/types.py:123-127): it bounds the
  actual coordinate SPAN — max(W,H)*subpixel*(1+guard_band) — and asserts
  2*span^2 < 2^31, which is the same |E| <= 2*span^2 bound expressed in
  span (= 2C) units. At subpixel=4, guard_band=3, 1920px: span = 30720,
  2*span^2 = 1.89e9 < 2^31 — safe, with no slack for subpixel_bits=3+.

All functions take ``xp`` (numpy or jax.numpy) and use identical formulas.
"""

from __future__ import annotations

import numpy as np


def snap_to_fixed(coord, subpixel: int, xp=np):
    """Snap float screen coords (pixels) to the fixed-point grid (int32).

    round-half-up via floor(x*sub + 0.5); identical formula on both sides.
    """
    return xp.floor(coord * float(subpixel) + 0.5).astype(xp.int32)


def pixel_center_fixed(index, subpixel: int, xp=np):
    """Fixed-point coordinate of pixel center: (i + 0.5) in pixel units."""
    return index.astype(xp.int32) * subpixel + (subpixel // 2)


def edge_coeffs(xs, ys, xp=np):
    """Per-edge A, B for the 3 edges v0->v1, v1->v2, v2->v0.

    xs, ys: (..., 3) int32 fixed-point vertex coords (y DOWN screen space).
    E_k(p) = A_k*(px - X_k) + B_k*(py - Y_k) with
      A_k = Y_{k+1} - Y_k,  B_k = X_k - X_{k+1},
    i.e. (A, B) is the INWARD edge normal for positive-orientation triangles
    (see `doubled_area`): E_k > 0 strictly inside.
    """
    xn = xp.roll(xs, -1, axis=-1)
    yn = xp.roll(ys, -1, axis=-1)
    a = yn - ys
    b = xs - xn
    return a, b


def doubled_area(xs, ys, xp=np):
    """Signed doubled area (int32, exact), positive == front-facing.

    World-CCW front faces (right-handed convention) become visually clockwise
    after the viewport y-flip; this formula is oriented so exactly those come
    out positive: area2 = (y1-y0)*(x2-x0) - (x1-x0)*(y2-y0). It equals
    E_k evaluated at the opposite vertex for every edge k of `edge_coeffs`.
    """
    return (ys[..., 1] - ys[..., 0]) * (xs[..., 2] - xs[..., 0]) - (
        xs[..., 1] - xs[..., 0]
    ) * (ys[..., 2] - ys[..., 0])


def edge_at(a, b, x0, y0, px, py):
    """Evaluate one edge function at fixed-point point(s) (px, py). Exact."""
    return a * (px - x0) + b * (py - y0)


def topleft_accept(e, a, b, xp=np):
    """D3D top-left fill rule: count E==0 pixels only on top/left edges.

    Edge included on tie iff A > 0 (left edge: y decreasing along the edge
    in y-down space) or A == 0 and B > 0 (top edge).
    """
    tie_ok = (a > 0) | ((a == 0) & (b > 0))
    return (e > 0) | ((e == 0) & tie_ok)


def coverage(xs, ys, px, py, xp=np):
    """Full coverage test of one positive-orientation triangle at points.

    xs, ys: (3,) int32 vertex coords; px, py: any-shaped int32 points.
    Returns (mask, (e0, e1, e2)) where e_k is the edge value OPPOSITE
    vertex k (e0 is edge v1->v2, etc.), so barycentric weight_k = e_k/area2.
    """
    a, b = edge_coeffs(xs, ys, xp)
    # Edge k of edge_coeffs is v_k -> v_{k+1}; the edge opposite vertex 0 is
    # v1->v2 = edge index 1, opposite vertex 1 is edge 2, opposite 2 is edge 0.
    es = []
    accepts = None
    for k in (1, 2, 0):
        e = edge_at(a[..., k], b[..., k], xs[..., k], ys[..., k], px, py)
        acc = topleft_accept(e, a[..., k], b[..., k], xp)
        accepts = acc if accepts is None else (accepts & acc)
        es.append(e)
    return accepts, tuple(es)


def barycentrics_f32(e0, e1, e2, xp=np):
    """Screen-space barycentric weights from exact integer edge values.

    One division; both sides compute e_i.astype(f32) / area2.astype(f32).
    """
    area2 = (e0 + e1 + e2).astype(xp.float32)
    # degenerate (area2 == 0) entries divide a sanitized 1.0 so the numpy
    # path stays warning-free; the selected value is 0 either way
    safe = xp.where(area2 == 0.0, xp.float32(1.0), area2)
    inv = xp.where(area2 != 0.0, 1.0 / safe, 0.0).astype(xp.float32)
    return (
        e0.astype(xp.float32) * inv,
        e1.astype(xp.float32) * inv,
        e2.astype(xp.float32) * inv,
    )
