"""Measured capacity auto-sizing (VERDICT r4 #3; SURVEY.md §7.3.1).

Every variable-size stage in this framework is a fixed capacity plus a
loud overflow counter (bin lists, clip fans, stream entries, blend
records). The capacities were hand-tuned per preset; this module derives
them from a HOST-SIDE dry pass instead: run the numpy geometry stage (the
same xp-generic code the oracle uses) plus the numpy mirror of the bin
emission rules over one or more sample cameras, measure the true
occupancy of every stage, and return a config sized to the measurements
times a safety margin. Overflow counters stay loud either way — the
margin buys headroom for camera frames between the samples, the counters
catch a path that escapes it.

The bin emission mirror shares `_tile_ranges` / `span_classes` with the
real device binning (xr/raster/jnp_backend.py) so the measured counts
cannot drift from the bins XLA actually builds; a regression test pins
the mirror's totals to BinResult.raw_counts.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Tuple

import numpy as np

from xr.core import math3d as m3
from xr.core.types import RenderConfig, Scene
from xr.pipeline.geometry import MAX_FAN, clip_budget, geometry
from xr.raster.jnp_backend import _tile_ranges, grid_dims, span_classes


def measure_frame(scene: Scene, camera, config: RenderConfig,
                  model_matrices=None) -> dict:
    """Exact stage-occupancy counts for ONE camera (host-side numpy).

    Returns a dict of the measured quantities each capacity knob bounds:
      live_records     post-clip setup triangles  -> clip_expand/capacity
      crossing         tris entering Sutherland-Hodgman -> clip_budget
      per_tile_max     largest per-tile bin list  -> bin_capacity
      total_entries    all (tile, id) bin entries -> stream_entry_cap
      large            global-bucket triangles    -> large_capacity
      medium           medium-eligible triangles  -> medium_capacity
      quad             2x2-spanning smalls        -> bin_quad_capacity
      transparent      alpha < 1 records          -> blend_capacity
    """
    if model_matrices is not None:
        scene = scene.replace(model_matrices=model_matrices)
    T = scene.mesh.num_triangles
    aspect = config.width / config.height
    view, proj = m3.camera_matrices(camera, aspect, np)

    # dry pass: open the clip budget wide enough that nothing drops (two
    # passes when the first one's budget was exceeded — counts must be
    # TRUE occupancies, not capacity-clipped ones)
    budget = clip_budget(T, config)
    for _ in range(2):
        dry = dataclasses.replace(config, clip_budget=budget)
        cap = T + budget * MAX_FAN  # identity layout: no compaction
        stats: dict = {}
        tri = geometry(scene, view, proj, dry, xp=np, capacity=cap,
                       stats_out=stats)
        crossing = int(stats["crossing_total"])
        if crossing <= budget:
            break
        budget = crossing

    tx0, tx1, ty0, ty1, valid = _tile_ranges(tri, config, 0, xp=np)
    small, med_ok = span_classes(tx0, tx1, ty0, ty1, valid, config, xp=np)
    nty, ntx = grid_dims(config)
    ntiles = nty * ntx

    # small-class emission: the unique tiles of a <= 2x2 span (the same
    # dedup rule bin_triangles' masked 4-slot emission applies)
    sm = valid & small
    two_x = tx1 > tx0
    two_y = ty1 > ty0
    t00 = (ty0 * ntx + tx0)[sm]
    parts = [t00]
    parts.append((ty0 * ntx + tx1)[sm & two_x])
    parts.append((ty1 * ntx + tx0)[sm & two_y])
    parts.append((ty1 * ntx + tx1)[sm & two_x & two_y])

    # medium-class emission: every covered tile of the span (bounded by
    # medium_span on both axes)
    med_tiles = np.zeros((0,), np.int64)
    if med_ok.any():
        mi = np.where(med_ok)[0]
        s = config.medium_span
        ox = np.arange(s)
        tlx = tx0[mi][:, None] + ox[None]
        tly = ty0[mi][:, None] + ox[None]
        okx = tlx <= tx1[mi][:, None]
        oky = tly <= ty1[mi][:, None]
        mt = tly[:, :, None] * ntx + tlx[:, None, :]
        mm = oky[:, :, None] & okx[:, None, :]
        med_tiles = mt[mm]
    parts.append(med_tiles)

    tiles = np.concatenate([p.astype(np.int64) for p in parts])
    counts = np.bincount(tiles, minlength=ntiles)

    transparent = 0
    alpha = scene.materials.alpha
    if alpha is not None:
        a = np.asarray(alpha, np.float32)
        transparent = int(
            (np.asarray(tri.valid) & (a[np.asarray(tri.mat_id)] < 1.0)).sum()
        )

    return {
        "live_records": int(stats["live_records"]),
        "crossing": crossing,
        "fan_records": int(stats["fan_records"]),
        "per_tile_max": int(counts.max()) if ntiles else 0,
        "total_entries": int(tiles.shape[0]),
        "large": int((valid & ~small & ~med_ok).sum()),
        "medium": int(med_ok.sum()),
        "quad": int((sm & two_x & two_y).sum()),
        "transparent": transparent,
    }


def _as_pairs(cameras) -> Iterable[Tuple]:
    for c in cameras:
        yield c if isinstance(c, tuple) else (c, None)


def autosize_config(
    scene: Scene,
    cameras,
    config: RenderConfig,
    margin: float = 1.5,
) -> RenderConfig:
    """Return `config` with every capacity knob sized to the measured
    maxima over `cameras` (each a Camera or a (Camera, model_matrices)
    pair — e.g. a few samples of a preset's animate path) times `margin`.

    A new scene needs zero hand tuning: Renderer(scene, autosize_config(
    scene, [cam], config)) renders overflow-free at any triangle count the
    sampled cameras represent, and the overflow counters stay loud for
    camera frames the samples did not cover (SURVEY.md §7.3.1).
    """
    ms = [measure_frame(scene, c, config, mm) for c, mm in _as_pairs(cameras)]
    agg = {k: max(m[k] for m in ms) for k in ms[0]}

    T = scene.mesh.num_triangles

    def pad(n, floor=64):
        return int(np.ceil(n * margin)) + floor

    # clip_capacity = ceil(T * clip_expand) + 64 must cover the live
    # records; express the measured need through clip_expand so the
    # existing Renderer sizing path applies unchanged
    clip_expand = max(pad(agg["live_records"]) - 64, 1) / max(T, 1)
    out = dataclasses.replace(
        config,
        clip_expand=float(clip_expand),
        clip_budget=pad(agg["crossing"], floor=16),
        bin_capacity=pad(agg["per_tile_max"], floor=128),
        large_capacity=pad(agg["large"], floor=128),
        stream_entry_cap=pad(agg["total_entries"]),
        bin_quad_capacity=pad(agg["quad"], floor=16),
    )
    if config.medium_capacity > 0:
        out = dataclasses.replace(out, medium_capacity=pad(agg["medium"], floor=16))
    if config.blend:
        out = dataclasses.replace(
            out, blend_capacity=pad(agg["transparent"], floor=8)
        )
    return out
