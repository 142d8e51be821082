"""Flip-proof row gathers: multi-record packed table layout.

XLA TPU lays narrow per-record tables out COLUMN-major ({0,1}) once they
exceed ~150-300k rows, and every gather from a flipped table runs at
~1.3-1.5 ns/ELEMENT (strided reads) instead of the ~1.8 ns/ROW amortized
rate — no layout pin fixes it (PERF.md round 2: the negative-results
list). The escape hatch measured in round 3: reshape the (R, K) table to
(R/P, P*K) with P = the largest power of two keeping P*K <= 128 lanes.
The row count drops below the flip threshold, the row-major layout
survives, one gather fetches P consecutive records, and each consumer
column is a P-way select on the low index bits — all fused elementwise.

`packed_cols` returns a column accessor so consumers are layout-agnostic;
with P == 1 it degenerates to exactly the plain row gather + column
slices. Bit-identical results either way (the same table values are
selected).
"""

from __future__ import annotations

import numpy as np

# Rows above this may flip column-major. Empirically on v5e: the 349k-row
# texture quad table still gathers at the amortized row rate (round 2:
# 3.7-4.2 ms), while the 431k-row record table, ~500k-row vertex table and
# 1M-row compaction table all flip (13-20 ms each at config-5 scale) — so
# the useful cut sits between those measurements. Packing BELOW the real
# flip point is actively harmful: the multi-record select chains read
# strided columns of the {1,0} gather output and XLA lowers each to a
# slice-reduce fusion (a measured 13x frame regression in round 3).
FLIP_THRESHOLD = 400_000


def pack_factor(rows: int, width: int, threshold: int | None = None) -> int:
    """Largest power-of-two P with P*width <= 128, if packing is needed
    (rows > threshold) and helps; else 1. threshold=None reads the module
    FLIP_THRESHOLD at call time (tests monkeypatch it to force packing)."""
    if threshold is None:
        threshold = FLIP_THRESHOLD
    if rows <= threshold or width > 64:
        return 1
    p = 1
    while p * 2 * width <= 128:
        p *= 2
    return p


def packed_cols(table, idx, xp=np, pack: int | None = None,
                threshold: int | None = None):
    """Gather rows `idx` from (R, K) `table`; returns (col, pack) where
    col(j) yields the gathered column j as a dense array shaped like idx.

    pack=None selects pack_factor(R, K, threshold) automatically (a STATIC
    trace-time decision — R and K are static shapes).
    """
    R, K = table.shape
    p = pack_factor(R, K, threshold) if pack is None else pack
    if p == 1:
        rows = table[idx]

        def col(j):
            return rows[..., j]

        return col, 1

    Rp = -(-R // p) * p
    if Rp != R:
        table = xp.concatenate(
            [table, xp.zeros((Rp - R, K), table.dtype)], axis=0
        )
    wide = table.reshape(Rp // p, p * K)  # free: same row-major bytes
    shift = p.bit_length() - 1
    rows = wide[idx >> shift]  # (..., p*K)
    # EXPLICIT relayout: the select chains below read p*K columns; left to
    # itself XLA reads them as strided slices of the {1,0} gather output
    # and lowers each to a slice-reduce fusion (catastrophic — PERF.md r3).
    # One transpose materializes the {0,1} copy once (the same copy XLA
    # inserts for plain-layout column consumers) and every subsequent
    # column read is dense.
    rows_t = xp.moveaxis(rows, -1, 0)  # (p*K, ...)
    sub = idx & (p - 1)

    def col(j):
        out = rows_t[(p - 1) * K + j]
        for q in range(p - 2, -1, -1):
            out = xp.where(sub == q, rows_t[q * K + j], out)
        return out

    return col, p
