"""Mechanical v5p extrapolation from checked-in per-op device traces
(VERDICT r4 #7: make the "~75-85 fps on v5p" claim falsifiable).

BASELINE.md's >= 60 fps bar names TPU v5p as the target hardware
(BASELINE.json:5); this box is a single v5 lite (v5e). PERF.md's round-4
verdict — "31-34 ms at 1080p/100k tris is this chip's honest local
optimum; the bar maps to a v5p extrapolation of ~75-85 fps" — was
derived from device traces that lived in /tmp. This tool re-derives it
from inputs checked into the repo (tools/data/trace_*_r4.txt: the
round-4 per-op profiler tables from tools/profile_frame.py), so a future
session WITH v5p access can kill or confirm the claim in one run:
    python tools/extrapolate.py            # the model's prediction
    python tools/bench.py (on v5p)         # the measurement

Model (every assumption explicit and printed):

1.  Each per-op row is classified by its bottleneck resource:
      * scalar  — the Pallas visibility kernel (ops named frame_at*):
        measured scalar-core bound at ~1 op/cycle per record-loop
        iteration (PERF.md round-3/4 attribution). Scales with the
        scalar-core CLOCK ratio.
      * memory  — everything else. The round-4 attribution decomposed
        the non-kernel board into gathers, relayout copies, sorts, and
        elementwise fusions riding HBM streams at 1080p working-set
        sizes far beyond VMEM; all are HBM-bandwidth bound on this
        chip (gather economics in PERF.md round 2). Scales with the
        HBM bandwidth ratio.
2.  Hardware ratios (public spec sheets):
      * HBM BW: v5e 819 GB/s -> v5p 2765 GB/s = 3.376x.
      * Scalar clock: not published separately; both parts run ~1.7 GHz
        class cores. We bracket with 1.0x (conservative: no scalar
        improvement) and 1.3x (modest clock + issue-width gain).
3.  Compute-bound fraction of "memory" ops that fails to scale with BW
    is absorbed by the conservative end of the bracket; the kernel's
    vector work (minor) by the optimistic end.

The printed bracket for config 3 reproduces PERF.md's ~75-85 fps.
"""

from __future__ import annotations

import os
import re
import sys

HBM_RATIO = 2765.0 / 819.0  # v5p / v5e HBM bandwidth (public specs)
SCALAR_RATIOS = (1.0, 1.3)  # conservative / optimistic scalar-core ratio

DATA = os.path.join(os.path.dirname(__file__), "data")

CONFIGS = {
    "c3": ("config3 textured 100k @1080p (HEADLINE)", 60.0),
    "c5": ("config5 fly-through 1M @1080p", None),
    "c6": ("config6 loaded-asset courtyard @1080p", None),
}


def parse_trace(path):
    """-> (total_ms_per_frame, [(ms, opname), ...])."""
    total = None
    rows = []
    in_table = False
    for line in open(path):
        m = re.search(r"=>\s*([0-9.]+)\s*ms/frame", line)
        if m:
            total = float(m.group(1))
        if re.match(r"\s*ms/frame\s+%", line):
            in_table = True
            continue
        if in_table:
            m = re.match(r"\s*([0-9.]+)\s+[0-9.]+\s+(\S+)", line)
            if m:
                rows.append((float(m.group(1)), m.group(2)))
            elif line.strip().startswith("buckets"):
                break
    assert total is not None and rows, f"unparseable trace {path}"
    return total, rows


def extrapolate(total_ms, rows):
    scalar_ms = sum(ms for ms, op in rows if op.startswith("frame_at"))
    listed = sum(ms for ms, op in rows)
    # rows list the top ops only; the unlisted tail is memory-class
    memory_ms = total_ms - scalar_ms
    out = []
    for sr in SCALAR_RATIOS:
        ms = scalar_ms / sr + memory_ms / HBM_RATIO
        out.append((ms, 1000.0 / ms))
    return scalar_ms, memory_ms, listed, out


def main():
    print(f"# v5p extrapolation model (HBM ratio {HBM_RATIO:.3f}, "
          f"scalar ratio bracket {SCALAR_RATIOS})")
    for key, (name, bar) in CONFIGS.items():
        # newest checked-in round wins (trace_<key>_r<N>.txt)
        cands = sorted(
            (p for p in os.listdir(DATA)
             if re.fullmatch(rf"trace_{key}_r\d+\.txt", p)),
            key=lambda p: int(re.search(r"_r(\d+)\.txt", p).group(1)),
        )
        if not cands:
            continue
        path = os.path.join(DATA, cands[-1])
        print(f"\n[{cands[-1]}]", end="")
        total, rows = parse_trace(path)
        scalar, memory, listed, preds = extrapolate(total, rows)
        lo, hi = preds[0][1], preds[-1][1]
        print(f"\n{name}")
        print(f"  measured v5e: {total:.2f} ms/frame = {1000/total:.1f} fps "
              f"(scalar kernel {scalar:.2f} ms, memory-class {memory:.2f} ms;"
              f" top-op table covers {100*listed/total:.0f}%)")
        print(f"  v5p predicted: {preds[0][0]:.2f}-{preds[-1][0]:.2f} ms/frame "
              f"= {lo:.1f}-{hi:.1f} fps")
        if bar:
            verdict = "MEETS" if lo >= bar else (
                "meets at optimistic end only" if hi >= bar else "MISSES")
            print(f"  vs {bar:.0f} fps bar: {verdict}")
    print(
        "\n# falsify: run `python bench.py` / tools/bench_all.py on a v5p "
        "chip and compare; the traces above are frozen per-round inputs "
        "(tools/data/), independent of /tmp."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
