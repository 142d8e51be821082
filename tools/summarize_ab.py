"""Summarize tools/bench_variant.py JSON lines from a log file.

Usage: python tools/summarize_ab.py /tmp/r4_ab.log

Groups rows by config, prints ms/frame per variant with the delta vs the
config's no-override baseline row (if present). Tolerates interleaved
non-JSON log lines.
"""

import json
import sys
from collections import defaultdict


def main(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "config" in d and "ms_per_frame" in d:
                rows.append(d)

    by_cfg = defaultdict(list)
    for d in rows:
        by_cfg[d["config"]].append(d)

    for cfg, ds in by_cfg.items():
        base = next((d for d in ds if not d.get("overrides")), None)
        print(f"\n== {cfg} ==")
        for d in ds:
            over = d.get("overrides") or {}
            label = (
                " ".join(f"{k}={v}" for k, v in over.items()) or "(baseline)"
            )
            delta = ""
            if base is not None and d is not base:
                delta = (
                    f"  ({d['ms_per_frame'] - base['ms_per_frame']:+.1f} ms"
                    f" vs baseline)"
                )
            flags = f"  OVERFLOW={d['overflow']}" if d.get("overflow") else ""
            print(
                f"  {d['ms_per_frame']:8.1f} ms  {d['fps']:6.1f} fps  "
                f"{label}{delta}{flags}"
            )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_ab.log")
