"""tools/extrapolate.py must reproduce the PERF.md v5p bracket from the
checked-in round-4 traces (VERDICT r4 #7: the claim is falsifiable only
if the derivation is mechanical and its inputs are in the repo)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_reproduces_perf_md_bracket():
    import extrapolate as ex

    total, rows = ex.parse_trace(
        os.path.join(ex.DATA, "trace_c3_r4.txt")
    )
    assert abs(total - 31.71) < 0.01
    _, _, _, preds = ex.extrapolate(total, rows)
    lo, hi = preds[0][1], preds[-1][1]
    # PERF.md round 4: "~75-85 fps" — the mechanical model must land there
    assert 73.0 <= lo <= 80.0, lo
    assert 80.0 <= hi <= 88.0, hi
