"""Tracing/profiling hooks (SURVEY.md §5.1).

The reference brackets passes with GPU timestamp queries / PIX markers; here
the analogs are jax.profiler traces (XLA/TPU timeline) and wall-clock pass
bracketing via block_until_ready. Zero overhead when disabled.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


class FrameTimer:
    """Wall-clock pass timings + fps/Mpix counters for the example runner.

    Usage:
        timer = FrameTimer()
        with timer.section("frame"):
            frame = renderer.step(...)
            jax.block_until_ready(frame.color)
        print(timer.report(pixels_per_frame=W*H))
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def mean_ms(self, name: str) -> float:
        if self.counts.get(name, 0) == 0:
            return 0.0
        return self.totals[name] / self.counts[name] * 1e3

    def report(self, pixels_per_frame: Optional[int] = None) -> str:
        out = {k: round(self.mean_ms(k), 3) for k in self.totals}
        if pixels_per_frame and self.counts.get("frame"):
            dt = self.totals["frame"] / self.counts["frame"]
            out["fps"] = round(1.0 / dt, 2)
            out["mpixels_shaded_per_s"] = round(pixels_per_frame / dt / 1e6, 1)
        return json.dumps(out)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA/TPU profiler trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
