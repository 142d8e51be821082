"""Per-op device profile of one preset's frame program (SURVEY.md §5.1).

Captures a JAX profiler trace with the perfetto JSON exporter and aggregates
device-op durations by fusion/op name — no tensorboard needed. Prints the
top-K ops and a stage-bucketed summary. This is how PERF.md's trace
breakdowns are produced.

Usage:
  python tools/profile_frame.py config3 [--frames 8] [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_override(kv: str):
    k, v = kv.split("=", 1)
    for conv in (int, float):
        try:
            return k, conv(v)
        except ValueError:
            pass
    if v in ("True", "False"):
        return k, v == "True"
    return k, v


def capture(preset_name: str, frames: int, outdir: str, overrides=()):
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xr.app.renderer import render_step
    from xr.pipeline.geometry import clip_capacity
    from xr.pipeline.shadow import light_matrices_for_scene
    from xr.core.types import MODE_PHONG
    from xr.scene import presets

    p = presets.ALL_PRESETS[preset_name]()
    if overrides:
        p = p._replace(
            config=dataclasses.replace(p.config, **dict(overrides))
        )
    scene = jax.tree_util.tree_map(jnp.asarray, p.scene)
    cap = clip_capacity(scene.mesh.num_triangles, p.config)

    light = None
    if p.config.mode == MODE_PHONG and p.config.shadow_map_size > 0:
        light = light_matrices_for_scene(p.scene)

    @jax.jit
    def frame_at(t):
        cam, mm = p.animate(t, jnp)
        kw = {}
        if light is not None:
            kw = dict(light_view=light[0], light_proj=light[1])
        return render_step(
            scene.replace(model_matrices=mm), cam, config=p.config,
            capacity=cap, **kw,
        )

    f = frame_at(0.0)
    jax.block_until_ready(f.color)

    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        last = None
        for i in range(frames):
            last = frame_at(0.05 * (i + 1))
        jax.block_until_ready(last.color)


STAGE_BUCKETS = [
    ("visibility_kernel", ("_vis_kernel", "pallas")),
    ("sort", ("sort",)),
    ("gather", ("gather",)),
    ("scatter", ("scatter",)),
    ("fusion", ("fusion", "loop_")),
    ("copy", ("copy", "transpose", "bitcast")),
    ("conv/dot", ("dot", "conv")),
]


def parse(outdir: str, frames: int, top: int):
    paths = glob.glob(os.path.join(outdir, "**", "*.json.gz"), recursive=True)
    if not paths:
        print("no perfetto trace found under", outdir)
        sys.exit(1)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)

    events = tr["traceEvents"] if isinstance(tr, dict) else tr
    # device ops live on TensorCore track(s); collect complete events (ph=X)
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower()
    }

    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "").lower()
        # keep only the leaf op track: Steps/Modules tracks duplicate it
        if "step" in tname or "module" in tname:
            continue
        name = e["name"]
        if name.startswith("jit_") or "(" in name:  # umbrella module span
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        per_op[name] += dur
        total += dur

    print(f"\ntrace: {path}")
    print(f"device total: {total:.2f} ms over {frames} frames "
          f"=> {total/frames:.2f} ms/frame\n")
    print(f"{'ms/frame':>9}  {'%':>5}  op")
    for name, ms in per_op.most_common(top):
        print(f"{ms/frames:9.3f}  {100*ms/total:5.1f}  {name[:110]}")

    buckets = collections.Counter()
    for name, ms in per_op.items():
        lo = name.lower()
        for bname, keys in STAGE_BUCKETS:
            if any(k in lo for k in keys):
                buckets[bname] += ms
                break
        else:
            buckets["other"] += ms
    print("\nbuckets (ms/frame):")
    for bname, ms in buckets.most_common():
        print(f"  {bname:20s} {ms/frames:8.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="/tmp/xr_prof")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument(
        "--override", action="append", default=[],
        help="RenderConfig override key=value (repeatable), e.g. "
        "--override deferred_fetch=fields",
    )
    args = ap.parse_args()

    if not args.parse_only:
        capture(args.preset, args.frames, args.out,
                overrides=[_parse_override(o) for o in args.override])
    parse(args.out, args.frames, args.top)


if __name__ == "__main__":
    main()
