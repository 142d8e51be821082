"""Example frame-loop runner: the reference's app main loop (pump -> update
-> render -> present, SURVEY.md §3.2) as a headless script. Present() is a
device-to-host readback + PNG dump (BASELINE.json:5).

Usage:
  python examples/run.py config1 --frames 30 --out /tmp/xr_out
  python examples/run.py config3 --frames 60 --profile
  python examples/run.py config5 --shards 4        # needs >=4 devices
  python examples/run.py config2 --oracle          # render via CPU oracle
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--out", default="")
    ap.add_argument("--dump-every", type=int, default=0, help="PNG every N frames")
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--shards", type=int, default=0)
    ap.add_argument("--oracle", action="store_true", help="use the CPU reference")
    ap.add_argument("--profile", action="store_true", help="jax profiler trace")
    ap.add_argument("--dt", type=float, default=1.0 / 30.0)
    # fly-through resume + scene serialization (SURVEY.md §5.4): resume a
    # run at frame k for debugging; snapshot/replace the preset's scene
    ap.add_argument("--start-frame", type=int, default=0,
                    help="resume the animation at frame k (t = k * dt)")
    ap.add_argument("--save-scene", default="",
                    help="serialize the scene to this .npz and continue")
    ap.add_argument("--scene", default="",
                    help="render a previously saved .npz scene instead of "
                    "the preset's")
    ap.add_argument("--autosize", action="store_true",
                    help="size capacity knobs from a measured dry pass "
                    "over this run's camera path (xr/app/autosize.py)")
    args = ap.parse_args()

    from xr.scene.presets import ALL_PRESETS
    from xr.core.image import write_png

    p = ALL_PRESETS[args.preset]()
    if args.scene:
        from xr.core.serialize import load_scene

        p = p._replace(scene=load_scene(args.scene))
    if args.save_scene:
        from xr.core.serialize import save_scene

        save_scene(args.save_scene, p.scene)
        print(json.dumps({"event": "scene_saved", "path": args.save_scene}))
    cfg = p.config
    if args.width and args.height:
        cfg = dataclasses.replace(cfg, width=args.width, height=args.height)
    if args.shards:
        cfg = dataclasses.replace(cfg, num_shards=args.shards)
    if args.autosize:
        # measured capacity knobs from samples of THIS run's camera path
        # (xr/app/autosize.py) — zero hand tuning for new scenes/paths
        from xr.app.autosize import autosize_config

        ts = [args.start_frame * args.dt + k * args.dt * args.frames / 4.0
              for k in range(5)]
        cams = [p.animate(t, np)[0] for t in ts]
        cfg = autosize_config(p.scene, cams, cfg)
        print(json.dumps({
            "event": "autosized",
            "bin_capacity": cfg.bin_capacity,
            "clip_budget": cfg.clip_budget,
            "clip_expand": round(cfg.clip_expand, 4),
            "stream_entry_cap": cfg.stream_entry_cap,
            "large_capacity": cfg.large_capacity,
        }))

    if args.out:
        os.makedirs(args.out, exist_ok=True)

    if args.oracle:
        from xr.cpu_ref import render_frame

        def make_step():
            def step(t):
                cam, mm = p.animate(t, np)
                return render_frame(p.scene.replace(model_matrices=mm), cam, cfg)

            return step, lambda f: f

        step, readback = make_step()
        r = None
    else:
        import jax
        import jax.numpy as jnp

        from xr.app.platform import apply_platform_env

        apply_platform_env()

        scene = jax.tree_util.tree_map(jnp.asarray, p.scene)
        if cfg.num_shards > 1:
            from xr.dist.shard import ShardedRenderer

            r = ShardedRenderer(scene, cfg)
        else:
            from xr.app.renderer import Renderer

            r = Renderer(scene, cfg)

        # animation traced INSIDE one jitted frame program: per-frame host
        # work is a single dispatch of a scalar t (SURVEY.md §3.2)
        @jax.jit
        def step(t):
            cam, mm = p.animate(t, jnp)
            return r.step(scene.replace(model_matrices=mm), cam)

        def readback(f):
            jax.block_until_ready(f.color)
            from xr.core.types import Frame

            return Frame(
                color=np.asarray(f.color),
                depth=np.asarray(f.depth),
                stats={k: int(np.asarray(v)) for k, v in f.stats.items()},
            )

    # warmup/compile frame
    t_compile = time.perf_counter()
    f = readback(step(args.dt * args.start_frame))
    print(
        json.dumps(
            {
                "event": "first_frame",
                "compile_s": round(time.perf_counter() - t_compile, 2),
                "stats": {k: int(v) for k, v in f.stats.items()},
            }
        )
    )

    prof_ctx = None
    if args.profile:
        import jax

        prof_dir = args.out or "/tmp/xr_profile"
        jax.profiler.start_trace(prof_dir)
        prof_ctx = prof_dir

    # Frame loop with DOUBLE-BUFFERED presentation via the Renderer API
    # (SURVEY.md §2.1 "Allocators"/"Command recording & sync"):
    # present(frame i) starts its async device->host copy and returns frame
    # i-1's completed host copy — its PNG encodes while the device renders
    # frame i+1. One frame in flight, host IO overlapped with device work.
    def dump(i, f):
        write_png(
            os.path.join(args.out, f"{args.preset}_{i:04d}.png"),
            np.asarray(f.color),
        )

    presenter = getattr(r, "present", None)

    t0 = time.perf_counter()
    last = None
    pending_i = None  # index of the frame whose host copy is in flight
    for i in range(args.frames):
        t = args.dt * (args.start_frame + i)
        frame = step(t)
        if args.dump_every and i % args.dump_every == 0 and presenter:
            done = presenter(frame)
            if done is not None:
                dump(pending_i, done)
            pending_i = i
        elif args.dump_every and i % args.dump_every == 0:
            dump(i, readback(frame))  # oracle path: synchronous
        last = frame
    if presenter and pending_i is not None:
        dump(pending_i, r.flush())
    fr = readback(last)
    dt = (time.perf_counter() - t0) / max(args.frames, 1)

    if prof_ctx:
        import jax

        jax.profiler.stop_trace()
        print(json.dumps({"event": "profile", "dir": prof_ctx}))

    if args.out:
        write_png(os.path.join(args.out, f"{args.preset}_final.png"), fr.color)

    print(
        json.dumps(
            {
                "event": "done",
                "preset": args.preset,
                "frames": args.frames,
                "ms_per_frame": round(dt * 1e3, 2),
                "fps": round(1.0 / dt, 2),
                # measured from the device-side counter (shadow-pass texels
                # included), not re-derived from the resolution
                "mpixels_shaded_per_s": round(
                    int(fr.stats["fragments_shaded"]) / dt / 1e6, 1
                ),
                "stats": {k: int(v) for k, v in fr.stats.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
