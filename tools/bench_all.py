"""Bench every capability config (BASELINE.json:7-11) on the local device.

Prints one JSON line per config (fps, Mpix/s, stats). bench.py remains the
single-line headline benchmark the driver consumes; this is the full table
for PERF.md.

Usage: python tools/bench_all.py [--frames 20]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")

import numpy as np  # noqa: E402


def bench_preset(name, preset, frames):
    import jax
    import jax.numpy as jnp

    from xr.app.renderer import render_step
    from xr.pipeline.geometry import clip_capacity
    from xr.pipeline.shadow import light_matrices_for_scene
    from xr.core.types import MODE_PHONG

    cfg = dataclasses.replace(preset.config, num_shards=1)
    scene = jax.tree_util.tree_map(jnp.asarray, preset.scene)
    cap = clip_capacity(scene.mesh.num_triangles, cfg)
    kw = {}
    if cfg.mode == MODE_PHONG and cfg.shadow_map_size:
        lv, lp = light_matrices_for_scene(preset.scene)
        kw = dict(light_view=jnp.asarray(lv), light_proj=jnp.asarray(lp))
    @jax.jit
    def frame(t):
        cam, mm = preset.animate(t, jnp)
        return render_step(
            scene.replace(model_matrices=mm), cam, config=cfg, capacity=cap,
            **kw,
        )

    t0 = time.perf_counter()
    f = frame(0.0)
    jax.block_until_ready(f.color)
    compile_s = time.perf_counter() - t0
    stats = {k: int(np.asarray(v)) for k, v in f.stats.items()}

    t0 = time.perf_counter()
    for i in range(frames):
        f = frame(0.05 * (i + 1))
    jax.block_until_ready(f.color)
    dt = (time.perf_counter() - t0) / frames
    last = {k: int(np.asarray(v)) for k, v in f.stats.items()}

    print(
        json.dumps(
            {
                "config": name,
                "fps": round(1.0 / dt, 2),
                "ms_per_frame": round(dt * 1e3, 2),
                "mpixels_shaded_per_s": round(
                    last["fragments_shaded"] / dt / 1e6, 1
                ),
                "covered_pixels": last.get("covered_pixels", -1),
                "resolution": f"{cfg.width}x{cfg.height}",
                "tris_in": stats["tris_in"],
                "tris_setup": stats["tris_setup"],
                "overflow": stats["clip_overflow"]
                + stats["bin_overflow"]
                + last["clip_overflow"]
                + last["bin_overflow"],
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--only", default="", help="comma-separated config names")
    args = ap.parse_args()

    from xr.scene.presets import ALL_PRESETS

    only = set(args.only.split(",")) if args.only else None
    for name, factory in ALL_PRESETS.items():
        if only and name not in only:
            continue
        bench_preset(name, factory(), args.frames)


if __name__ == "__main__":
    main()
