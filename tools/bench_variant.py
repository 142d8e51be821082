"""Bench ONE preset with config overrides — the device A/B harness.

Usage:
  python tools/bench_variant.py --preset config5 --frames 10 \
      --set record_split=2 lod_fetch=recompute

Prints one JSON line (same fields as tools/bench_all.py rows, plus the
overrides). Overrides are parsed as key=value with int/float/str/bool
coercion against the RenderConfig field types.
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

from xr.app.platform import apply_platform_env  # noqa: E402

apply_platform_env()  # honor JAX_PLATFORMS=cpu despite sitecustomize


def parse_overrides(pairs, config_cls):
    fields = {f.name: f.type for f in dataclasses.fields(config_cls)}
    out = {}
    for p in pairs:
        k, v = p.split("=", 1)
        assert k in fields, f"unknown RenderConfig field {k!r}"
        t = fields[k]
        if t == "bool" or t is bool:
            out[k] = v.lower() in ("1", "true", "yes", "on")
        elif t == "int" or t is int:
            out[k] = int(v)
        elif t == "float" or t is float:
            out[k] = float(v)
        else:
            out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--set", nargs="*", default=[], dest="overrides")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xr.app.renderer import render_step
    from xr.core.types import MODE_PHONG, RenderConfig
    from xr.pipeline.geometry import clip_capacity
    from xr.pipeline.shadow import light_matrices_for_scene
    from xr.scene.presets import ALL_PRESETS

    preset = ALL_PRESETS[args.preset]()
    over = parse_overrides(args.overrides, RenderConfig)
    cfg = dataclasses.replace(preset.config, num_shards=1, **over)
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
    for i in range(args.frames):
        f = frame(0.05 * (i + 1))
    jax.block_until_ready(f.color)
    dt = (time.perf_counter() - t0) / args.frames
    last = {k: int(np.asarray(v)) for k, v in f.stats.items()}

    print(
        json.dumps(
            {
                "config": args.preset,
                "overrides": over,
                "fps": round(1.0 / dt, 2),
                "ms_per_frame": round(dt * 1e3, 2),
                "overflow": stats["clip_overflow"]
                + stats["bin_overflow"]
                + last["clip_overflow"]
                + last["bin_overflow"],
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
