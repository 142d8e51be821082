"""Shader hot-reload demo (the reference's HLSL file-watch -> PSO rebuild,
SURVEY.md §3.4). Watches a Python "shader" file defining `shade(...)`,
re-imports it on change, re-jits the frame program (the PSO rebuild), and
re-renders a preview PNG. Compile errors keep the previous shader, exactly
like the reference's behavior.

Usage:
  python examples/watch.py --shader my_shader.py --out /tmp/preview.png

The shader file must define:
  def shade(attrs, mats, mat_id, lights):  # -> (N, 3) f32 color
with attrs being the Gouraud-interpolated per-pixel rgb (N, 3).
A starter file is written if --shader doesn't exist.
"""

import argparse
import importlib.util
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")

STARTER = '''import jax.numpy as jnp


def shade(rgb, mats, mat_id, lights):
    """Edit me and save — the frame re-renders automatically."""
    # e.g. try: return rgb[..., ::-1]   (swap channels)
    return rgb
'''


def load_shader(path):
    spec = importlib.util.spec_from_file_location("user_shader", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.shade


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shader", default="/tmp/xr_shader.py")
    ap.add_argument("--out", default="/tmp/xr_preview.png")
    ap.add_argument("--poll", type=float, default=0.5)
    ap.add_argument("--once", action="store_true", help="render once and exit")
    args = ap.parse_args()

    if not os.path.exists(args.shader):
        with open(args.shader, "w") as f:
            f.write(STARTER)
        print(f"wrote starter shader to {args.shader}")

    import jax
    import jax.numpy as jnp

    from xr.app.platform import apply_platform_env

    apply_platform_env()

    from xr.scene.presets import config2_icospheres, small_preset
    from xr.app.renderer import render_step
    from xr.pipeline.geometry import clip_capacity
    from xr.core.image import write_png
    import xr.shading.deferred as deferred

    p = small_preset(config2_icospheres(), 480, 270, bin_capacity=8192)
    scene = jax.tree_util.tree_map(jnp.asarray, p.scene)
    cam, mm = p.animate(0.4, jnp)
    scene = scene.replace(model_matrices=mm)
    cap = clip_capacity(scene.mesh.num_triangles, p.config)

    def render_with(user_shade):
        # monkey-patch the gouraud output through the user shader; a fresh
        # jit trace picks it up (the "PSO rebuild")
        orig = deferred._with_bg

        def patched(color, bg, config, xp):
            if color.shape[-1] == 3 and xp is jnp:
                color = user_shade(
                    color, scene.materials, None, scene.lights
                )
            return orig(color, bg, config, xp)

        deferred._with_bg = patched
        try:
            step = jax.jit(
                lambda s, c: render_step(s, c, config=p.config, capacity=cap)
            )
            frame = step(scene, cam)
            col = np.asarray(frame.color)
        finally:
            deferred._with_bg = orig
        return col

    mtime = 0.0
    shade_fn = None
    while True:
        m = os.path.getmtime(args.shader)
        if m != mtime:
            mtime = m
            try:
                shade_fn = load_shader(args.shader)
                t0 = time.time()
                col = render_with(shade_fn)
                write_png(args.out, col)
                print(
                    f"[{time.strftime('%H:%M:%S')}] reloaded {args.shader} "
                    f"-> {args.out} ({time.time()-t0:.1f}s)"
                )
            except Exception:
                print("shader error — keeping previous pipeline:")
                traceback.print_exc(limit=3)
        if args.once:
            break
        time.sleep(args.poll)


if __name__ == "__main__":
    main()
