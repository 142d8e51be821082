"""Shader hot-reload (the reference's HLSL file-watch -> PSO rebuild,
SURVEY.md §3.4). Watches a Python "shader" file defining `shade(...)`,
re-imports it on change, re-jits the frame program through the renderer's
first-class `shade_hook` stage (the PSO rebuild), and re-renders a preview
PNG. Compile errors keep the previous shader, exactly like the reference's
behavior.

Works on ANY preset and shading mode — the hook is the custom pixel-shader
stage of `render_step` (xr/app/renderer.py), applied to the pre-background
linear color with per-pixel material ids where the mode has them.

Usage:
  python examples/watch.py --preset config3 --shader my_shader.py \\
      --out /tmp/preview.png

The shader file must define:
  def shade(color, scene, mat_id, xp):  # -> (N, 3) f32 linear color
with color (N, 3) the pipeline's shaded output, mat_id (N,) int32 per-pixel
material indices (None in flat/Gouraud modes), and xp = jax.numpy.
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

STARTER = '''def shade(color, scene, mat_id, xp):
    """Edit me and save — the frame re-renders automatically.

    color: (N, 3) f32 linear pipeline output; scene: the Scene pytree;
    mat_id: (N,) i32 per-pixel material index or None; xp: jax.numpy.
    """
    # Try e.g.:
    #   return color[..., ::-1]                      # swap channels
    #   return color ** 2.2                          # crush gamma
    #   g = color.mean(-1, keepdims=True); return g  # grayscale
    return color
'''


def load_shader(path):
    spec = importlib.util.spec_from_file_location("user_shader", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.shade


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="config2")
    ap.add_argument("--shader", default="/tmp/xr_shader.py")
    ap.add_argument("--out", default="/tmp/xr_preview.png")
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--t", type=float, default=0.4, help="animation time")
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

    from xr.app.renderer import Renderer
    from xr.core.image import write_png
    from xr.scene.presets import ALL_PRESETS, small_preset

    p = small_preset(
        ALL_PRESETS[args.preset](), args.width, args.height, bin_capacity=8192
    )
    scene = jax.tree_util.tree_map(jnp.asarray, p.scene)
    cam, mm = p.animate(args.t, jnp)
    scene = scene.replace(model_matrices=mm)

    def render_with(user_shade):
        # a fresh Renderer re-jits the frame program with the new hook
        # traced in — the reference's "rebuild dependent PSOs" step
        r = Renderer(scene, p.config, shade_hook=user_shade)
        frame = r.readback(r.step(scene, cam))
        return frame.color

    mtime = 0.0
    while True:
        m = os.path.getmtime(args.shader)
        if m != mtime:
            mtime = m
            try:
                shade_fn = load_shader(args.shader)
                t0 = time.time()
                col = render_with(shade_fn)
                write_png(args.out, np.asarray(col))
                print(
                    f"[{time.strftime('%H:%M:%S')}] reloaded {args.shader} "
                    f"({args.preset}) -> {args.out} ({time.time()-t0:.1f}s)"
                )
            except Exception:
                print("shader error — keeping previous pipeline:")
                traceback.print_exc(limit=3)
        if args.once:
            break
        time.sleep(args.poll)


if __name__ == "__main__":
    main()
