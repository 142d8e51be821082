"""Map device-trace op names (fusion.N, copy.N, ...) to SOURCE locations.

Compiles a preset's frame program (persistent-cache-friendly) and prints the
op_name/source metadata for the named ops, so per-op trace costs from
tools/profile_frame.py can be attributed to pipeline stages precisely.

Usage:
  python tools/attr_hlo.py config3 fusion.17 copy.1034 add_reduce_fusion.2
  python tools/attr_hlo.py config3 --all-over 0  # dump every op's metadata
"""

import argparse
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("ops", nargs="*", help="trace op names, e.g. fusion.17")
    ap.add_argument("--override", action="append", default=[])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses
    import functools

    from xr.app.renderer import render_step
    from xr.pipeline.geometry import clip_capacity
    from xr.pipeline.shadow import light_matrices_for_scene
    from xr.core.types import MODE_PHONG
    from xr.scene import presets
    from tools.profile_frame import _parse_override

    p = presets.ALL_PRESETS[args.preset]()
    ov = [_parse_override(o) for o in args.override]
    if ov:
        p = p._replace(config=dataclasses.replace(p.config, **dict(ov)))
    scene = jax.tree_util.tree_map(jnp.asarray, p.scene)
    cap = clip_capacity(scene.mesh.num_triangles, p.config)
    light = None
    if p.config.mode == MODE_PHONG and p.config.shadow_map_size > 0:
        light = light_matrices_for_scene(p.scene)

    def frame_at(t):
        cam, mm = p.animate(t, jnp)
        kw = {}
        if light is not None:
            kw = dict(light_view=light[0], light_proj=light[1])
        return render_step(
            scene.replace(model_matrices=mm), cam, config=p.config,
            capacity=cap, **kw,
        )

    txt = jax.jit(frame_at).lower(0.0).compile().as_text()

    # Each op definition line: %name.N = type op(...), metadata={...}
    want = set(args.ops)
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = ", line)
        if not m:
            continue
        name = m.group(1).replace("_", "-")
        raw = m.group(1)
        # trace names use dots: fusion.17; HLO uses fusion.17 too
        if raw in want or name in want:
            meta = re.search(r'metadata=\{([^}]*)\}', line)
            shape = re.search(r"= (\S+) (\w+)", line)
            print(f"--- {raw}")
            if shape:
                print(f"    {shape.group(2)} {shape.group(1)}")
            print(f"    {meta.group(1) if meta else '(no metadata)'}")


if __name__ == "__main__":
    main()
