import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import numpy as np, jax, jax.numpy as jnp
from xr.scene.presets import config4_phong, small_preset
from xr.cpu_ref import render_frame
from xr.app.renderer import Renderer

def hook(color, scene, mat_id, xp, frag=None):
    # R,G = normal.y, world_pos.y (scaled); B = 0.5
    ny = frag.normal[..., 1] * 0.5 + 0.5
    wy = frag.world[..., 1] * 0.25 + 0.5
    out = xp.stack([ny, wy, xp.full_like(ny, 0.5)], axis=-1)
    return xp.where(frag.bg[..., None], color, out)

p = small_preset(config4_phong(), 480, 270)
cam, mm = p.animate(0.0, np)
of = render_frame(p.scene.replace(model_matrices=mm), cam, p.config, shade_hook=hook)
oc = np.asarray(of.color).astype(int)

scene = jax.tree_util.tree_map(jnp.asarray, p.scene)
camj, mmj = p.animate(0.0, jnp)
for tag, cfg in [("dispatch/value-pack", p.config),
                 ("dispatch/bits-pack",
                  dataclasses.replace(p.config, record_pack="bits")),
                 ("dispatch/split-pack",
                  dataclasses.replace(p.config, record_pack="split")),
                 ("jnp/value-pack", dataclasses.replace(p.config, backend="jnp"))]:
    r = Renderer(scene, cfg, shade_hook=hook)
    df = r.readback(r.step(scene.replace(model_matrices=mmj), camj))
    dc = np.asarray(df.color).astype(int)
    cd = np.abs(oc - dc).max(axis=-1)
    ys, xs = np.nonzero(cd > 1)
    msg = f"{tag}: pixels>1LSB {int((cd>1).sum())} max {int(cd.max())}"
    if ys.size:
        k = ys.size // 2; y, x = ys[k], xs[k]
        msg += f" | pixel {y},{x} oracle {oc[y,x]} device {dc[y,x]}"
    print(msg, flush=True)
