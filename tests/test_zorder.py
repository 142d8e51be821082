"""Front-to-back bin ordering (RenderConfig.bin_zorder; VERDICT r4 #1).

The axis reorders per-tile bin segments by quantized z_min so the stream
kernel's z early-out rejects occluded records early. Candidate sets are
unchanged and the (z, id) resolve is order-independent, so every backend
must stay bit-identical with the axis on.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from xr.app.renderer import Renderer
from xr.core import math3d as m3
from xr.scene.presets import config3_terrain, config4_blend, small_preset


def _frames(preset, cfg):
    scene = jax.tree_util.tree_map(jnp.asarray, preset.scene)
    cam, mm = preset.animate(0.0, jnp)
    s = scene.replace(model_matrices=mm)
    r = Renderer(scene, cfg)
    return r.readback(r.step(s, cam))


def test_zorder_bitexact_all_backends():
    p = small_preset(config3_terrain(), 480, 270, bin_capacity=49152)
    base = _frames(p, dataclasses.replace(p.config, backend="jnp"))
    for cfg in (
        dataclasses.replace(
            p.config, backend="jnp", bin_zorder=True, z_earlyout=True
        ),
        dataclasses.replace(
            p.config, backend="pallas_stream", pallas_interpret=True,
            bin_zorder=True, z_earlyout=True,
        ),
        dataclasses.replace(
            p.config, backend="jnp", bin_zorder=True, bin_pairs=2,
        ),
    ):
        f = _frames(p, cfg)
        assert (f.color == base.color).all(), cfg.backend
        assert (f.depth == base.depth).all(), cfg.backend


def test_zorder_blend_and_painter():
    """bin_zorder composes with blend (opaque passes only) and with
    depth_test=False (painter's order keys on id VALUES, so bin order is
    immaterial there too)."""
    p = small_preset(
        config4_blend(), 160, 100, bin_capacity=8192, shadow_map_size=128
    )
    base = _frames(p, p.config)
    f = _frames(
        p, dataclasses.replace(p.config, bin_zorder=True, z_earlyout=True)
    )
    assert (f.color == base.color).all()
    assert (f.depth == base.depth).all()

    nodepth = dataclasses.replace(
        p.config, depth_test=False, blend=False, shadow_map_size=0
    )
    b2 = _frames(p, nodepth)
    f2 = _frames(p, dataclasses.replace(nodepth, bin_zorder=True))
    assert (f2.color == b2.color).all()


def test_zorder_segments_front_to_back():
    """The property the axis exists for: within each tile's segment, the
    quantized z_min keys are ascending."""
    from xr.pipeline.geometry import geometry
    from xr.raster.jnp_backend import bin_triangles, grid_dims

    p = small_preset(config3_terrain(), 480, 270, bin_capacity=49152)
    cfg = dataclasses.replace(p.config, bin_zorder=True)
    scene = jax.tree_util.tree_map(jnp.asarray, p.scene)
    cam, mm = p.animate(0.0, jnp)
    s = scene.replace(model_matrices=mm)
    view, proj = m3.camera_matrices(cam, cfg.width / cfg.height, jnp)
    tri = geometry(s, view, proj, cfg, xp=jnp)
    b = bin_triangles(tri, cfg)

    sid = np.asarray(b.sid)
    starts = np.asarray(b.starts)
    counts = np.asarray(b.raw_counts)
    zmin = np.asarray(tri.z).min(axis=1)
    nty, ntx = grid_dims(cfg)
    zbits = min(16, 30 - int(nty * ntx).bit_length())
    scale = float(2**zbits - 1)
    checked = 0
    for t in range(nty * ntx):
        seg = sid[starts[t] : starts[t] + counts[t]]
        if seg.size < 2:
            continue
        zq = np.clip(zmin[seg] * scale, 0.0, scale).astype(np.int64)
        assert (np.diff(zq) >= 0).all(), f"tile {t} not front-to-back"
        checked += 1
    assert checked > 20, "scene too sparse to exercise the ordering"
