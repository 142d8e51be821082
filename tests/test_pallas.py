"""Pallas visibility kernel parity: must match the jnp path bit-for-bit.

Interpret-mode runs in the default CPU suite (the "sanitizer build"); the
compiled kernel runs under XR_TEST_PLATFORM=tpu on real hardware
(SURVEY.md §4.2).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from xr.core import math3d as m3
from xr.pipeline.geometry import geometry
from xr.raster import jnp_backend as jb
from xr.scene.presets import config1_cube, config2_icospheres, small_preset


def _tri_and_cfg(preset, t=0.2, **over):
    kw = dict(tile_h=16, tile_w=128, bin_capacity=8192)
    kw.update(over)
    p = small_preset(preset, 96, 64, **kw)
    cam, mm = p.animate(t, np)
    scene = p.scene.replace(model_matrices=mm)
    view, proj = m3.camera_matrices(cam, p.config.width / p.config.height, np)
    tri = geometry(scene, jnp.asarray(view), jnp.asarray(proj), p.config, xp=jnp)
    return tri, p.config


@pytest.mark.parametrize("preset_fn", [config1_cube, config2_icospheres])
def test_pallas_smem_interpret_matches_jnp(preset_fn):
    from xr.raster import pallas_smem as psm

    tri, cfg = _tri_and_cfg(preset_fn())
    t_j, z_j, of_j = jb.visibility_binned(tri, cfg)
    t_p, z_p, of_p = psm.visibility_binned(tri, cfg, interpret=True)
    assert int(of_j) == int(of_p) == 0
    assert (np.asarray(t_j) == np.asarray(t_p)).all()
    assert (np.asarray(z_j) == np.asarray(z_p)).all()


@pytest.mark.tpu
def test_pallas_smem_tpu_matches_jnp():
    from xr.raster import dispatch
    from xr.raster import pallas_smem as psm

    # 16-field plane-form records cap the SMEM variant's per-tile capacity
    # (~1 MB SMEM on v5e); use a capacity inside the budget, exactly as
    # the dispatch guard enforces for renders
    tri, cfg = _tri_and_cfg(config2_icospheres(), bin_capacity=3072)
    assert dispatch._smem_bytes(cfg) <= 900_000
    t_j, z_j, _ = jb.visibility_binned(tri, cfg)
    t_p, z_p, _ = psm.visibility_binned(tri, cfg)
    assert (np.asarray(t_j) == np.asarray(t_p)).all()
    assert (np.asarray(z_j) == np.asarray(z_p)).all()


@pytest.mark.parametrize("preset_fn", [config1_cube, config2_icospheres])
def test_pallas_stream_interpret_matches_jnp(preset_fn):
    from xr.raster import pallas_stream as pst

    tri, cfg = _tri_and_cfg(preset_fn())
    t_j, z_j, of_j = jb.visibility_binned(tri, cfg)
    t_p, z_p, of_p = pst.visibility_binned(tri, cfg, interpret=True)
    assert int(of_j) == int(of_p) == 0
    assert (np.asarray(t_j) == np.asarray(t_p)).all()
    assert (np.asarray(z_j) == np.asarray(z_p)).all()


def test_pallas_stream_interpret_y_offset():
    from xr.raster import pallas_stream as pst

    tri, cfg = _tri_and_cfg(config2_icospheres())
    band = dataclasses.replace(cfg, height=32)
    t_f, z_f, _ = jb.visibility_binned(tri, cfg)
    t_b, z_b, _ = pst.visibility_binned(tri, band, y_offset=32, interpret=True)
    assert (np.asarray(t_b) == np.asarray(t_f)[32:64]).all()
    assert (np.asarray(z_b) == np.asarray(z_f)[32:64]).all()


@pytest.mark.tpu
def test_pallas_stream_tpu_matches_jnp():
    from xr.raster import pallas_stream as pst

    tri, cfg = _tri_and_cfg(config2_icospheres())
    t_j, z_j, _ = jb.visibility_binned(tri, cfg)
    t_p, z_p, _ = pst.visibility_binned(tri, cfg)
    assert (np.asarray(t_j) == np.asarray(t_p)).all()
    assert (np.asarray(z_j) == np.asarray(z_p)).all()


def test_pallas_stream_overflow_degrades_to_background():
    """Stream-capacity overflow must drop triangles LOUDLY and leave
    never-started tiles as clean background — never uninitialized memory."""
    from xr.raster import pallas_stream as pst

    tri, cfg = _tri_and_cfg(config2_icospheres())
    tiny = dataclasses.replace(cfg, stream_expand=0.001)
    t_p, z_p, dropped = pst.visibility_binned(tri, tiny, interpret=True)
    assert int(dropped) > 0, "expected loud overflow"
    t_np = np.asarray(t_p)
    z_np = np.asarray(z_p)
    valid = (t_np == np.int32(2**31 - 1)) | (
        (t_np >= 0) & (t_np < tri.capacity)
    )
    assert valid.all(), "garbage triangle ids leaked from unstarted tiles"
    assert (np.isinf(z_np) | ((z_np >= 0) & (z_np <= 1.0))).all()


@pytest.mark.parametrize("backend", ["stream", "smem"])
def test_pallas_painters_order_interpret(backend):
    """depth_test=False (painter's order) stays on the Pallas path
    (VERDICT r1 #6): highest-id covered triangle wins, bit-equal to jnp."""
    from xr.raster import pallas_smem as psm
    from xr.raster import pallas_stream as pst

    tri, cfg = _tri_and_cfg(config2_icospheres())
    cfg = dataclasses.replace(cfg, depth_test=False)
    t_j, z_j, of_j = jb.visibility_binned(tri, cfg)
    mod = pst if backend == "stream" else psm
    t_p, z_p, of_p = mod.visibility_binned(tri, cfg, interpret=True)
    assert int(of_j) == int(of_p) == 0
    assert (np.asarray(t_j) == np.asarray(t_p)).all()
    cov = np.asarray(t_j) != jb.BG
    assert (np.asarray(z_j)[cov] == np.asarray(z_p)[cov]).all()


@pytest.mark.tpu
def test_pallas_painters_order_tpu():
    from xr.raster import pallas_stream as pst

    tri, cfg = _tri_and_cfg(config2_icospheres())
    cfg = dataclasses.replace(cfg, depth_test=False)
    t_j, z_j, _ = jb.visibility_binned(tri, cfg)
    t_p, z_p, _ = pst.visibility_binned(tri, cfg)
    assert (np.asarray(t_j) == np.asarray(t_p)).all()


@pytest.mark.parametrize("preset_fn", [config1_cube, config2_icospheres])
@pytest.mark.parametrize(
    "gates",
    [{}, {"z_chunk_gate": True}, {"z_band_gate": True},
     {"z_chunk_gate": True, "z_band_gate": True}],
    ids=["plain", "chunk", "band", "chunk+band"],
)
def test_pallas_stream_z_earlyout_interpret(preset_fn, gates):
    """The z-min occlusion early-out — and its optional chunk/band gate
    refinements — must never change results (they only skip records that
    provably cannot win)."""
    from xr.raster import pallas_stream as pst

    tri, cfg = _tri_and_cfg(preset_fn())
    eo = dataclasses.replace(cfg, z_earlyout=True, **gates)
    t_j, z_j, _ = jb.visibility_binned(tri, cfg)
    t_p, z_p, of_p = pst.visibility_binned(tri, eo, interpret=True)
    assert int(of_p) == 0
    assert (np.asarray(t_j) == np.asarray(t_p)).all()
    assert (np.asarray(z_j) == np.asarray(z_p)).all()
