"""Multi-chip screen-band sharding tests on a virtual CPU device mesh
(SURVEY.md §4.2: "tile-sharded frame must equal the single-device frame
bit-for-bit")."""

import dataclasses

import jax
import numpy as np
import pytest

from xr.app.renderer import Renderer
from xr.dist.shard import ShardedRenderer
from xr.scene.presets import (
    config2_icospheres,
    config4_blend,
    config4_phong,
    small_preset,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 (virtual) devices"
)


def _frames(preset, num_shards, t=0.2):
    cam, mm = preset.animate(t, np)
    scene = preset.scene.replace(model_matrices=mm)
    cfg1 = dataclasses.replace(preset.config, num_shards=1, raster_path="binned")
    cfgn = dataclasses.replace(
        preset.config, num_shards=num_shards, raster_path="binned"
    )
    single = Renderer(scene, cfg1)
    f1 = single.readback(single.step(scene, cam))
    multi = ShardedRenderer(scene, cfgn)
    fn = multi.step(scene, cam)
    return f1, fn


@pytest.mark.parametrize("n", [2, 4])
def test_sharded_equals_single_device(n):
    p = small_preset(
        config2_icospheres(), 96, 64, tile_h=16, tile_w=32, bin_capacity=8192
    )
    f1, fn = _frames(p, n)
    assert int(fn.stats["bin_overflow"]) == 0
    assert (np.asarray(fn.color) == f1.color).all(), "sharded color differs"
    assert (np.asarray(fn.depth) == f1.depth).all(), "sharded depth differs"


def test_sharded_two_pass_phong():
    """Full two-pass frame (shadow depth pre-pass + main pass) sharded."""
    p = small_preset(
        config4_phong(), 64, 48, tile_h=16, tile_w=32,
        bin_capacity=8192, shadow_map_size=64,
    )
    f1, fn = _frames(p, 4)
    assert (np.asarray(fn.color) == f1.color).all()
    assert (np.asarray(fn.depth) == f1.depth).all()


def test_sharded_blend():
    """Blend state composes with band sharding (VERDICT r3 #4): transparent
    records are filtered from both visibility passes and composited per
    band, bit-equal to the single-device blended frame."""
    p = small_preset(
        config4_blend(), 64, 48, tile_h=16, tile_w=32,
        bin_capacity=8192, shadow_map_size=64,
    )
    assert p.config.blend
    f1, fn = _frames(p, 4)
    assert int(fn.stats["blend_overflow"]) == 0
    assert (np.asarray(fn.color) == f1.color).all(), "sharded blend differs"
    assert (np.asarray(fn.depth) == f1.depth).all()


def test_sharded_pallas_stream_interpret():
    """The stream kernel composes with shard_map (VERDICT r1 #8): band-
    sharded frames through the Pallas path (interpret mode on the virtual
    CPU mesh) are bit-equal to the single-device jnp render."""
    p = small_preset(
        config2_icospheres(), 128, 64, tile_h=16, tile_w=128,
        bin_capacity=8192, backend="pallas_stream", pallas_interpret=True,
        stream_block=128,
    )
    f1, fn = _frames(p, 4)
    assert int(fn.stats["bin_overflow"]) == 0
    assert (np.asarray(fn.color) == f1.color).all()
    assert (np.asarray(fn.depth) == f1.depth).all()


def test_sharded_shade_hook_parity():
    """The custom pixel-shader stage (shade_hook) composes with band
    sharding: sharded hooked frame == single-device hooked frame."""

    def hook(color, scene_, mat_id, xp):
        return color[..., ::-1]

    p = small_preset(
        config2_icospheres(), 96, 64, tile_h=16, tile_w=32, bin_capacity=8192
    )
    cam, mm = p.animate(0.2, np)
    scene = p.scene.replace(model_matrices=mm)
    cfg1 = dataclasses.replace(p.config, num_shards=1, raster_path="binned")
    cfgn = dataclasses.replace(p.config, num_shards=4, raster_path="binned")
    single = Renderer(scene, cfg1, shade_hook=hook)
    f1 = single.readback(single.step(scene, cam))
    multi = ShardedRenderer(scene, cfgn, shade_hook=hook)
    fn = multi.step(scene, cam)
    assert (np.asarray(fn.color) == f1.color).all()
    assert (np.asarray(fn.depth) == f1.depth).all()


def test_sharded_framebuffer_recycling():
    """Donated persistent framebuffers compose with the band-sharded step
    (mirror of tests/test_present.py::test_framebuffer_recycling_*): the
    replicated frame outputs alias retired buffers; values unchanged."""
    p = small_preset(
        config2_icospheres(), 96, 64, tile_h=16, tile_w=32, bin_capacity=8192
    )
    cfgn = dataclasses.replace(p.config, num_shards=4, raster_path="binned")
    scene0 = p.scene
    r = ShardedRenderer(scene0, cfgn)
    r_fresh = ShardedRenderer(scene0, cfgn, recycle_framebuffers=False)

    hosts, refs, retired = [], [], []
    for i in range(4):
        cam, mm = p.animate(0.1 * i, np)
        s = scene0.replace(model_matrices=mm)
        f = r.step(s, cam)
        ref = r_fresh.readback(r_fresh.step(s, cam))
        refs.append((ref.color.copy(), ref.depth.copy()))
        out = r.present(f)
        if out is not None:
            hosts.append((out.color.copy(), out.depth.copy()))
        del out  # drop zero-copy host views before the next step
        if i >= 1:
            retired.append(f)
    last = r.flush()
    hosts.append((last.color.copy(), last.depth.copy()))
    del last

    for (gc, gd), (rc, rd) in zip(hosts, refs):
        assert (gc == rc).all()
        assert (gd == rd).all()
    if hasattr(retired[0].color, "is_deleted"):
        assert retired[0].color.is_deleted(), "retired sharded fb not donated"
