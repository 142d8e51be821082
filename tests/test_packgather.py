"""Flip-proof packed-table gathers (xr/core/packgather.py): the
multi-record row layout must be bit-invisible end-to-end.

The packed path normally engages only above ~131k table rows (config-5
scale, where XLA flips narrow tables column-major); these tests force it
on small scenes via the monkeypatchable threshold and assert frames are
BIT-IDENTICAL to the plain layout, through every consumer (deferred pass,
texture quads, stream-kernel prep, vertex/compaction gathers).
"""

import dataclasses

import numpy as np
import pytest

import xr.core.packgather as pg
from xr.app.renderer import Renderer
from xr.scene.presets import (
    config2_icospheres,
    config3_terrain,
    config4_phong,
    small_preset,
)


def test_pack_factor():
    assert pg.pack_factor(1000, 31) == 1  # under threshold
    assert pg.pack_factor(1_000_000, 31) == 4
    assert pg.pack_factor(1_000_000, 17) == 4
    assert pg.pack_factor(1_000_000, 13) == 8
    assert pg.pack_factor(1_000_000, 4) == 32
    assert pg.pack_factor(1_000_000, 65) == 1  # cannot pack


def test_packed_cols_values():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(1000, 13)).astype(np.float32)
    idx = rng.integers(0, 1000, (7, 55)).astype(np.int32)
    plain, p1 = pg.packed_cols(table, idx, np)
    packed, p8 = pg.packed_cols(table, idx, np, threshold=10)
    assert p1 == 1 and p8 == 8
    for j in range(13):
        assert (plain(j) == packed(j)).all()
        assert (plain(j) == table[idx][..., j]).all()


@pytest.mark.parametrize(
    "factory,over",
    [
        (lambda: config3_terrain(nx=24, nz=24), dict(bin_capacity=4096)),
        (config4_phong, dict(bin_capacity=8192, shadow_map_size=64)),
        (config2_icospheres, dict(bin_capacity=8192)),
    ],
)
def test_packed_path_bit_identical(monkeypatch, factory, over):
    p = small_preset(factory(), 128, 96, **over)
    cam, mm = p.animate(0.3, np)
    scene = p.scene.replace(model_matrices=mm)

    r = Renderer(scene, p.config)
    plain = r.readback(r.step(scene, cam))

    monkeypatch.setattr(pg, "FLIP_THRESHOLD", 8)  # force packing everywhere
    r2 = Renderer(scene, p.config)
    packed = r2.readback(r2.step(scene, cam))

    assert (plain.color == packed.color).all()
    assert (plain.depth == packed.depth).all()


def test_packed_path_stream_kernel_interpret(monkeypatch):
    """The stream kernel's record prep through the packed accessor."""
    p = small_preset(
        config2_icospheres(), 128, 64, tile_h=16, tile_w=128,
        bin_capacity=8192,
    )
    cfg = dataclasses.replace(
        p.config, backend="pallas_stream", pallas_interpret=True,
        raster_path="binned", stream_block=128,
    )
    cam, mm = p.animate(0.2, np)
    scene = p.scene.replace(model_matrices=mm)
    r = Renderer(scene, cfg)
    plain = r.readback(r.step(scene, cam))
    monkeypatch.setattr(pg, "FLIP_THRESHOLD", 8)
    r2 = Renderer(scene, cfg)
    packed = r2.readback(r2.step(scene, cam))
    assert (plain.color == packed.color).all()
    assert (plain.depth == packed.depth).all()
