"""Frames-in-flight presentation API (SURVEY.md §2.1 "Allocators" /
"Command recording & sync"): present(frame) starts the async device->host
copy and returns the PREVIOUS frame's host copy."""

import numpy as np

from xr.app.renderer import Renderer
from xr.scene.presets import config2_icospheres, small_preset


def test_present_queue_one_frame_in_flight():
    p = small_preset(config2_icospheres(), 96, 64, bin_capacity=8192)
    scene = p.scene
    r = Renderer(scene, p.config)

    frames = []
    for i in range(3):
        cam, mm = p.animate(0.1 * i, np)
        frames.append(r.step(scene.replace(model_matrices=mm), cam))

    # present returns the previous frame, one in flight at all times
    assert r.present(frames[0]) is None
    f0 = r.present(frames[1])
    f1 = r.present(frames[2])
    f2 = r.flush()
    assert r.flush() is None  # queue drained

    for got, src in zip((f0, f1, f2), frames):
        ref = r.readback(src)
        assert isinstance(got.color, np.ndarray)
        assert (got.color == ref.color).all()
        assert (got.depth == ref.depth).all()
        assert int(got.stats["bin_overflow"]) == 0


def test_present_strict_overflow_raises():
    import dataclasses

    import pytest

    p = small_preset(config2_icospheres(), 96, 64, bin_capacity=2)
    cfg = dataclasses.replace(p.config, raster_path="binned", backend="jnp")
    scene = p.scene
    r = Renderer(scene, cfg)
    cam, mm = p.animate(0.0, np)
    r.present(r.step(scene.replace(model_matrices=mm), cam))
    with pytest.raises(RuntimeError, match="overflow"):
        r.flush()
