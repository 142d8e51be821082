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


def test_framebuffer_recycling_donates_and_preserves_values():
    """SURVEY.md §2.1 "Allocators": retired frames' device buffers are
    DONATED back into the next step, so the framebuffer/z-buffer HBM is
    persistent across frames. Values must be identical to a fresh-buffer
    renderer, and the recycled buffers must actually be consumed by
    donation (deleted), proving XLA aliased the outputs onto them."""
    p = small_preset(config2_icospheres(), 96, 64, bin_capacity=8192)
    scene = p.scene
    r = Renderer(scene, p.config)  # recycle_framebuffers defaults on
    r_fresh = Renderer(scene, p.config, recycle_framebuffers=False)

    def snap(frame):
        # On the CPU backend np.asarray(device_array) is ZERO-COPY: holding
        # the host view pins the device buffer, and XLA then (safely)
        # degrades the donation to a copy. Snapshot values and drop the
        # views so the aliasing assert below sees donatable buffers — on
        # TPU host copies are separate memory and this is a non-issue.
        return frame.color.copy(), frame.depth.copy()

    hosts, refs, retired = [], [], []
    for i in range(4):
        cam, mm = p.animate(0.1 * i, np)
        s = scene.replace(model_matrices=mm)
        f = r.step(s, cam)
        refs.append(snap(r_fresh.readback(r_fresh.step(s, cam))))
        out = r.present(f)
        if out is not None:
            hosts.append(snap(out))
        del out  # drop the zero-copy host views before the next step
        if i >= 1:
            retired.append(f)  # will be recycled by a later step
    hosts.append(snap(r.flush()))

    for (gc, gd), (rc, rd) in zip(hosts, refs):
        assert (gc == rc).all()
        assert (gd == rd).all()

    # the first retired frame was donated into a later step: its device
    # buffers must be gone (this is what makes the reuse real, not a copy)
    first = retired[0]
    if hasattr(first.color, "is_deleted"):
        assert first.color.is_deleted(), "retired framebuffer was not donated"
