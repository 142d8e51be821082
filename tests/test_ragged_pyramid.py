"""Mixed-size texture pyramids (RaggedPyramid): native-resolution sampling
must agree with the uniform pyramid wherever both exist, and the mixed
path must hold oracle/device parity end-to-end."""

import numpy as np

from xr.core import shade_math as sm
from xr.scene.texture import (
    build_pyramid,
    build_ragged_pyramid,
    checkerboard,
    noise_texture,
)


def _rand_uvlod(n, lmax, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.uniform(-1.5, 2.5, n).astype(np.float32),
        rng.uniform(-1.5, 2.5, n).astype(np.float32),
        rng.uniform(-0.5, lmax + 1.0, n).astype(np.float32),
    )


def test_ragged_equals_uniform_when_same_size():
    imgs = [checkerboard(64), noise_texture(64, seed=7)]
    uni = build_pyramid(imgs)
    rag = build_ragged_pyramid(imgs)
    assert rag.num_levels == uni.num_levels
    u, v, lod = _rand_uvlod(500, uni.num_levels)
    tid = (np.arange(500) % 2).astype(np.int32)
    a = sm.sample_trilinear(uni, tid, u, v, lod, np)
    b = sm.sample_trilinear(rag, tid, u, v, lod, np)
    assert (a == b).all(), "same-size ragged sampling must be bit-identical"


def test_ragged_preserves_native_content():
    """A small texture in a MIXED pyramid samples exactly like the same
    texture alone in its own uniform pyramid (no resampling loss)."""
    small = noise_texture(32, seed=3)
    big = checkerboard(256)
    rag = build_ragged_pyramid([big, small])
    uni_small = build_pyramid([small])

    u, v, lod = _rand_uvlod(400, uni_small.num_levels - 1, seed=1)
    lod = np.clip(lod, 0.0, uni_small.num_levels - 1.0)
    a = sm.sample_trilinear(
        rag, np.ones(400, np.int32), u, v, lod, np
    )
    b = sm.sample_trilinear(
        uni_small, np.zeros(400, np.int32), u, v, lod, np
    )
    assert (a == b).all()


def test_ragged_lod_tail_repeats_1x1():
    """LODs past a texture's native chain return its 1x1 mip (the mean)."""
    small = noise_texture(16, seed=9)
    big = checkerboard(512)
    rag = build_ragged_pyramid([big, small])
    deep = np.full((8,), float(rag.num_levels), np.float32)
    u, v, _ = _rand_uvlod(8, 1, seed=2)
    c = sm.sample_trilinear(rag, np.ones(8, np.int32), u, v, deep, np)
    assert np.allclose(c, c[0]), "1x1 tail must be position-independent"


def test_ragged_end_to_end_parity():
    """Oracle vs device (<=1 LSB) on a textured scene with MIXED sizes."""
    import jax

    from xr.app.renderer import Renderer
    from xr.cpu_ref import render_frame
    from xr.scene.presets import config3_terrain, small_preset

    p = small_preset(config3_terrain(nx=24, nz=24), 128, 96, bin_capacity=4096)
    # rebuild the scene's textures as a mixed-size ragged pyramid: the
    # terrain's checker at native size plus an unused smaller map
    pyr = p.scene.textures
    S = pyr.base_size
    base = np.asarray(pyr.data[0, : S * S]).reshape(S, S, 3)
    rag = build_ragged_pyramid([base, noise_texture(S // 4)])
    scene = p.scene.replace(textures=jax.tree_util.tree_map(np.asarray, rag))
    cam, mm = p.animate(0.3, np)
    scene = scene.replace(model_matrices=mm)

    of = render_frame(scene, cam, p.config)
    r = Renderer(scene, p.config)
    df = r.readback(r.step(scene, cam))
    assert ((df.depth == 1.0) == (of.depth == 1.0)).all()
    diff = np.abs(df.color.astype(int) - of.color.astype(int))
    assert diff.max() <= 1, f"ragged textured parity: max {diff.max()}"


def test_closed_form_level_math_matches_tables():
    """build_ragged_pyramid's level tables obey the closed form: sizes
    are power-of-two shifts and a finest-first chain's row offset is the
    geometric sum (4B^2-4s^2)/3. (A shading path computing these per
    pixel in closed form instead of via the tiny-table selects was tried
    and REVERTED — slower end-to-end, PERF.md round 3 — but the formula
    still documents/pins the packing layout, for mixed sizes INCLUDING
    the repeated 1x1 tail levels.)"""
    imgs = [noise_texture(128, seed=1), checkerboard(16),
            noise_texture(512, seed=2), checkerboard(32)]
    rag = build_ragged_pyramid(imgs)
    L = rag.num_levels
    for t in range(len(imgs)):
        B = int(rag.base_size_per_tex[t])
        tex_base = int(rag.level_offset[t, 0])
        for k in range(L):
            s = max(B >> k, 1)
            assert int(rag.level_size[t, k]) == s
            off = tex_base + (4 * (B * B - s * s)) // 3
            assert int(rag.level_offset[t, k]) == off, (t, k)


def test_identity_layout_stream_sizing_bounded_by_source():
    """An identity-style record layout (huge clip_expand -> capacity far
    above live triangles) must NOT multiply the stream kernel's block
    count: stream_blocks bounds its sizing by the SOURCE triangle count
    (TriBuf.num_src), so the old round-3 'stream_entry_cap=0' footgun —
    and its warning — are gone by construction (VERDICT r4 #3)."""
    import dataclasses

    from xr.pipeline.geometry import MAX_FAN, clip_budget, clip_capacity
    from xr.raster.pallas_stream import stream_blocks
    from xr.scene.presets import config1_cube

    p = config1_cube()
    cfg = dataclasses.replace(
        p.config, backend="pallas_stream", clip_expand=50.0
    )
    # unit-level: a 100x-inflated record capacity must not inflate sizing
    num_src, cap = 1_000, 100_000
    nb_inflated = stream_blocks(cfg, cap)  # capacity-only bound (legacy)
    nb_bounded = stream_blocks(cfg, cap, num_src)
    assert nb_bounded < nb_inflated / 5
    # the bound is exactly the live-record ceiling, not the capacity
    live_bound = num_src + clip_budget(num_src, cfg) * (MAX_FAN - 1)
    assert live_bound < cap
    assert nb_bounded == stream_blocks(cfg, live_bound)
    # and the real preset regime still triggers the source-count bound
    real_cap = clip_capacity(p.scene.mesh.num_triangles, cfg)
    assert real_cap > 50 * p.scene.mesh.num_triangles
    assert stream_blocks(cfg, real_cap, p.scene.mesh.num_triangles) <= (
        stream_blocks(cfg, real_cap)
    )


def test_twolevel_fetch_bit_identical():
    """"twolevel" fetch (two 4-texel own-quad gathers, l0 + l1) must equal
    "wide" (13-col quad+parent row) BIT-EXACTLY: the l1 anchor's own quad
    is the same four texels the parent-3x3 select picks, and the bilerp op
    order is shared. twolevel is what "auto" resolves to past the ~300k-row
    gather layout-flip threshold (PERF.md round 3)."""
    rng = np.random.default_rng(11)
    rag = build_ragged_pyramid(
        [checkerboard(64), noise_texture(128, seed=4), noise_texture(32, seed=5)]
    )
    uni = build_pyramid([noise_texture(64, seed=6), checkerboard(64)])
    n = 4096
    for pyr, ntex in ((rag, 3), (uni, 2)):
        tid = rng.integers(0, ntex, n).astype(np.int32)
        u = rng.uniform(-2, 3, n).astype(np.float32)
        v = rng.uniform(-2, 3, n).astype(np.float32)
        lod = rng.uniform(-1, 9, n).astype(np.float32)
        addr = rng.integers(0, 2, n).astype(np.int32)
        for a in (None, addr):
            w = sm.sample_trilinear(pyr, tid, u, v, lod, np, fetch="wide", addr=a)
            t = sm.sample_trilinear(pyr, tid, u, v, lod, np, fetch="twolevel", addr=a)
            assert (w == t).all(), "twolevel diverged from wide"


def test_area_cap_drops_top_mips_of_largest():
    """max_total_rows: the largest texture loses its finest level(s) until
    the quad table fits; capped textures sample exactly like their own
    box-filtered first mip at native size (PERF.md round 3: >~300k-row
    tables flip the per-pixel gather to element rate)."""
    from xr.scene.texture import _mip_levels, chain_rows

    big = checkerboard(128)
    small = noise_texture(32, seed=5)
    cap = chain_rows(64) + chain_rows(32)
    rag = build_ragged_pyramid([big, small], max_total_rows=cap)
    assert rag.quads.shape[0] <= cap
    assert list(rag.base_size_per_tex) == [64, 32]

    # capped big == its own first mip as a native-size texture
    ref = build_ragged_pyramid([_mip_levels(big)[1], small])
    assert (rag.quads == ref.quads).all()
    assert (rag.level_offset == ref.level_offset).all()

    # unreachable cap fails loudly
    import pytest

    with pytest.raises(ValueError):
        build_ragged_pyramid([big, small], max_total_rows=1)


def test_area_cap_scene_end_to_end():
    """A capped courtyard keeps oracle/device parity (the cap changes the
    pyramid CONTENT, never the sampling semantics)."""
    import dataclasses

    from xr.app.renderer import Renderer
    from xr.cpu_ref import render_frame
    from xr.scene.presets import config6_asset, small_preset

    p = small_preset(
        config6_asset(max_tex_rows=300_000), 128, 72,
        bin_capacity=49152, shadow_map_size=128,
    )
    assert p.scene.textures.quads.shape[0] <= 300_000
    cam, mm = p.animate(0.4, np)
    scene = p.scene.replace(model_matrices=mm)
    of = render_frame(scene, cam, p.config)
    r = Renderer(scene, p.config)
    df = r.readback(r.step(scene, cam))
    diff = np.abs(df.color.astype(int) - of.color.astype(int))
    bad = (diff.max(axis=-1) > 1).sum()
    assert bad <= df.color.shape[0] * df.color.shape[1] * 0.001, (
        f"{bad} pixels differ >1 LSB (max {diff.max()})"
    )
