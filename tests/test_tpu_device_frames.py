"""Real-device END-TO-END frame parity (XR_TEST_PLATFORM=tpu only).

The CPU suite runs the jnp/device path on the CPU backend, so an
XLA-TPU-specific mis-lowering of the frame program is invisible to it —
exactly how the round-3 ambient-only Phong bug (ISSUES.md) escaped: the
fps bench measures timing, not pixels, and the parity tests never ran on
the real chip. These tests render small frames on the actual TPU and
diff them against the CPU oracle.
"""

import numpy as np
import pytest

from xr.cpu_ref import render_frame
from xr.scene.presets import (
    config2_icospheres,
    config3_terrain,
    config4_blend,
    config4_phong,
    small_preset,
)

pytestmark = pytest.mark.tpu


@pytest.mark.parametrize(
    "preset_fn",
    [config2_icospheres, config3_terrain, config4_phong, config4_blend],
)
def test_device_frame_matches_oracle(preset_fn):
    """Gouraud, textured, AND Phong frames must match the oracle <= 1 LSB
    on the real chip (BASELINE.json:2). config4 is the ambient-only bug's
    regression guard: zeroed normals kill diffuse+specular everywhere,
    which shows up here as a large uniform color error."""
    import jax
    from xr.app.renderer import Renderer

    p = small_preset(preset_fn(), 480, 270)
    scene = p.scene
    cam, mm = p.animate(0.0, np)
    of = render_frame(scene.replace(model_matrices=mm), cam, p.config)

    import jax.numpy as jnp

    scene_j = jax.tree_util.tree_map(jnp.asarray, scene)
    cam_j, mm_j = p.animate(0.0, jnp)
    r = Renderer(scene_j, p.config)
    df = r.readback(r.step(scene_j.replace(model_matrices=mm_j), cam_j))

    assert ((df.depth == 1.0) == (np.asarray(of.depth) == 1.0)).all(), (
        "coverage mismatch on device"
    )
    diff = np.abs(df.color.astype(int) - np.asarray(of.color).astype(int))

    # The shadow-map test is a binary comparison on f32 inputs that
    # legitimately differ between backends at ~1e-6; pixels the ORACLE
    # declares within noise of a lit/shadowed flip are exempt from the
    # strict check (and their count is bounded). Everything else —
    # coverage, visibility, blending, all shading math — must hold 1 LSB.
    # (The round-4 1-px/43-LSB episode: ISSUES.md.)
    from xr.cpu_ref.margins import shadow_flip_risk

    risk = shadow_flip_risk(scene.replace(model_matrices=mm), cam, p.config)
    n_risk = int(risk.sum())
    assert n_risk <= p.config.width * p.config.height // 1000, (
        f"{p.name}: {n_risk} shadow-ambiguous pixels — scene is "
        "ill-conditioned for parity testing, fix the preset"
    )
    strict = diff.max(axis=-1) * ~risk
    assert strict.max() <= 1, (
        f"{p.name}: device color differs from oracle by {strict.max()} LSB "
        f"at {int((strict > 1).sum())} well-conditioned pixels "
        f"({n_risk} shadow-ambiguous px were exempt)"
    )
    # Exempt pixels are only exempt from SHADOW-flip-sized error: a
    # lit<->shadowed toggle moves a channel by the diffuse+specular
    # contribution (largest real flip measured: 151 LSB, config6 round 5).
    # A genuine unbounded bug that happens to land on a risk pixel must
    # still fail (ADVICE r4): bound the exempt set loosely at 180 LSB.
    if n_risk:
        loose = (diff.max(axis=-1) * risk).max()
        assert loose <= 180, (
            f"{p.name}: {loose} LSB at a shadow-ambiguous pixel — larger "
            "than any lit/shadowed delta, this is a real bug"
        )


def test_device_fetch_axes_bitexact():
    """The round-4 scale-regime axes (record_split, tex_split,
    lod_fetch='recompute', bin_pairs=2) must be bit-identical to the
    default program ON THE REAL CHIP — the CPU suite proves value
    equality, but these axes exist to change XLA's lowering, so the
    device is where they could diverge (e.g. a relayout through a
    mangling op, ISSUES.md-class)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from xr.app.renderer import Renderer

    p = small_preset(config3_terrain(), 480, 270)
    scene_j = jax.tree_util.tree_map(jnp.asarray, p.scene)
    cam_j, mm_j = p.animate(0.0, jnp)
    s = scene_j.replace(model_matrices=mm_j)

    r0 = Renderer(scene_j, p.config)
    f0 = r0.readback(r0.step(s, cam_j))
    cfg = dataclasses.replace(
        p.config, record_split=2, tex_split=2, lod_fetch="recompute",
        bin_pairs=2, mip_math="closed", corner_fetch="percorner",
    )
    r1 = Renderer(scene_j, cfg)
    f1 = r1.readback(r1.step(s, cam_j))
    assert (f1.depth == f0.depth).all()
    assert (f1.color == f0.color).all(), (
        "fetch-axis program diverges from the default on device"
    )


def test_device_config5_scale_regime_matches_oracle():
    """config5's REAL regimes on the real chip (VERDICT r4 #4a): the full
    1M-triangle mesh keeps the record table at ~431k rows — past the
    ~300k-row layout-flip threshold where gathers run at element rate —
    and the stream kernel runs with z_earlyout (+ bin_zorder if the
    preset enables it). Only the framebuffer is reduced; the capacity,
    table layout, and kernel paths are the benched ones. <= 1 LSB."""
    import jax
    import jax.numpy as jnp

    from xr.app.renderer import Renderer
    from xr.scene.presets import config5_flythrough

    p = small_preset(config5_flythrough(), 480, 270, num_shards=1)
    cam, mm = p.animate(1.0, np)
    of = render_frame(p.scene.replace(model_matrices=mm), cam, p.config)

    from xr.pipeline.geometry import clip_capacity

    assert clip_capacity(p.scene.mesh.num_triangles, p.config) > 300_000, (
        "test no longer crosses the element-rate regime"
    )

    scene_j = jax.tree_util.tree_map(jnp.asarray, p.scene)
    cam_j, mm_j = p.animate(1.0, jnp)
    r = Renderer(scene_j, p.config)
    df = r.readback(r.step(scene_j.replace(model_matrices=mm_j), cam_j))

    assert ((df.depth == 1.0) == (np.asarray(of.depth) == 1.0)).all()
    diff = np.abs(df.color.astype(int) - np.asarray(of.color).astype(int))
    assert diff.max() <= 1, (
        f"config5 device color differs by {diff.max()} LSB at "
        f"{int((diff.max(axis=-1) > 1).sum())} px"
    )


def test_device_config6_ragged_texaddr_matches_oracle():
    """config6's regimes on the real chip (VERDICT r4 #4b): RaggedPyramid
    (mixed native texture sizes) + per-material tex_addr (clamp vs wrap)
    + Phong + shadow map, through the full loaded-asset pipeline. The
    shadow ambiguity mask applies as in the preset parity test."""
    import jax
    import jax.numpy as jnp

    from xr.app.renderer import Renderer
    from xr.cpu_ref.margins import shadow_flip_risk
    from xr.scene.presets import config6_asset

    p = small_preset(config6_asset(), 480, 270)
    scene = p.scene
    assert hasattr(scene.textures, "base_size_per_tex"), "not ragged?"
    assert scene.materials.tex_addr is not None, "no mixed tex_addr?"
    cam, mm = p.animate(0.4, np)
    of = render_frame(scene.replace(model_matrices=mm), cam, p.config)

    scene_j = jax.tree_util.tree_map(jnp.asarray, scene)
    cam_j, mm_j = p.animate(0.4, jnp)
    r = Renderer(scene_j, p.config)
    df = r.readback(r.step(scene_j.replace(model_matrices=mm_j), cam_j))

    assert ((df.depth == 1.0) == (np.asarray(of.depth) == 1.0)).all()
    diff = np.abs(df.color.astype(int) - np.asarray(of.color).astype(int))
    risk = shadow_flip_risk(scene.replace(model_matrices=mm), cam, p.config)
    n_risk = int(risk.sum())
    # scene-health precondition: the courtyard's long shallow-angle shadow
    # boundaries measure 138 ambiguous px at 480x270 (0.106%), just past
    # the preset tests' 0.1%; allow 0.2% here — the strict <=1 LSB bound
    # below still covers 99.8% of pixels and risk pixels stay <=80 LSB
    assert n_risk <= p.config.width * p.config.height // 500
    strict = diff.max(axis=-1) * ~risk
    assert strict.max() <= 1, (
        f"config6 device differs by {strict.max()} LSB at "
        f"{int((strict > 1).sum())} well-conditioned px "
        f"({n_risk} shadow-ambiguous exempt)"
    )
    if n_risk:
        # largest real single-flip delta measured on this scene: 151 LSB
        # (marble in direct light vs ambient-only, round 5)
        assert (diff.max(axis=-1) * risk).max() <= 180
