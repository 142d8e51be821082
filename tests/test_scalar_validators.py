"""Independent float64 scalar validation of texturing + shadow math.

VERDICT round 1 weak #5: for texturing/LOD/shadows the oracle WAS the
device code (shared xp-generic source), so a shared bug was invisible.
These tests compare xr/core/shade_math.py against xr/cpu_ref/brute.py's
scalar re-derivations, which share no sampling/compare code.
"""

import numpy as np
import pytest

from xr.core import shade_math as sm
from xr.cpu_ref import brute
from xr.scene import texture as tx


def _levels_from_pyramid(pyr, tex: int):
    out = []
    for k in range(pyr.num_levels):
        s = pyr.level_size(k)
        o = pyr.level_offset(k)
        out.append(np.asarray(pyr.data[tex, o : o + s * s]).reshape(s, s, 3))
    return out


def test_trilinear_matches_scalar_reference():
    pyr = tx.build_pyramid(
        [tx.checkerboard(64, 8), tx.noise_texture(64, seed=5)]
    )
    rng = np.random.default_rng(42)
    n = 256
    u = rng.uniform(-1.5, 2.5, n).astype(np.float32)
    v = rng.uniform(-1.5, 2.5, n).astype(np.float32)
    lod = rng.uniform(-0.5, pyr.num_levels + 0.5, n).astype(np.float32)
    tex = rng.integers(0, 2, n).astype(np.int32)

    got = sm.sample_trilinear(pyr, tex, u, v, lod, np)  # (n, 3)

    levels_by_tex = [_levels_from_pyramid(pyr, t) for t in range(2)]
    for i in range(n):
        want = brute.sample_trilinear_scalar(
            levels_by_tex[int(tex[i])], float(u[i]), float(v[i]), float(lod[i])
        )
        err = np.abs(got[i].astype(np.float64) - want).max()
        assert err <= 2.5 / 255.0, (
            f"sample {i}: uv=({u[i]:.4f},{v[i]:.4f}) lod={lod[i]:.3f} "
            f"tex={tex[i]}: err {err*255:.2f} LSB"
        )


def test_trilinear_level_snap_exact():
    """At integer lod and texel centers the sample must equal the quantized
    texel exactly (validates anchor/offset indexing, not just blending)."""
    pyr = tx.build_pyramid([tx.noise_texture(32, seed=11)])
    for k in (0, 1, 3):
        s = pyr.level_size(k)
        o = pyr.level_offset(k)
        lvl = np.asarray(pyr.data[0, o : o + s * s]).reshape(s, s, 3)
        q = np.floor(np.clip(lvl, 0, 1) * 255.0 + 0.5) / 255.0
        for (j, i) in ((0, 0), (1, 2), (s - 1, s - 1), (s // 2, 1)):
            u = (i + 0.5) / s
            v = (j + 0.5) / s
            got = sm.sample_trilinear(
                pyr,
                np.zeros(1, np.int32),
                np.float32([u]),
                np.float32([v]),
                np.float32([k]),
                np,
            )[0]
            np.testing.assert_allclose(got, q[j, i], atol=1.5 / 255.0)


def test_shadow_test_matches_scalar_reference():
    rng = np.random.default_rng(7)
    hs = ws = 32
    shadow = rng.uniform(0.1, 0.9, (hs, ws)).astype(np.float32)
    # plausible light view-proj: ortho-ish with some rotation
    from xr.core import math3d as m3

    from xr.core.types import Camera

    cam = Camera(
        eye=np.float32([4.0, 6.0, 3.0]),
        target=np.zeros(3, np.float32),
        up=np.float32([0, 1, 0]),
        fov_y=np.float32(np.deg2rad(70.0)),
        near=np.float32(0.5),
        far=np.float32(30.0),
    )
    view, proj = m3.camera_matrices(cam, 1.0, np)
    lvp = (proj @ view).astype(np.float32)

    pts = rng.uniform(-6, 6, (400, 3)).astype(np.float32)
    bias = 2e-3
    got = sm.shadow_test(shadow, pts, lvp, bias, np)

    mismatch = 0
    for i in range(pts.shape[0]):
        want = brute.shadow_test_scalar(shadow, pts[i], lvp, bias)
        if float(got[i]) != want:
            # disagreement allowed only within f32/f64 rounding of the
            # compare boundary or a texel-edge coordinate
            mismatch += 1
    assert mismatch <= 4, f"{mismatch}/400 shadow compares disagree"


def test_mips_engage_reduces_far_field_aliasing():
    """Real mip-engagement assertion (replaces round-1's no-op test):
    sampling a fine checker across one pixel-footprint-sized uv step must
    return near-constant colors at the footprint's correct lod, while
    lod=0 sampling stays high-contrast. Uses the public sampling API."""
    pyr = tx.build_pyramid([tx.checkerboard(256, 64)])  # 64-cell checker
    n = 64
    # simulate a far-away surface: adjacent pixels step ~8 texels in u
    # (non-integer step so lod-0 sampling hits varying checker phase)
    u = (np.arange(n) * 8.37 / 256.0).astype(np.float32)
    v = np.full(n, 0.3, np.float32)
    tex = np.zeros(n, np.int32)
    correct_lod = np.full(n, 3.0, np.float32)  # log2(8)
    flat = sm.sample_trilinear(pyr, tex, u, v, correct_lod, np)
    aliased = sm.sample_trilinear(pyr, tex, u, v, np.zeros(n, np.float32), np)
    var_mip = float(flat.mean(-1).var())
    var_l0 = float(aliased.mean(-1).var())
    assert var_mip < 0.25 * var_l0, (var_mip, var_l0)
    # and the mip'd average must sit near the checker mean
    assert abs(float(flat.mean()) - float(aliased.mean())) < 0.12


# ---------------------------------------------------------------------------
# In-jit sanitizer (RenderConfig.debug_checks; SURVEY.md §5.2(a), VERDICT
# r4 #6): nf_* counters localize WHICH stage produced a non-finite value.
# ---------------------------------------------------------------------------


def _sanitizer_setup(**cfg_overrides):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from xr.scene.presets import config2_icospheres, small_preset

    p = small_preset(
        config2_icospheres(), 160, 96, bin_capacity=8192, **cfg_overrides
    )
    cfg = dataclasses.replace(p.config, debug_checks=True)
    scene = jax.tree_util.tree_map(jnp.asarray, p.scene)
    cam, mm = p.animate(0.0, jnp)
    return scene.replace(model_matrices=mm), cam, cfg


def test_debug_checks_clean_scene_passes():
    from xr.app.renderer import Renderer

    scene, cam, cfg = _sanitizer_setup()
    r = Renderer(scene, cfg)
    f = r.readback(r.step(scene, cam))  # strict: must not raise
    nf = {k: int(v) for k, v in f.stats.items() if k.startswith("nf_")}
    assert nf and all(v == 0 for v in nf.values()), nf


def test_debug_checks_localizes_nan_vertex():
    import jax.numpy as jnp
    import pytest

    from xr.app.renderer import Renderer

    scene, cam, cfg = _sanitizer_setup()
    pos = scene.mesh.positions
    bad = scene.replace(
        mesh=scene.mesh.replace(positions=pos.at[7, 1].set(jnp.nan))
    )
    r = Renderer(scene, cfg)
    with pytest.raises(RuntimeError, match="input stage"):
        r.readback(r.step(bad, cam))


def test_debug_checks_localizes_shading_nan():
    """A NaN injected at the pixel-shader stage must be attributed to
    shading — with every earlier stage's counter zero (the localization
    has resolution, not just a global trip-wire)."""
    import numpy as np
    import pytest

    from xr.app.renderer import Renderer

    scene, cam, cfg = _sanitizer_setup()

    def nan_hook(color, scene, mat_id, xp):
        return color + xp.float32(np.nan) * color

    r = Renderer(scene, cfg, shade_hook=nan_hook)
    f = r.step(scene, cam)
    assert int(f.stats["nf_0_input"]) == 0
    assert int(f.stats["nf_1_geometry"]) == 0
    assert int(f.stats["nf_2_visibility"]) == 0
    assert int(f.stats["nf_3_shading"]) > 0
    with pytest.raises(RuntimeError, match="shading stage"):
        r.readback(f)
