"""Loaded-asset pipeline at scale (VERDICT r1 missing #3 / weak #7):
the ~96k-tri multi-material courtyard flows from disk through parser ->
MTL -> mixed-size map_Kd textures -> mips -> render. Complements the
config6 golden test (tests/test_goldens.py)."""

import os

import numpy as np
import pytest

from xr.native import api
from xr.scene import objio
from xr.scene.presets import config6_asset

ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "courtyard",
)


@pytest.fixture(scope="module")
def courtyard():
    # config6_asset() generates the pack on first use (deterministic)
    scene = config6_asset().scene
    return scene


def test_native_and_python_parsers_agree_at_scale(courtyard):
    if not api.available():
        pytest.skip("native library unavailable")
    path = os.path.join(ASSETS, "courtyard.obj")
    rn = objio.parse_obj(path, native=True)
    rp = objio.parse_obj(path, native=False)
    assert rn["indices"].shape == rp["indices"].shape
    assert rn["indices"].shape[0] > 90_000
    np.testing.assert_array_equal(rn["indices"], rp["indices"])
    np.testing.assert_array_equal(rn["face_mat"], rp["face_mat"])
    np.testing.assert_allclose(rn["positions"], rp["positions"], atol=1e-5)
    np.testing.assert_allclose(rn["uvs"], rp["uvs"], atol=1e-5)
    assert rn["materials"] == rp["materials"]


def test_mixed_texture_sizes_native(courtyard):
    """Three map_Kd textures of DIFFERENT sizes (512/256/128) each keep
    their NATIVE resolution in a RaggedPyramid (SURVEY.md §2.1
    Material/texture: the reference handles per-image texture sizes; the
    round-2 resample-to-one-size policy was the lossy stopgap)."""
    pyr = courtyard.textures
    assert pyr is not None
    assert pyr.num_textures == 3
    assert sorted(np.asarray(pyr.base_size_per_tex).tolist()) == [
        128, 256, 512,
    ]
    # per-texture level-0 blocks carry distinct content at native size
    offs = np.asarray(pyr.level_offset)
    szs = np.asarray(pyr.level_size)
    stds = []
    for t in range(3):
        s = int(szs[t, 0])
        lvl0 = np.asarray(pyr.data[offs[t, 0] : offs[t, 0] + s * s])
        stds.append(float(lvl0.std()))
    assert all(sd > 0.01 for sd in stds)  # real, distinct content
    # level tables: sizes halve down to the 1x1 tail, offsets increase
    for t in range(3):
        assert szs[t, 0] == int(np.asarray(pyr.base_size_per_tex)[t])
        assert szs[t, -1] == 1
        assert (szs[t, :-1] // np.maximum(szs[t, 1:], 1) <= 2).all()
    # materials reference all three + one untextured
    tex_ids = set(int(t) for t in courtyard.materials.tex_id)
    assert tex_ids == {-1, 0, 1, 2}


def test_asset_scene_shape_sanity(courtyard):
    m = courtyard.mesh
    assert m.num_triangles > 90_000
    assert m.vert_mat is not None  # host-precomputed (scene-static)
    assert m.uvs.shape == (m.num_vertices, 2)
    # authored normals survive (not all recomputed): the OBJ has explicit
    # vn lines for every corner
    n = np.linalg.norm(m.normals, axis=1)
    assert np.all(n > 0.5)
