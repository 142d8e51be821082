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


def test_mixed_texture_sizes_resampled(courtyard):
    """Three map_Kd textures of DIFFERENT sizes (512/256/128) are loaded
    and resampled to one power-of-two pyramid (the documented texture-size
    policy, SURVEY.md §2.1 Material/texture)."""
    pyr = courtyard.textures
    assert pyr is not None
    assert pyr.num_textures == 3
    assert pyr.base_size == 512  # largest map wins
    # each texture carries distinct content (not accidentally duplicated)
    lvl0 = np.asarray(pyr.data[:, : 512 * 512]).reshape(3, 512, 512, 3)
    assert np.abs(lvl0[0] - lvl0[1]).mean() > 0.02
    assert np.abs(lvl0[1] - lvl0[2]).mean() > 0.02
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
