"""Native C++ component parity vs the pure-Python fallbacks
(SURVEY.md §2.1 native-component rule: host-side C++ equivalents)."""

import numpy as np
import pytest

from xr.core import image as pyimage
from xr.native import api
from xr.scene import objio
from xr.scene.texture import build_pyramid

NATIVE = api.available()

OBJ_SAMPLE = """
# sample with quads, materials, negative indices, v/vt/vn forms
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
vn 0 1 0
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl blue
f -5/-4/-2 -4/-3/-2 -1/-2/-1
f 1//2 2//2 5//1
"""


@pytest.fixture
def obj_path(tmp_path):
    p = tmp_path / "sample.obj"
    p.write_text(OBJ_SAMPLE)
    return str(p)


def test_python_obj_parser(obj_path):
    r = objio.parse_obj(obj_path, native=False)
    # quad -> 2 tris, then 1 + 1
    assert r["indices"].shape == (4, 3)
    assert r["materials"] == ["red", "blue"]
    assert r["face_mat"].tolist() == [0, 0, 1, 1]
    assert r["positions"].shape[1] == 3
    # v/vt/vn dedup: corner (1,1,1) reused across faces
    assert r["positions"].shape[0] <= 12


@pytest.mark.skipif(not NATIVE, reason="native lib unavailable")
def test_native_obj_matches_python(obj_path):
    a = objio.parse_obj(obj_path, native=False)
    b = api.parse_obj(obj_path)
    assert a["materials"] == b["materials"]
    assert (a["indices"] == b["indices"]).all()
    assert (a["face_mat"] == b["face_mat"]).all()
    np.testing.assert_array_equal(a["positions"], b["positions"])
    np.testing.assert_array_equal(a["uvs"], b["uvs"])
    np.testing.assert_array_equal(a["normals"], b["normals"])


@pytest.mark.skipif(not NATIVE, reason="native lib unavailable")
def test_native_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    p = str(tmp_path / "n.png")
    assert api.write_png(p, img)
    back = pyimage.read_png(p)
    assert (back == img).all()


@pytest.mark.skipif(not NATIVE, reason="native lib unavailable")
def test_native_mips_match_python():
    rng = np.random.default_rng(2)
    img = rng.random((64, 64, 3)).astype(np.float32)
    pyr = build_pyramid([img])
    nat = api.build_mips(img)
    assert nat is not None
    np.testing.assert_array_equal(np.asarray(pyr.data[0]), nat)


def test_obj_roundtrip(tmp_path):
    from xr.scene.procedural import icosphere

    mesh = icosphere(1, radius=1.0)
    p = str(tmp_path / "rt.obj")
    objio.save_obj(p, mesh)
    back, mats = objio.load_obj(p, native=False)
    # the parser renumbers vertices in first-use order; compare the actual
    # triangle geometry instead of raw indices
    tri_a = np.asarray(mesh.positions)[np.asarray(mesh.indices)]
    tri_b = np.asarray(back.positions)[np.asarray(back.indices)]
    np.testing.assert_allclose(tri_a, tri_b, atol=2e-5)
