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


def test_load_obj_scene_with_mtl(tmp_path):
    """OBJ + MTL + map_Kd texture -> renderable Scene end-to-end."""
    from xr.core.image import write_png
    from xr.cpu_ref import render_frame
    from xr.core.types import MODE_PHONG, RenderConfig, Camera
    from xr.scene.objio import load_obj_scene

    tex = np.zeros((8, 8, 3), np.uint8)
    tex[::2, ::2] = 255
    write_png(str(tmp_path / "checker.png"), tex)
    (tmp_path / "scene.mtl").write_text(
        "newmtl red\nKd 0.9 0.1 0.1\nKs 0.5 0.5 0.5\nNs 64\n"
        "newmtl texd\nKd 1 1 1\nmap_Kd checker.png\n"
    )
    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\n"
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\n"
        "usemtl red\nf 1/1/1 2/2/1 3/3/1\n"
        "usemtl texd\nf 1/1/1 3/3/1 4/4/1\n"
    )
    scene = load_obj_scene(str(tmp_path / "scene.obj"))
    assert scene.materials.base_color.shape[0] == 2
    assert scene.textures is not None and scene.textures.base_size == 8
    assert scene.materials.tex_id.tolist() == [-1, 0]
    np.testing.assert_allclose(scene.materials.base_color[0], (0.9, 0.1, 0.1))
    assert float(scene.materials.shininess[0]) == 64.0

    cam = Camera(
        eye=np.asarray((0, 0, 3.0), np.float32),
        target=np.zeros(3, np.float32),
        up=np.asarray((0, 1.0, 0), np.float32),
        fov_y=np.asarray(np.deg2rad(60.0), np.float32),
        near=np.asarray(0.3, np.float32),
        far=np.asarray(10.0, np.float32),
    )
    frame = render_frame(
        scene, cam, RenderConfig(width=48, height=48, mode=MODE_PHONG)
    )
    assert (frame.depth < 1.0).any()


def test_native_obj_malformed_face_terminates(tmp_path):
    """A non-numeric face token must not hang the native parser (strtol does
    not advance on no-conversion); the bad token is skipped."""
    p = tmp_path / "bad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 x 3\n")
    if not NATIVE:
        pytest.skip("native library unavailable")
    r = api.parse_obj(str(p))
    assert r is not None
    # the bad token is dropped; the remaining 3 corners form one triangle
    assert r["indices"].shape == (1, 3)


def test_mtl_dissolve_to_blend(tmp_path):
    """MTL `d`/`Tr` dissolve maps to Material.alpha and composes with the
    blend pipeline state: a loaded half-transparent pane TINTS (not
    replaces) the opaque geometry behind it."""
    import dataclasses

    from xr.cpu_ref import render_frame
    from xr.core.types import MODE_FLAT, Camera, RenderConfig
    from xr.scene.objio import load_obj_scene, parse_mtl

    (tmp_path / "scene.mtl").write_text(
        "newmtl solid\nKd 0.1 0.9 0.1\n"
        "newmtl pane\nKd 0.9 0.1 0.1\nd 0.5\n"
        "newmtl legacy\nKd 0 0 1\nTr 0.7\n"
    )
    m = parse_mtl(str(tmp_path / "scene.mtl"))
    assert m["pane"]["d"] == 0.5
    assert abs(m["legacy"]["d"] - 0.3) < 1e-9  # Tr = 1 - d

    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\n"
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"   # back quad z=0
        "v -1 -1 1\nv 1 -1 1\nv 1 1 1\nv -1 1 1\n"   # front pane z=1
        "vn 0 0 1\n"
        "usemtl solid\nf 1//1 2//1 3//1\nf 1//1 3//1 4//1\n"
        "usemtl pane\nf 5//1 6//1 7//1\nf 5//1 7//1 8//1\n"
    )
    scene = load_obj_scene(str(tmp_path / "scene.obj"))
    assert scene.materials.alpha is not None
    np.testing.assert_allclose(np.asarray(scene.materials.alpha)[:2], [1.0, 0.5])

    cam = Camera(
        eye=np.asarray((0, 0, 4.0), np.float32),
        target=np.zeros(3, np.float32),
        up=np.asarray((0, 1.0, 0), np.float32),
        fov_y=np.asarray(np.deg2rad(60.0), np.float32),
        near=np.asarray(0.3, np.float32),
        far=np.asarray(10.0, np.float32),
    )
    cfg = RenderConfig(width=48, height=48, mode=MODE_FLAT, blend=True)
    blended = render_frame(scene, cam, cfg)
    opaque = render_frame(
        scene, cam, dataclasses.replace(cfg, blend=False)
    )
    # blended center pixel mixes green-behind-red; with blend off the pane
    # rasterizes opaquely and shows pure pane color
    cb = blended.color[24, 24].astype(int)
    co = opaque.color[24, 24].astype(int)
    assert (cb != co).any()
    assert cb[1] > co[1] + 20, "green backing not visible through the pane"
