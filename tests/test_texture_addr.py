"""Texture address modes (Material.tex_addr: repeat-wrap vs clamp-to-edge;
SURVEY.md §2.1 Material/texture — the reference's sampler address states,
surfaced in MTL as `map_Kd -clamp on`)."""

import numpy as np

from xr.core import shade_math as sm
from xr.core.types import Material
from xr.scene.texture import build_pyramid


def _pyr():
    rng = np.random.default_rng(5)
    img = rng.uniform(0.0, 1.0, (16, 16, 3)).astype(np.float32)
    return build_pyramid([img])


def test_repeat_wraps_clamp_pins():
    pyr = _pyr()
    tid = np.zeros((5,), np.int32)
    v = np.full((5,), 0.5, np.float32)
    lod = np.zeros((5,), np.float32)
    u_out = np.asarray([1.25, 2.25, -0.75, 0.25, 3.0], np.float32)

    rep = sm.sample_trilinear(pyr, tid, u_out, v, lod, np,
                              addr=np.zeros(5, np.int32))
    # repeat: u and u+k sample identically
    assert np.allclose(rep[0], rep[1]) and np.allclose(rep[0], rep[2])
    assert np.allclose(rep[0], rep[3])

    cl = sm.sample_trilinear(pyr, tid, u_out, v, lod, np,
                             addr=np.ones(5, np.int32))
    # clamp: everything past the right edge pins to the edge column
    edge = sm.sample_trilinear(
        pyr, tid[:1], np.asarray([1.0 - 0.5 / 16], np.float32),
        v[:1], lod[:1], np, addr=np.ones(1, np.int32),
    )
    assert np.allclose(cl[0], edge[0]) and np.allclose(cl[4], edge[0])
    # and differs from the repeat result (the test texture is random)
    assert not np.allclose(cl[0], rep[0])

    # interior samples are identical across modes
    interior = sm.sample_trilinear(pyr, tid[3:4], u_out[3:4], v[3:4],
                                   lod[3:4], np)
    assert np.allclose(cl[3], interior[0])
    assert np.allclose(rep[3], interior[0])


def test_addr_none_matches_zero():
    pyr = _pyr()
    tid = np.zeros((4,), np.int32)
    u = np.asarray([0.1, 0.6, 1.2, -0.3], np.float32)
    v = np.asarray([0.2, 0.9, 0.4, 2.5], np.float32)
    lod = np.full((4,), 0.7, np.float32)
    a = sm.sample_trilinear(pyr, tid, u, v, lod, np)
    b = sm.sample_trilinear(pyr, tid, u, v, lod, np,
                            addr=np.zeros(4, np.int32))
    assert (a == b).all()


def test_material_table_addr_column():
    m = Material.table([{"tex_id": 0}, {"tex_id": 1, "tex_addr": 1}])
    assert m.tex_addr is not None and list(m.tex_addr) == [0, 1]
    m2 = Material.table([{"tex_id": 0}, {"tex_id": 1}])
    assert m2.tex_addr is None  # all-wrap scenes trace zero extra ops


def test_mtl_clamp_option(tmp_path):
    from xr.scene.objio import parse_mtl

    p = tmp_path / "m.mtl"
    p.write_text(
        "newmtl a\nKd 1 0 0\nmap_Kd -clamp on tex.png\n"
        "newmtl b\nmap_Kd -blendu off -clamp off other.png\n"
        "newmtl c\nmap_Kd -o 0.1 0.2 0.3 plain.png\n"
    )
    m = parse_mtl(str(p))
    assert m["a"]["clamp"] is True and m["a"]["map_Kd"] == "tex.png"
    assert m["b"]["clamp"] is False and m["b"]["map_Kd"] == "other.png"
    assert "clamp" not in m["c"] and m["c"]["map_Kd"] == "plain.png"


def test_mtl_multiarg_options(tmp_path):
    """2-arg `-mm base gain` must not desync the option scan and eat the
    filename (ADVICE r3); unknown multi-arg options fall back to the last
    token rather than silently losing the texture."""
    from xr.scene.objio import parse_mtl

    p = tmp_path / "m.mtl"
    p.write_text(
        "newmtl a\nmap_Kd -mm 0.1 0.9 tex.png\n"
        "newmtl b\nmap_Kd -bm 2.0 bump.png\n"
        "newmtl c\nmap_Kd -imaginary 1 2 3 weird.png\n"
    )
    m = parse_mtl(str(p))
    assert m["a"]["map_Kd"] == "tex.png"
    assert m["b"]["map_Kd"] == "bump.png"
    assert m["c"]["map_Kd"] == "weird.png"  # last-token fallback


def test_clamp_end_to_end_parity():
    """Device == oracle (<=1 LSB) with a clamped material, end-to-end."""
    from xr.app.renderer import Renderer
    from xr.cpu_ref import render_frame
    from xr.scene.presets import config3_terrain, small_preset

    p = small_preset(config3_terrain(nx=24, nz=24), 128, 96, bin_capacity=4096)
    cam, mm = p.animate(0.3, np)
    scene = p.scene.replace(model_matrices=mm)
    nmat = np.asarray(scene.materials.tex_id).shape[0]
    scene_cl = scene.replace(
        materials=scene.materials.replace(tex_addr=np.ones(nmat, np.int32))
    )
    of = render_frame(scene_cl, cam, p.config)
    r = Renderer(scene_cl, p.config)
    df = r.readback(r.step(scene_cl, cam))
    diff = np.abs(df.color.astype(int) - of.color.astype(int))
    assert diff.max() <= 1
    # and clamping actually changes the image (terrain uvs tile the checker)
    plain = render_frame(scene, cam, p.config)
    assert (plain.color != of.color).any()
