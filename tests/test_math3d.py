"""Unit tests: matrix builders vs known values (SURVEY.md §4.2)."""

import numpy as np

from xr.core import math3d as m3


def _project(p, view, proj):
    clip = proj @ view @ np.append(np.asarray(p, np.float32), 1.0)
    return clip[:3] / clip[3], clip[3]


def test_look_at_axes():
    view = m3.look_at((0, 0, 5), (0, 0, 0), (0, 1, 0))
    # camera at +5z looking at origin: origin maps to (0,0,-5) view space
    v = view @ np.array([0, 0, 0, 1], np.float32)
    np.testing.assert_allclose(v, [0, 0, -5, 1], atol=1e-6)
    # +x world stays +x (right), +y stays +y (up)
    v = view @ np.array([1, 0, 0, 1], np.float32)
    np.testing.assert_allclose(v[:3], [1, 0, -5], atol=1e-6)
    v = view @ np.array([0, 1, 0, 1], np.float32)
    np.testing.assert_allclose(v[:3], [0, 1, -5], atol=1e-6)


def test_perspective_depth_range():
    view = m3.look_at((0, 0, 0), (0, 0, -1), (0, 1, 0))
    proj = m3.perspective(np.deg2rad(60.0), 1.0, 1.0, 10.0)
    ndc_near, w_near = _project((0, 0, -1.0), view, proj)
    ndc_far, w_far = _project((0, 0, -10.0), view, proj)
    assert abs(ndc_near[2] - 0.0) < 1e-6  # near plane -> depth 0 (D3D)
    assert abs(ndc_far[2] - 1.0) < 1e-6  # far plane -> depth 1
    assert w_near > 0 and w_far > 0  # w = view distance
    assert abs(w_near - 1.0) < 1e-6 and abs(w_far - 10.0) < 1e-6


def test_perspective_fov():
    # point at the top edge of the frustum maps to ndc_y = +1
    fov = np.deg2rad(90.0)
    proj = m3.perspective(fov, 1.0, 0.5, 100.0)
    view = m3.identity()
    y = np.tan(fov / 2) * 2.0  # at depth 2
    ndc, _ = _project((0, y, -2.0), view, proj)
    np.testing.assert_allclose(ndc[1], 1.0, atol=1e-5)


def test_rotations_compose():
    r = m3.rotation_y(np.pi / 2)
    v = r @ np.array([1, 0, 0, 1], np.float32)
    np.testing.assert_allclose(v[:3], [0, 0, -1], atol=1e-6)
    r = m3.rotation_x(np.pi / 2)
    v = r @ np.array([0, 1, 0, 1], np.float32)
    np.testing.assert_allclose(v[:3], [0, 0, 1], atol=1e-6)
    r = m3.rotation_z(np.pi / 2)
    v = r @ np.array([1, 0, 0, 1], np.float32)
    np.testing.assert_allclose(v[:3], [0, 1, 0], atol=1e-6)


def test_orthographic_range():
    proj = m3.orthographic(-2, 2, -2, 2, 1.0, 5.0)
    ndc, _ = _project((0, 0, -1.0), m3.identity(), proj)
    assert abs(ndc[2]) < 1e-6
    ndc, _ = _project((0, 0, -5.0), m3.identity(), proj)
    assert abs(ndc[2] - 1.0) < 1e-6
    ndc, _ = _project((2, -2, -3.0), m3.identity(), proj)
    np.testing.assert_allclose(ndc[:2], [1.0, -1.0], atol=1e-6)


def test_jax_numpy_parity():
    import jax.numpy as jnp

    vn = m3.look_at((1, 2, 3), (0, 0.5, 0), (0, 1, 0), np)
    vj = np.asarray(m3.look_at((1, 2, 3), (0, 0.5, 0), (0, 1, 0), jnp))
    np.testing.assert_allclose(vn, vj, atol=1e-6)
    pn = m3.perspective(1.1, 1.5, 0.3, 50.0, np)
    pj = np.asarray(m3.perspective(1.1, 1.5, 0.3, 50.0, jnp))
    np.testing.assert_allclose(pn, pj, atol=1e-6)
