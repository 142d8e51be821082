"""3D math: vectors, 4x4 matrices, transform builders.

The reference's math library (``float3/float4/Matrix/Angle``, SURVEY.md §2.1)
as array code. Every function takes ``xp`` (numpy or jax.numpy) so the CPU
oracle and the traced TPU pipeline share ONE set of formulas — coverage and
golden comparisons depend on both sides computing identically (SURVEY.md
§7.3.3).

Conventions (binding; the CPU oracle defines "correct", SURVEY.md §2.3):
  * Column-vector math: p_clip = P @ V @ M @ p_homogeneous.
    Batched on device as (N,4) @ M.T for the MXU (BASELINE.json:5).
  * Right-handed world/view space; the camera looks down -Z in view space.
  * D3D-style clip volume: x,y in [-w, w], z in [0, w] (depth 0 = near,
    1 = far; depth test LESS; depth clear = 1.0).
  * Screen space: x right, y DOWN (top-left origin), pixel centers at +0.5.
    x_screen = (ndc_x * 0.5 + 0.5) * W;  y_screen = (0.5 - ndc_y * 0.5) * H.
  * Front faces: counter-clockwise in world space == positive doubled area
    in y-down screen space (see xr/core/fixedpoint.py).

All math is float32 end-to-end; device matmuls must request highest
precision so the TPU MXU does not downcast to bf16 (SURVEY.md §7.3.3).
"""

from __future__ import annotations

import numpy as np


def normalize(v, xp=np, eps=1e-20):
    n = xp.sqrt(xp.sum(v * v, axis=-1, keepdims=True))
    return v / xp.maximum(n, eps)


def cross(a, b, xp=np):
    return xp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def dot(a, b, xp=np):
    return xp.sum(a * b, axis=-1)


def _mat4(rows, xp):
    return xp.stack([xp.stack(r) for r in rows]).astype(xp.float32)


def identity(xp=np):
    return xp.eye(4, dtype=xp.float32)


def look_at(eye, target, up, xp=np):
    """Right-handed view matrix; camera at `eye` looking at `target`.

    View-space axes: +X right, +Y up, -Z forward (into the scene).
    """
    eye = xp.asarray(eye, xp.float32)
    target = xp.asarray(target, xp.float32)
    up = xp.asarray(up, xp.float32)
    z = normalize(eye - target, xp)  # back
    x = normalize(cross(up, z, xp), xp)  # right
    y = cross(z, x, xp)  # true up
    zero = xp.zeros((), xp.float32)
    one = xp.ones((), xp.float32)
    return _mat4(
        [
            [x[0], x[1], x[2], -dot(x, eye, xp)],
            [y[0], y[1], y[2], -dot(y, eye, xp)],
            [z[0], z[1], z[2], -dot(z, eye, xp)],
            [zero, zero, zero, one],
        ],
        xp,
    )


def perspective(fov_y, aspect, near, far, xp=np):
    """Right-handed perspective projection onto the D3D clip volume.

    Maps view-space z = -near -> depth 0 and z = -far -> depth 1, with
    clip.w = -z_view (positive in front of the camera). Equivalent to
    XMMatrixPerspectiveFovRH.
    """
    fov_y = xp.asarray(fov_y, xp.float32)
    f = xp.asarray(1.0, xp.float32) / xp.tan(fov_y * 0.5)
    near = xp.asarray(near, xp.float32)
    far = xp.asarray(far, xp.float32)
    a = far / (near - far)
    b = near * far / (near - far)
    zero = xp.zeros((), xp.float32)
    return _mat4(
        [
            [f / xp.asarray(aspect, xp.float32), zero, zero, zero],
            [zero, f, zero, zero],
            [zero, zero, a, b],
            [zero, zero, -xp.ones((), xp.float32), zero],
        ],
        xp,
    )


def orthographic(left, right, bottom, top, near, far, xp=np):
    """Right-handed orthographic projection onto the D3D clip volume
    (z = -near -> 0, z = -far -> 1). Used for directional-light shadow
    passes (config 4, BASELINE.json:10)."""
    l, r = float(left), float(right)
    b, t = float(bottom), float(top)
    n, f = float(near), float(far)
    m = np.array(
        [
            [2.0 / (r - l), 0, 0, -(r + l) / (r - l)],
            [0, 2.0 / (t - b), 0, -(t + b) / (t - b)],
            [0, 0, 1.0 / (n - f), n / (n - f)],
            [0, 0, 0, 1.0],
        ],
        np.float32,
    )
    return xp.asarray(m)


def rotation_x(angle, xp=np):
    angle = xp.asarray(angle, xp.float32)
    c, s = xp.cos(angle), xp.sin(angle)
    zero = xp.zeros((), xp.float32)
    one = xp.ones((), xp.float32)
    return _mat4(
        [
            [one, zero, zero, zero],
            [zero, c, -s, zero],
            [zero, s, c, zero],
            [zero, zero, zero, one],
        ],
        xp,
    )


def rotation_y(angle, xp=np):
    angle = xp.asarray(angle, xp.float32)
    c, s = xp.cos(angle), xp.sin(angle)
    zero = xp.zeros((), xp.float32)
    one = xp.ones((), xp.float32)
    return _mat4(
        [
            [c, zero, s, zero],
            [zero, one, zero, zero],
            [-s, zero, c, zero],
            [zero, zero, zero, one],
        ],
        xp,
    )


def rotation_z(angle, xp=np):
    angle = xp.asarray(angle, xp.float32)
    c, s = xp.cos(angle), xp.sin(angle)
    zero = xp.zeros((), xp.float32)
    one = xp.ones((), xp.float32)
    return _mat4(
        [
            [c, -s, zero, zero],
            [s, c, zero, zero],
            [zero, zero, one, zero],
            [zero, zero, zero, one],
        ],
        xp,
    )


def translation(v, xp=np):
    v = xp.asarray(v, xp.float32)
    m = identity(xp)
    if xp is np:
        m = m.copy()
        m[:3, 3] = v
        return m
    return m.at[:3, 3].set(v)


def scaling(v, xp=np):
    v = xp.asarray(v, xp.float32) * xp.ones(3, xp.float32)
    zero = xp.zeros((), xp.float32)
    one = xp.ones((), xp.float32)
    return _mat4(
        [
            [v[0], zero, zero, zero],
            [zero, v[1], zero, zero],
            [zero, zero, v[2], zero],
            [zero, zero, zero, one],
        ],
        xp,
    )


def camera_matrices(camera, aspect, xp=np):
    """(view, proj) for a Camera pytree."""
    view = look_at(camera.eye, camera.target, camera.up, xp)
    proj = perspective(camera.fov_y, aspect, camera.near, camera.far, xp)
    return view, proj


def transform_points(points, matrix, xp=np, precision=None):
    """(N,3) points -> (N,4) clip/world coords via column-vector matrix.

    On device this is the fused MXU matmul of the vertex stage
    (BASELINE.json:5); pass precision='highest' there so fp32 is not
    downcast to bf16 (SURVEY.md §7.3.3).
    """
    n = points.shape[0]
    p4 = xp.concatenate([points, xp.ones((n, 1), xp.float32)], axis=1)
    if precision is not None:
        import jax

        return jax.numpy.matmul(p4, matrix.T, precision=precision)
    return p4 @ matrix.T


def transform_directions(dirs, matrix, xp=np, precision=None):
    """(N,3) directions by the upper-left 3x3 (no translation).

    Correct for rigid + uniform-scale transforms; non-uniform scale would
    need the inverse-transpose (not used by the presets).
    """
    m3 = matrix[:3, :3]
    if precision is not None:
        import jax

        return jax.numpy.matmul(dirs, m3.T, precision=precision)
    return dirs @ m3.T
