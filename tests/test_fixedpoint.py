"""Unit tests for exact integer coverage: fill-rule watertightness,
orientation, barycentric consistency (SURVEY.md §4.2)."""

import numpy as np

from xr.core import fixedpoint as fp


def _grid(w, h, sub):
    px = np.arange(w, dtype=np.int32) * sub + sub // 2
    py = np.arange(h, dtype=np.int32) * sub + sub // 2
    return np.broadcast_to(px[None, :], (h, w)), np.broadcast_to(py[:, None], (h, w))


def _cov(xs, ys, px, py):
    mask, _ = fp.coverage(np.asarray(xs, np.int32), np.asarray(ys, np.int32), px, py)
    return mask


def test_orientation_sign():
    # world-CCW triangle seen through the y-flip: visually clockwise in
    # y-down coords -> positive doubled area
    xs = np.array([0, 40, 20], np.int32)
    ys = np.array([40, 40, 0], np.int32)  # apex at top (small y)
    assert fp.doubled_area(xs, ys) > 0


def test_area_equals_edge_at_opposite_vertex():
    rng = np.random.default_rng(0)
    for _ in range(100):
        xs = rng.integers(-100, 100, 3).astype(np.int32)
        ys = rng.integers(-100, 100, 3).astype(np.int32)
        area2 = fp.doubled_area(xs, ys)
        a, b = fp.edge_coeffs(xs, ys)
        for k in range(3):
            opp = (k + 2) % 3
            e = fp.edge_at(a[k], b[k], xs[k], ys[k], xs[opp], ys[opp])
            assert e == area2


def test_shared_edge_watertight():
    """Splitting a triangle at an interior point into 3 children must cover
    each parent pixel EXACTLY once (top-left fill rule; SURVEY.md §4.2
    'edge-function sign/tie-break on hand-picked triangles')."""
    rng = np.random.default_rng(1)
    sub = 4
    W = H = 48
    px, py = _grid(W, H, sub)
    for trial in range(200):
        xs = rng.integers(0, W * sub, 3).astype(np.int32)
        ys = rng.integers(0, H * sub, 3).astype(np.int32)
        if fp.doubled_area(xs, ys) < 0:
            xs = xs[[0, 2, 1]]
            ys = ys[[0, 2, 1]]
        if fp.doubled_area(xs, ys) == 0:
            continue
        # interior point via barycentric mix, snapped
        w = rng.dirichlet([2.0, 2.0, 2.0])
        cx = np.int32(np.floor((w * xs).sum() + 0.5))
        cy = np.int32(np.floor((w * ys).sum() + 0.5))
        children = []
        for k in range(3):
            cxs = np.array([xs[k], xs[(k + 1) % 3], cx], np.int32)
            cys = np.array([ys[k], ys[(k + 1) % 3], cy], np.int32)
            children.append((cxs, cys))
        if any(fp.doubled_area(cxs, cys) <= 0 for cxs, cys in children):
            continue  # snapped centroid not strictly interior
        parent = _cov(xs, ys, px, py).astype(np.int32)
        total = np.zeros_like(parent)
        for cxs, cys in children:
            total += _cov(cxs, cys, px, py).astype(np.int32)
        # inside the parent every pixel is covered by exactly one child;
        # outside by none (snapped centroid lies on/in the parent).
        assert (total <= 1).all(), f"double coverage, trial {trial}"
        assert (total == parent).all(), f"hole or leak, trial {trial}"


def test_adjacent_triangles_share_edge_exactly_once():
    """Two triangles forming a quad: the shared diagonal must not double-
    cover or leave holes."""
    sub = 4
    W = H = 32
    px, py = _grid(W, H, sub)
    # quad corners (fixed-point)
    q = np.array([[10, 10], [110, 20], [100, 115], [15, 100]], np.int32)
    t1x = np.array([q[0, 0], q[1, 0], q[2, 0]], np.int32)
    t1y = np.array([q[0, 1], q[1, 1], q[2, 1]], np.int32)
    t2x = np.array([q[0, 0], q[2, 0], q[3, 0]], np.int32)
    t2y = np.array([q[0, 1], q[2, 1], q[3, 1]], np.int32)
    for tx, ty in ((t1x, t1y), (t2x, t2y)):
        assert fp.doubled_area(tx, ty) != 0
    c1 = _cov(t1x if fp.doubled_area(t1x, t1y) > 0 else t1x[[0, 2, 1]],
              t1y if fp.doubled_area(t1x, t1y) > 0 else t1y[[0, 2, 1]], px, py)
    c2 = _cov(t2x if fp.doubled_area(t2x, t2y) > 0 else t2x[[0, 2, 1]],
              t2y if fp.doubled_area(t2x, t2y) > 0 else t2y[[0, 2, 1]], px, py)
    assert not (c1 & c2).any()


def test_barycentrics_sum_to_one_inside():
    xs = np.array([8, 120, 60], np.int32)
    ys = np.array([110, 100, 8], np.int32)
    if fp.doubled_area(xs, ys) < 0:
        xs, ys = xs[[0, 2, 1]], ys[[0, 2, 1]]
    px, py = _grid(32, 32, 4)
    mask, (e0, e1, e2) = fp.coverage(xs, ys, px, py)
    assert mask.any()
    l0, l1, l2 = fp.barycentrics_f32(e0, e1, e2)
    s = (l0 + l1 + l2)[mask]
    np.testing.assert_allclose(s, 1.0, atol=1e-5)
    assert (l0[mask] >= 0).all() and (l1[mask] >= 0).all() and (l2[mask] >= 0).all()


def test_jnp_coverage_parity():
    """Coverage must be bitwise identical between numpy and jax int32 math."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    px, py = _grid(40, 40, 4)
    for _ in range(50):
        xs = rng.integers(0, 160, 3).astype(np.int32)
        ys = rng.integers(0, 160, 3).astype(np.int32)
        if fp.doubled_area(xs, ys) <= 0:
            continue
        m_np, es_np = fp.coverage(xs, ys, px, py, np)
        m_j, es_j = fp.coverage(
            jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(px), jnp.asarray(py), jnp
        )
        assert (np.asarray(m_j) == m_np).all()
        for en, ej in zip(es_np, es_j):
            assert (np.asarray(ej) == en).all()
