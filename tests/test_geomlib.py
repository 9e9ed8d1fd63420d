"""Generic numpy geometry kernel tests + agreement with the closed-form path."""

from __future__ import annotations

import math

import numpy as np

from opengxt_spark import geomlib, joins, world


def test_shoelace_and_centroid():
    xs = np.array([0.0, 4.0, 4.0, 0.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0])
    assert geomlib.shoelace_area(xs, ys) == 8.0
    cx, cy = geomlib.centroid(xs, ys)
    assert math.isclose(cx, 2.0) and math.isclose(cy, 1.0)


def test_pip_raycast_simple():
    xs = np.array([0.0, 4.0, 4.0, 0.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0])
    px = np.array([1.0, 5.0, 3.9, -0.1])
    py = np.array([1.0, 1.0, 1.9, 0.5])
    assert geomlib.points_in_polygon(px, py, xs, ys).tolist() == [
        True, False, True, False,
    ]


def test_convex_hull_square_plus_inner():
    xs = np.array([0.0, 2.0, 2.0, 0.0, 1.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0, 1.0])
    hx, hy = geomlib.convex_hull(xs, ys)
    assert len(hx) == 4
    assert geomlib.shoelace_area(hx, hy) == 4.0


def test_douglas_peucker_collinear():
    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = np.array([0.0, 0.001, 0.0, -0.001, 0.0])
    sx, sy = geomlib.douglas_peucker(xs, ys, tol=0.01)
    assert len(sx) == 2  # everything within tolerance of the chord
    sx2, _ = geomlib.douglas_peucker(xs, ys, tol=0.0005)
    assert len(sx2) >= 4


def test_generic_pip_matches_closed_form(spark, sf_dir):
    """The Arrow ray-cast path must agree with the JVM closed-form path.

    Boundary semantics differ (closed form is edge-inclusive, ray casting
    is half-open), so points exactly on a rect edge are excluded from the
    comparison; with millicoordinate geometry those are rare and detected
    exactly.
    """
    pts = world.points_events(spark, sf_dir)
    rects = world.rects_customer(spark, sf_dir)
    closed = {r.rid: r.cnt for r in joins.pip_count_join(pts, rects).collect()}
    generic = {
        r.rid: r.cnt
        for r in geomlib.generic_pip_count(
            pts, geomlib.rects_to_polygons(rects)
        ).collect()
    }
    # count boundary points per rect (exact arithmetic on collected rows)
    prows = [(p.x, p.y) for p in pts.collect()]
    boundary: dict[int, int] = {}
    for rr in rects.collect():
        x0, x1 = rr.cx - rr.hw, rr.cx + rr.hw
        y0, y1 = rr.cy - rr.hh, rr.cy + rr.hh
        b = sum(
            1
            for x, y in prows
            if (x in (x0, x1) and y0 <= y <= y1)
            or (y in (y0, y1) and x0 <= x <= x1)
        )
        if b:
            boundary[rr.rid] = b
    for rid, cnt in closed.items():
        g = generic.get(rid, 0)
        tol = boundary.get(rid, 0)
        assert abs(cnt - g) <= tol, (rid, cnt, g, tol)
    assert sum(closed.values()) > 0
