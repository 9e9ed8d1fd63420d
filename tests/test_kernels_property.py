"""Hypothesis property tests for the pure numpy/python kernels.

No Spark session — these check the algorithmic kernels the distributed
operators delegate to (SURVEY.md §5.2 property-test plan).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opengxt_spark.classify import jenks_breaks
from opengxt_spark.geomlib import (
    convex_hull,
    douglas_peucker,
    point_in_polygon,
    shoelace_area,
)

coords = st.floats(
    min_value=-1000.0, max_value=1000.0, allow_nan=False, allow_infinity=False
)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 50)),
        min_size=6, max_size=40, unique_by=lambda t: t[0],
    ),
    st.integers(2, 5),
)
def test_jenks_is_no_worse_than_any_random_quantile_split(hist, k):
    if len(hist) <= k:
        return
    brks = jenks_breaks(hist, k)
    assert len(brks) == k - 1
    assert brks == sorted(brks)

    def sse(breaks):
        groups: dict[int, list[tuple[int, int]]] = {}
        for v, c in hist:
            cls = sum(1 for b in breaks if v > b)
            groups.setdefault(cls, []).append((v, c))
        tot = 0.0
        for vs in groups.values():
            w = sum(c for _, c in vs)
            m = sum(v * c for v, c in vs) / w
            tot += sum(c * (v - m) ** 2 for v, c in vs)
        return tot

    # compare against the equal-count quantile split of distinct values
    vals = sorted(v for v, _ in hist)
    q = [vals[len(vals) * (i + 1) // k - 1] for i in range(k - 1)]
    assert sse(brks) <= sse(q) + 1e-7


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=60))
def test_douglas_peucker_keeps_endpoints_and_subsequence(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    kx, ky = douglas_peucker(xs, ys, tol=5.0)
    # endpoints survive
    assert kx[0] == xs[0] and ky[0] == ys[0]
    assert kx[-1] == xs[-1] and ky[-1] == ys[-1]
    # output is an ordered subsequence of the input
    j = 0
    for x, y in zip(kx, ky):
        while j < len(xs) and not (xs[j] == x and ys[j] == y):
            j += 1
        assert j < len(xs)
        j += 1
    # idempotence: simplifying the simplified line changes nothing
    k2x, k2y = douglas_peucker(kx, ky, tol=5.0)
    assert len(k2x) == len(kx)


@settings(max_examples=30, deadline=None)
@given(st.lists(coords, min_size=3, max_size=30), st.floats(0.1, 10.0))
def test_douglas_peucker_collinear_collapses(ts, slope):
    ts = sorted(set(ts))
    if len(ts) < 3:
        return
    xs = np.array(ts)
    ys = xs * slope
    kx, ky = douglas_peucker(xs, ys, tol=1e-6)
    assert len(kx) == 2


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=50))
def test_convex_hull_contains_all_points(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    hx, hy = convex_hull(xs, ys)
    if len(hx) < 3:
        return  # degenerate (collinear) input
    # every input point inside or within eps of the hull boundary: for a CCW
    # convex polygon, inside-with-tolerance means every edge's cross product
    # is >= -eps * |edge| (perpendicular distance to the edge line >= -eps).
    # This is robust for sliver hulls where centroid dilation is anisotropic.
    scale = max(1.0, float(np.max(np.abs(hx))), float(np.max(np.abs(hy))))
    eps = 1e-9 * scale + 1e-12
    nv = len(hx)
    for x, y in pts:
        ok = True
        for i in range(nv):
            ax, ay = hx[i], hy[i]
            bx, by = hx[(i + 1) % nv], hy[(i + 1) % nv]
            cross = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
            if cross < -eps * max(math.hypot(bx - ax, by - ay), 1e-300):
                ok = False
                break
        assert ok, (x, y, list(zip(hx, hy)))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=30))
def test_hull_area_at_least_any_triangle(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    hx, hy = convex_hull(xs, ys)
    if len(hx) < 3:
        return
    hull_area = abs(shoelace_area(hx, hy))
    tri = abs(shoelace_area(xs[:3], ys[:3]))
    assert hull_area >= tri - 1e-6


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-10_000, 10_000_000), st.integers(1, 1000)),
        min_size=1, max_size=2000, unique_by=lambda t: t[0],
    ),
    st.integers(4, 64),
)
def test_quantize_hist_bound_and_mass(hist, bins):
    from opengxt_spark.classify import quantize_hist

    q = quantize_hist(hist, bins)
    # hard bound — the in-code guarantee that keeps the driver DP constant
    assert len(q) <= bins
    # total count preserved; representatives are real data values; sorted
    assert sum(c for _, c in q) == sum(c for _, c in hist)
    vals = {v for v, _ in hist}
    assert all(v in vals for v, _ in q)
    assert q == sorted(q)
    # identity when it already fits
    if len(hist) <= bins:
        assert q == sorted(hist)
