"""Property tests for the geometry-transformer kernels (MBC, min rotated
rect) and invariants of the SQL transformer batch."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opengxt_spark import geomlib

coords = st.lists(
    st.tuples(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=3,
    max_size=40,
)


@settings(max_examples=80, deadline=None)
@given(coords)
def test_mbc_contains_all_points(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    cx, cy, r = geomlib.min_bounding_circle(xs, ys)
    d = np.hypot(xs - cx, ys - cy)
    assert (d <= r + 1e-6).all()


@settings(max_examples=80, deadline=None)
@given(coords)
def test_mbc_is_minimal_vs_diameter(pts):
    """r is at least half the max pairwise distance and at most the radius
    of the bbox-circumscribing circle."""
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    cx, cy, r = geomlib.min_bounding_circle(xs, ys)
    dmax = 0.0
    for i in range(len(xs)):
        d = np.hypot(xs - xs[i], ys - ys[i]).max()
        dmax = max(dmax, float(d))
    assert r >= dmax / 2.0 - 1e-6
    bbox_r = 0.5 * math.hypot(xs.max() - xs.min(), ys.max() - ys.min())
    assert r <= bbox_r + 1e-6


def test_mbc_brute_force_small():
    """Exact check against O(n^3) brute force on fixed small sets."""
    rng = np.random.RandomState(7)
    for _ in range(20):
        xs = rng.uniform(0, 50, 12)
        ys = rng.uniform(0, 50, 12)
        cx, cy, r = geomlib.min_bounding_circle(xs, ys)
        best = None
        n = len(xs)
        cands = []
        for i in range(n):
            for j in range(i + 1, n):
                cands.append(geomlib._circle_2((xs[i], ys[i]), (xs[j], ys[j])))
                for k in range(j + 1, n):
                    c3 = geomlib._circle_3(
                        (xs[i], ys[i]), (xs[j], ys[j]), (xs[k], ys[k])
                    )
                    if c3 is not None:
                        cands.append(c3)
        for c in cands:
            if ((xs - c[0]) ** 2 + (ys - c[1]) ** 2 <= c[2] * (1 + 1e-9) + 1e-9).all():
                if best is None or c[2] < best[2]:
                    best = c
        assert best is not None
        assert abs(r - math.sqrt(best[2])) < 1e-6


@settings(max_examples=80, deadline=None)
@given(coords)
def test_mrr_contains_and_bounded(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    area, ang, w, h = geomlib.min_rotated_rect(xs, ys)
    bbox_area = (xs.max() - xs.min()) * (ys.max() - ys.min())
    # minimal rotated rect never beats... never exceeds the axis bbox
    assert area <= bbox_area + 1e-6
    assert w >= h - 1e-12
    # every point fits inside the (w x h) rect at angle ang
    ux, uy = math.cos(ang), math.sin(ang)
    pu = xs * ux + ys * uy
    pv = -xs * uy + ys * ux
    eu = pu.max() - pu.min()
    ev = pv.max() - pv.min()
    assert max(eu, ev) <= w + 1e-6 and min(eu, ev) <= h + 1e-6


def test_transformer_invariants(spark, sf_dir):
    from opengxt_spark import transforms_geom, world

    segs = world.load_layer(spark, sf_dir, "lines_orders")
    n = segs.count()

    # flip twice = identity (rounded)
    flip2 = transforms_geom.flip_lines(
        transforms_geom.flip_lines(segs).selectExpr(
            "lid", "x1", "y1", "x2", "y2"
        )
    )
    orig = {r["lid"]: (round(r["x1"], 6), round(r["y1"], 6)) for r in segs.collect()}
    for r in flip2.collect():
        assert orig[r["lid"]] == (r["x1"], r["y1"])

    # densify: consecutive vertex spacing <= tolerance (+eps)
    dense = transforms_geom.densify(segs, tolerance=15.0).collect()
    by_lid: dict = {}
    for r in dense:
        by_lid.setdefault(r["lid"], []).append((r["i"], r["vx"], r["vy"]))
    for lid, vs in by_lid.items():
        vs.sort()
        for (i0, x0, y0), (i1, x1, y1) in zip(vs, vs[1:]):
            assert math.hypot(x1 - x0, y1 - y0) <= 15.0 + 1e-4

    # split pieces chain head-to-tail and cover the segment
    pieces = transforms_geom.split_line_by_distance(segs, 20.0).collect()
    by_lid2: dict = {}
    for r in pieces:
        by_lid2.setdefault(r["lid"], []).append(r)
    for lid, ps in by_lid2.items():
        ps.sort(key=lambda r: r["piece"])
        for a, b in zip(ps, ps[1:]):
            assert (a["px2"], a["py2"]) == (b["px1"], b["py1"])

    # vertices_to_points: exactly 2n rows
    assert transforms_geom.vertices_to_points(segs).count() == 2 * n


def test_mbc_operator_brute(spark, sf_dir):
    from opengxt_spark import transforms_geom, world

    pts = world.points_events(spark, sf_dir)
    out = {r["cat"]: r for r in transforms_geom.min_bounding_circles(pts).collect()}
    rows = pts.select("cat", "x", "y").collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["cat"], []).append((r["x"], r["y"]))
    for cat, ps in groups.items():
        xs = np.array([p[0] for p in ps])
        ys = np.array([p[1] for p in ps])
        cx, cy, r = geomlib.min_bounding_circle(xs, ys)
        got = out[cat]
        assert abs(got["mbc_r"] - round(r, 6)) < 1e-6
        d = np.hypot(xs - got["mbc_x"], ys - got["mbc_y"])
        assert (d <= got["mbc_r"] + 1e-4).all()


def test_ring_map_dressing_contract(spark, sf_dir):
    """Dressed ring map: 8 sectors x 3 rings x 21 closed-polygon vertices,
    sector->cat is a bijection, and ring-1 values equal the per-category
    rect counts (the value-field contract of RingMapsOperation)."""
    from opengxt_spark import transforms_geom as tg, world

    world.register_tables(spark, sf_dir)
    rows = tg.ring_map_dressing(spark).collect()
    assert len(rows) == 8 * 3 * 21
    by_cell = {}
    sec2cat = {}
    for r in rows:
        by_cell.setdefault((r["sector"], r["ring"]), []).append(r)
        sec2cat.setdefault(r["sector"], set()).add(r["cat"])
    assert len(by_cell) == 24
    assert sorted(c for s in sec2cat.values() for c in s) == list(range(8))
    for cell in by_cell.values():
        cell.sort(key=lambda r: r["seq"])
        assert len(cell) == 21
        assert (cell[0]["vx"], cell[0]["vy"]) == (cell[-1]["vx"], cell[-1]["vy"])
    counts = {
        r["cat"]: r["cnt"]
        for r in spark.sql(
            "SELECT rid % 8 AS cat, COUNT(*) AS cnt FROM ("
            + world.LAYER_SQL["rects_customer"]
            + ") GROUP BY rid % 8"
        ).collect()
    }
    for r in rows:
        if r["ring"] == 1:
            assert r["val"] == counts[r["cat"]]
    anchors = tg.ring_map_anchors(spark).collect()
    assert len(anchors) == 8
    assert sorted(a["cat"] for a in anchors) == list(range(8))


def test_circle_map_contract(spark, sf_dir):
    """CircleMap: 8 value-scaled 33-vertex circles on distinct perimeter
    slots; radii within [minRadius, maxRadius]; the largest-count category
    gets the largest circle; anchors end exactly r_adj from slot center."""
    import math

    from opengxt_spark import transforms_geom as tg, world

    world.register_tables(spark, sf_dir)
    rows = tg.circle_map(spark).collect()
    assert len(rows) == 8 * 33
    mx, mn = tg._cm_radii()
    by = {}
    for r in rows:
        by.setdefault((r["slot"], r["cat"]), []).append(r)
        assert mn - 1e-6 <= r["r_circle"] <= mx + 1e-6
    assert len(by) == 8
    assert sorted(s for s, _ in by) == list(range(8))
    assert sorted(c for _, c in by) == list(range(8))
    vals = {c: (rs[0]["val"], rs[0]["r_circle"]) for (_, c), rs in by.items()}
    vmax_cat = max(vals, key=lambda c: (vals[c][0], -c))
    assert vals[vmax_cat][1] == max(r for _, r in vals.values())
    for cell in by.values():
        cell.sort(key=lambda r: r["seq"])
        assert (cell[0]["vx"], cell[0]["vy"]) == (cell[-1]["vx"], cell[-1]["vy"])
    slots = {s: (x, y) for s, (x, y) in enumerate(tg._cm_slots())}
    radii = {s: rs[0]["r_circle"] for (s, _), rs in by.items()}
    for a in tg.circle_map(spark, anchors=True).collect():
        sx, sy = slots[a["slot"]]
        d = math.hypot(a["x2"] - sx, a["y2"] - sy)
        assert abs(d - radii[a["slot"]]) < 1e-4, (a, d)
