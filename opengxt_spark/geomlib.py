"""Generic vectorized geometry kernel (numpy) — the non-parametric path.

The synthetic world's rects/hexes have closed-form predicates that stay in
the JVM (world.py); real deployments also need arbitrary polygons. This
module stores polygons as coordinate arrays (xs: array<double>,
ys: array<double>, closed implicitly) and implements the geometry kernels
in numpy for use inside Arrow-batched pandas UDFs — the role Shapely 2.x
plays in SURVEY.md §7.0 (not installed in this container).

Kernels: ray-casting point-in-polygon, shoelace area, centroid, convex hull
(Andrew monotone chain), Douglas-Peucker simplification, bbox. The
distributed shape is identical to the parametric path: cell-cover explode
on bbox (JVM) -> cell join -> refine via ``pip_refine_udf`` (Arrow batch).

Reference parity: ray-cast refine <- the exact-predicate stage of
GXTSimpleFeatureCollection.java:73-76; shoelace <- AreaCalculation
FeatureCollection.java:43; DP-simplify <- SimplifyFeatureCollection.java:42;
hull <- ConvexHullFeatureCollection.java:44.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def point_in_polygon(px: float, py: float, xs: np.ndarray, ys: np.ndarray) -> bool:
    """Ray casting (crossing number), boundary-inclusive on horizontal rule."""
    inside = False
    n = len(xs)
    j = n - 1
    for i in range(n):
        if (ys[i] > py) != (ys[j] > py):
            xint = (xs[j] - xs[i]) * (py - ys[i]) / (ys[j] - ys[i]) + xs[i]
            if px < xint:
                inside = not inside
        j = i
    return inside


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Vectorized ray casting: many points vs one polygon."""
    inside = np.zeros(len(px), dtype=bool)
    n = len(xs)
    j = n - 1
    for i in range(n):
        yi, yj = ys[i], ys[j]
        cond = (yi > py) != (yj > py)
        if cond.any():
            xint = (xs[j] - xs[i]) * (py[cond] - yi) / (yj - yi) + xs[i]
            flip = np.zeros(len(px), dtype=bool)
            flip[cond] = px[cond] < xint
            inside ^= flip
        j = i
    return inside


def shoelace_area(xs: np.ndarray, ys: np.ndarray) -> float:
    return 0.5 * abs(float(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))))


def centroid(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float]:
    """Polygon centroid (area-weighted)."""
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    cross = xs * y1 - x1 * ys
    a = cross.sum() / 2.0
    if a == 0:
        return float(xs.mean()), float(ys.mean())
    cx = float(((xs + x1) * cross).sum() / (6.0 * a))
    cy = float(((ys + y1) * cross).sum() / (6.0 * a))
    return cx, cy


def convex_hull(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Andrew monotone chain; returns hull vertices CCW."""
    pts = np.unique(np.column_stack([xs, ys]), axis=0)
    if len(pts) <= 2:
        return pts[:, 0], pts[:, 1]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return hull[:, 0], hull[:, 1]


def douglas_peucker(
    xs: np.ndarray, ys: np.ndarray, tol: float
) -> tuple[np.ndarray, np.ndarray]:
    """Iterative Douglas-Peucker polyline simplification."""
    n = len(xs)
    if n < 3:
        return xs, ys
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e <= s + 1:
            continue
        dx, dy = xs[e] - xs[s], ys[e] - ys[s]
        # sqrt(dx*dx + dy*dy), not hypot: IEEE *,+,sqrt are correctly
        # rounded, so this exact form is reproducible in engine SQL
        # (the simplify_dp DuckDB oracle mirrors it bit-for-bit).
        seg = np.sqrt(dx * dx + dy * dy)
        if seg == 0:
            ex, ey = xs[s + 1 : e] - xs[s], ys[s + 1 : e] - ys[s]
            d = np.sqrt(ex * ex + ey * ey)
        else:
            d = np.abs(
                dy * xs[s + 1 : e] - dx * ys[s + 1 : e] + xs[e] * ys[s] - ys[e] * xs[s]
            ) / seg
        imax = int(np.argmax(d))
        if d[imax] > tol:
            k = s + 1 + imax
            keep[k] = True
            stack += [(s, k), (k, e)]
    return xs[keep], ys[keep]


# ---------------------------------------------------------------------------
# Spark integration: generic polygon layer + PIP refine UDF
# ---------------------------------------------------------------------------

POLY_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType()),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)


def rects_to_polygons(rects: DataFrame) -> DataFrame:
    """Convert the parametric rect layer to explicit vertex polygons —
    the bridge used by tests to prove the generic path agrees with the
    closed-form path."""
    return rects.select(
        "rid",
        F.expr("array(cx - hw, cx + hw, cx + hw, cx - hw)").alias("xs"),
        F.expr("array(cy - hh, cy - hh, cy + hh, cy + hh)").alias("ys"),
        F.expr("cx - hw").alias("xmin"),
        F.expr("cx + hw").alias("xmax"),
        F.expr("cy - hh").alias("ymin"),
        F.expr("cy + hh").alias("ymax"),
    )


def generic_pip_count(
    points: DataFrame, polygons: DataFrame, cell_size: float = 25.0
) -> DataFrame:
    """Point-in-polygon count against ARBITRARY vertex polygons.

    Same plan as joins.pip_count_join but the refine stage is an
    Arrow-batched ray-cast over the candidate pairs (grouped per polygon so
    the inner loop is vectorized over that polygon's candidate points).
    """
    from . import cells, planner

    p = cells.with_point_cells(
        planner.ensure_parallelism(points.select("pid", "x", "y")),
        cell_size=cell_size,
    )
    g = cells.explode_extent_cells(polygons, cell_size=cell_size)
    cand = p.join(F.broadcast(g), on=["cell_x", "cell_y"], how="inner").where(
        "x >= xmin AND x <= xmax AND y >= ymin AND y <= ymax"
    )

    out_schema = T.StructType(
        [T.StructField("rid", T.LongType()), T.StructField("cnt", T.LongType())]
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            counts: dict[int, int] = {}
            for rid, grp in pdf.groupby("rid"):
                xs = np.asarray(grp["xs"].iloc[0], dtype=np.float64)
                ys = np.asarray(grp["ys"].iloc[0], dtype=np.float64)
                inside = points_in_polygon(
                    grp["x"].to_numpy(), grp["y"].to_numpy(), xs, ys
                )
                counts[rid] = counts.get(rid, 0) + int(inside.sum())
            yield pd.DataFrame(
                {"rid": list(counts), "cnt": list(counts.values())}
            )

    partial = cand.mapInPandas(refine, schema=out_schema)
    return partial.groupBy("rid").agg(F.sum("cnt").cast("long").alias("cnt"))


# ---------------------------------------------------------------------------
# Minimum bounding circle (Welzl over hull) and minimum rotated rectangle
# (rotating calipers) — FeatureToMinimumBoundingCircleProcess /
# FeatureToMinimumRectangleProcess (GT/transformation/
# MinimumBoundingCircleFeatureCollection.java:46,
# MinimumRectangleFeatureCollection.java:46)
# ---------------------------------------------------------------------------


def _circle_2(p, q):
    cx, cy = (p[0] + q[0]) / 2.0, (p[1] + q[1]) / 2.0
    r2 = ((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2) / 4.0
    return cx, cy, r2


def _circle_3(p, q, r):
    ax, ay = p
    bx, by = q
    cx, cy = r
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0:
        return None
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def _in_circle(c, p, tol2=0.0):
    # tol2 is an absolute slack on SQUARED distance, sized by the caller from
    # the data span (a fixed absolute epsilon silently swallows micro-scale
    # geometry: span 1e-5 gives d^2 ~ 1e-10, far below any fixed 1e-9).
    return (p[0] - c[0]) ** 2 + (p[1] - c[1]) ** 2 <= c[2] * (1.0 + 1e-12) + tol2


def min_bounding_circle(
    xs: np.ndarray, ys: np.ndarray
) -> tuple[float, float, float]:
    """Exact minimum enclosing circle (cx, cy, radius).

    Only convex-hull vertices can support the circle, so reduce to the hull
    first (bounds Welzl's move-to-front loop to O(h^2), h = hull size —
    deterministic, no RNG, matching the engine's reproducibility contract).
    """
    hx, hy = convex_hull(xs, ys)
    pts = list(zip(hx.tolist(), hy.tolist()))
    if not pts:
        return 0.0, 0.0, 0.0
    if len(pts) == 1:
        return pts[0][0], pts[0][1], 0.0
    span = max(float(hx.max() - hx.min()), float(hy.max() - hy.min()))
    tol2 = (1e-9 * span) ** 2
    c = _circle_2(pts[0], pts[1])
    for i, p in enumerate(pts):
        if _in_circle(c, p, tol2):
            continue
        c = (p[0], p[1], 0.0)
        for j, q in enumerate(pts[:i]):
            if _in_circle(c, q, tol2):
                continue
            c = _circle_2(p, q)
            for r in pts[:j]:
                if _in_circle(c, r, tol2):
                    continue
                c3 = _circle_3(p, q, r)
                if c3 is not None:
                    c = c3
    return c[0], c[1], float(np.sqrt(c[2]))


def min_rotated_rect(
    xs: np.ndarray, ys: np.ndarray
) -> tuple[float, float, float, float]:
    """Minimum-area rotated rectangle via rotating calipers over the hull.
    Returns (area, angle_rad, width, height) with width >= height."""
    hx, hy = convex_hull(xs, ys)
    n = len(hx)
    if n == 0:
        return 0.0, 0.0, 0.0, 0.0
    if n <= 2:
        w = float(np.hypot(hx.max() - hx.min(), hy.max() - hy.min()))
        ang = 0.0 if n < 2 else float(np.arctan2(hy[-1] - hy[0], hx[-1] - hx[0]))
        return 0.0, ang, w, 0.0
    best = None
    for i in range(n):
        dx, dy = hx[(i + 1) % n] - hx[i], hy[(i + 1) % n] - hy[i]
        ln = np.hypot(dx, dy)
        if ln == 0:
            continue
        ux, uy = dx / ln, dy / ln
        proj_u = hx * ux + hy * uy
        proj_v = -hx * uy + hy * ux
        w = float(proj_u.max() - proj_u.min())
        h = float(proj_v.max() - proj_v.min())
        area = w * h
        if best is None or area < best[0]:
            best = (area, float(np.arctan2(uy, ux)), max(w, h), min(w, h))
    return best


# ---------------------------------------------------------------------------
# Delaunay triangulation (Bowyer-Watson) + alpha-shape concave hull —
# DelaunayTriangulationProcess (GT/operations/DelaunayTrangulationOperation
# .java:51) and ConcaveHullProcess (GT/operations/ConcaveHullOperation
# .java:57). Global-topology kernels run per feature group inside
# applyInPandas (SURVEY §7.4's sanctioned grouped-kernel path); insertion
# order is the (x, y) sort, so results are deterministic.
# ---------------------------------------------------------------------------


def delaunay(xs: np.ndarray, ys: np.ndarray):
    """Bowyer-Watson Delaunay triangulation. Returns (n x 3) int array of
    point indices (into the sorted-unique point set) per triangle, plus the
    sorted points. Vectorized in-circumcircle test per insertion."""
    pts = np.unique(np.column_stack([xs, ys]), axis=0)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64), pts
    # Super-triangle enclosing everything. The multiplier must dominate the
    # largest circumradius any real triangle can have (near-collinear point
    # triples produce huge circumcircles; a too-small super-triangle then
    # sits inside them and the cavity repair drops hull-adjacent
    # triangles). 1e4 x extent covers triples down to ~1e-4-relative
    # collinearity while keeping the incircle determinant inside double
    # precision.
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    m = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 1e4
    sp = np.array([[cx - 2 * m, cy - m], [cx + 2 * m, cy - m], [cx, cy + 2 * m]])
    allp = np.vstack([pts, sp])
    tris = [(n, n + 1, n + 2)]
    for i in range(n):
        px, py = pts[i]
        t = np.array(tris, dtype=np.int64)
        ax, ay = allp[t[:, 0], 0], allp[t[:, 0], 1]
        bx, by = allp[t[:, 1], 0], allp[t[:, 1], 1]
        cx2, cy2 = allp[t[:, 2], 0], allp[t[:, 2], 1]
        # in-circumcircle via the 3x3 determinant (sign-corrected for
        # orientation); positive => p inside
        adx, ady = ax - px, ay - py
        bdx, bdy = bx - px, by - py
        cdx, cdy = cx2 - px, cy2 - py
        d = (
            (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
            - (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady)
            + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
        )
        orient = (bx - ax) * (cy2 - ay) - (cx2 - ax) * (by - ay)
        bad = np.where(np.sign(orient) * d > 0)[0]
        if len(bad) == 0:
            continue
        # boundary of the bad-triangle cavity = edges appearing once
        edges: dict[tuple[int, int], int] = {}
        for bi in bad:
            a, b, c = tris[bi]
            for e in ((a, b), (b, c), (c, a)):
                k = (min(e), max(e))
                edges[k] = edges.get(k, 0) + 1
        for bi in sorted(bad, reverse=True):
            tris.pop(bi)
        for (a, b), cnt in edges.items():
            if cnt == 1:
                tris.append((a, b, i))
    out = [t for t in tris if max(t) < n]
    return np.array(sorted(out), dtype=np.int64), pts


def tri_metrics(tris: np.ndarray, pts: np.ndarray):
    """(areas, circumradii) per triangle — exact double arithmetic."""
    if len(tris) == 0:
        return np.empty(0), np.empty(0)
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        c[:, 0] - a[:, 0]
    ) * (b[:, 1] - a[:, 1])
    areas = 0.5 * np.abs(cross)
    la = np.hypot(b[:, 0] - c[:, 0], b[:, 1] - c[:, 1])
    lb = np.hypot(a[:, 0] - c[:, 0], a[:, 1] - c[:, 1])
    lc = np.hypot(a[:, 0] - b[:, 0], a[:, 1] - b[:, 1])
    with np.errstate(divide="ignore", invalid="ignore"):
        circum = (la * lb * lc) / (4.0 * np.maximum(areas, 1e-300))
    return areas, circum


def alpha_shape_metrics(
    xs: np.ndarray, ys: np.ndarray, alpha: float
) -> tuple[float, int, int]:
    """Concave hull as the alpha-shape: keep Delaunay triangles with
    circumradius <= alpha; returns (kept_area, n_kept, n_boundary_edges).
    The boundary edges are those used by exactly one kept triangle."""
    tris, pts = delaunay(xs, ys)
    areas, circum = tri_metrics(tris, pts)
    keep = circum <= alpha
    kept = tris[keep]
    edges: dict[tuple[int, int], int] = {}
    for a, b, c in kept:
        for e in ((a, b), (b, c), (c, a)):
            k = (min(e), max(e))
            edges[k] = edges.get(k, 0) + 1
    boundary = sum(1 for v in edges.values() if v == 1)
    return float(areas[keep].sum()), int(keep.sum()), boundary


# ---------------------------------------------------------------------------
# Thiessen (Voronoi) cells — ThiessenPolygonProcess (GT/operations/
# ThiessenPolygonOperation.java:88-103: JTS VoronoiDiagramBuilder with the
# clip envelope expanded by 20% of the point bounds). Exact per-point cell
# by iterated half-plane clipping of the clip rectangle against the
# perpendicular bisector of (p, q) for every other site q — O(n) clips of
# an O(1)-vertex polygon per site, O(n^2) per group; runs per feature
# group inside applyInPandas (the raster discrete_voronoi remains the
# global-scale path, SURVEY §7.4).
# ---------------------------------------------------------------------------


def _clip_halfplane(poly: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Sutherland-Hodgman clip of polygon (n x 2) to a*x + b*y <= c."""
    n = len(poly)
    if n == 0:
        return poly
    out = []
    for i in range(n):
        p, q = poly[i], poly[(i + 1) % n]
        fp = a * p[0] + b * p[1] - c
        fq = a * q[0] + b * q[1] - c
        if fp <= 0:
            out.append(p)
        if (fp < 0 < fq) or (fq < 0 < fp):
            t = fp / (fp - fq)
            out.append(p + t * (q - p))
    return np.asarray(out) if out else np.empty((0, 2))


def voronoi_cell(
    i: int, xs: np.ndarray, ys: np.ndarray,
    bbox: tuple[float, float, float, float],
) -> np.ndarray:
    """Voronoi cell of site i within bbox as an (m x 2) vertex array."""
    x0, y0, x1, y1 = bbox
    poly = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)
    px, py = xs[i], ys[i]
    for j in range(len(xs)):
        if j == i:
            continue
        qx, qy = xs[j], ys[j]
        # half-plane closer to p than q: (q-p).v <= (|q|^2-|p|^2)/2
        a, b = qx - px, qy - py
        c = (qx * qx + qy * qy - px * px - py * py) / 2.0
        poly = _clip_halfplane(poly, a, b, c)
        if len(poly) == 0:
            break
    return poly


def shoelace(poly: np.ndarray) -> float:
    """Signed area of an (n x 2) polygon (CCW positive)."""
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return float(
        0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    )


def voronoi_metrics(
    xs: np.ndarray, ys: np.ndarray,
    expand: float = 0.2,
) -> tuple[np.ndarray, np.ndarray, tuple[float, float, float, float]]:
    """Per-site Voronoi cell (area, n_vertices) clipped to the 20%-expanded
    point bbox (reference clipEnvelope default). Returns (areas, nverts,
    bbox)."""
    x0, x1 = float(xs.min()), float(xs.max())
    y0, y1 = float(ys.min()), float(ys.max())
    dx, dy = (x1 - x0) * expand, (y1 - y0) * expand
    bbox = (x0 - dx, y0 - dy, x1 + dx, y1 + dy)
    n = len(xs)
    areas = np.zeros(n)
    nverts = np.zeros(n, dtype=np.int64)
    for i in range(n):
        cell = voronoi_cell(i, xs, ys, bbox)
        areas[i] = abs(shoelace(cell))
        nverts[i] = len(cell)
    return areas, nverts, bbox


# ---------------------------------------------------------------------------
# Ring repair — RepairGeometryProcess (GT/RepairGeometryProcess.java:41 /
# FeatureFactory validate+fix): close unclosed rings, drop consecutive
# duplicate vertices, normalize orientation to CCW (positive area), reject
# degenerate rings (< 3 distinct vertices).
# ---------------------------------------------------------------------------


def repair_ring(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray, bool]:
    """Repair one polygon ring given as open or closed vertex arrays.
    Returns (rx, ry, valid) with the ring open (no repeated last vertex),
    CCW-oriented, consecutive duplicates removed."""
    if len(xs) and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]  # drop explicit closure
    keep = np.ones(len(xs), dtype=bool)
    for i in range(1, len(xs)):
        if xs[i] == xs[i - 1] and ys[i] == ys[i - 1]:
            keep[i] = False
    xs, ys = xs[keep], ys[keep]
    if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    if len(xs) < 3:
        return xs, ys, False
    area = shoelace(np.column_stack([xs, ys]))
    if area == 0.0:
        return xs, ys, False
    if area < 0:
        xs, ys = xs[::-1].copy(), ys[::-1].copy()
    return xs, ys, True


# ---------------------------------------------------------------------------
# Ring assembly — FeatureToPolygonProcess (GT/operations/
# FeatureToPolygonOperation.java:48, JTS Polygonizer): order a component's
# segments into a closed ring by endpoint walking. The component grouping
# (connected segments) is done distributed (label propagation over shared
# endpoints, transforms_geom.polygonize); this kernel only sees ONE
# component's segments — O(m log m) via an endpoint index.
# ---------------------------------------------------------------------------


def assemble_ring(
    x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray
) -> tuple[int, float, bool]:
    """Walk segments into a ring. Returns (n_verts, abs_area, closed).

    Endpoints are matched exactly (callers pass mm-quantized coords).
    ``closed`` is False when the walk cannot return to the start using
    every segment exactly once (dangling or branching input)."""
    m = len(x1)
    if m < 3:
        return m, 0.0, False
    index: dict[tuple[float, float], list[int]] = {}
    for i in range(m):
        index.setdefault((x1[i], y1[i]), []).append(i)
        index.setdefault((x2[i], y2[i]), []).append(i)
    used = np.zeros(m, dtype=bool)
    start = (x1[0], y1[0])
    cur = start
    used[0] = True
    verts = [start]
    nxt = (x2[0], y2[0])
    n_used = 1
    while nxt != start:
        verts.append(nxt)
        cands = [j for j in index.get(nxt, []) if not used[j]]
        if not cands:
            return len(verts), 0.0, False
        j = cands[0]
        used[j] = True
        n_used += 1
        if (x1[j], y1[j]) == nxt:
            nxt = (x2[j], y2[j])
        else:
            nxt = (x1[j], y1[j])
    if n_used != m:
        return len(verts), 0.0, False
    poly = np.asarray(verts)
    return len(verts), abs(shoelace(poly)), True


# ---------------------------------------------------------------------------
# TIN interpolation — TINInterpolationProcess (GT/gridcoverage/
# RasterInterpolationTINOperation / TINInterpolationProcess: linear
# barycentric interpolation over the Delaunay triangulation of control
# points). Point location is a vectorized all-triangle barycentric test —
# O(q * t) per group, fine for the per-group applyInPandas path; queries
# outside the hull return NaN (the reference leaves them NODATA).
# ---------------------------------------------------------------------------


def tin_interpolate(
    cx: np.ndarray, cy: np.ndarray, cv: np.ndarray,
    qx: np.ndarray, qy: np.ndarray,
) -> np.ndarray:
    """Linear TIN interpolation of control values cv at query points."""
    tris, pts = delaunay(cx, cy)
    # remap control values onto the sorted-unique point set delaunay used
    order = {}
    for i in range(len(pts)):
        order[(pts[i, 0], pts[i, 1])] = i
    vals = np.full(len(pts), np.nan)
    for j in range(len(cx)):
        k = order.get((cx[j], cy[j]))
        if k is not None:
            vals[k] = cv[j]
    out = np.full(len(qx), np.nan)
    if len(tris) == 0:
        return out
    ax, ay = pts[tris[:, 0], 0], pts[tris[:, 0], 1]
    bx, by = pts[tris[:, 1], 0], pts[tris[:, 1], 1]
    gx, gy = pts[tris[:, 2], 0], pts[tris[:, 2], 1]
    det = (by - gy) * (ax - gx) + (gx - bx) * (ay - gy)
    ok = det != 0
    for i in range(len(qx)):
        l1 = ((by - gy) * (qx[i] - gx) + (gx - bx) * (qy[i] - gy)) / np.where(
            ok, det, 1.0
        )
        l2 = ((gy - ay) * (qx[i] - gx) + (ax - gx) * (qy[i] - gy)) / np.where(
            ok, det, 1.0
        )
        l3 = 1.0 - l1 - l2
        eps = -1e-9
        inside = ok & (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
        idx = np.where(inside)[0]
        if len(idx):
            t = idx[0]
            out[i] = (
                l1[t] * vals[tris[t, 0]]
                + l2[t] * vals[tris[t, 1]]
                + l3[t] * vals[tris[t, 2]]
            )
    return out


# ---------------------------------------------------------------------------
# Maximum inscribed rectangle — FeatureToMaximumInscribedRectangleProcess
# (GT/util/MaximumInscribedRectangle.java:144-262): rasterize the polygon
# onto a scale x scale grid of cell centers, then the classic
# largest-rectangle-of-true-cells histogram/stack sweep; the output
# envelope uses the reference's own reconstruction (lower-left cell + one
# cell inset). Axis-aligned variant (rotate=false); the rotate=true path
# pre-rotates by the minimum-diameter angle (documented narrowing).
# ---------------------------------------------------------------------------


def max_inscribed_rect(
    xs: np.ndarray, ys: np.ndarray, scale: int = 40
) -> tuple[float, float, float, float]:
    """Largest axis-aligned rectangle of interior grid cells of the
    polygon (xs, ys). Returns (minx, miny, maxx, maxy)."""
    x0, x1 = float(xs.min()), float(xs.max())
    y0, y1 = float(ys.min()), float(ys.max())
    dx = (x1 - x0) / scale
    dy = (y1 - y0) / scale
    if dx <= 0 or dy <= 0:
        return x0, y0, x1, y1
    cols = rows = scale
    # cell centers, vectorized ray-cast per row
    matrix = np.zeros((rows, cols), dtype=bool)
    cxs = x0 + np.arange(cols) * dx + dx / 2.0
    for row in range(rows):
        cy = y0 + row * dy + dy / 2.0
        matrix[row] = points_in_polygon(cxs, np.full(cols, cy), xs, ys)

    best_area = 0
    ll = (0, 0)
    ur = (-1, -1)
    cache = np.zeros(cols + 1, dtype=np.int64)
    for row in range(rows):
        # heights of open columns up to this row
        cache[:cols] = np.where(matrix[row], cache[:cols] + 1, 0)
        stack: list[tuple[int, int]] = []
        open_w = 0
        for col in range(cols + 1):
            h = int(cache[col])
            if h > open_w:
                stack.append((col, open_w))
                open_w = h
            elif h < open_w:
                while True:
                    cx, cw = stack.pop()
                    area = open_w * (col - cx)
                    if area > best_area:
                        best_area = area
                        ll = (cx, row)
                        ur = (col - 1, row - open_w + 1)
                    open_w = cw
                    if h >= open_w:
                        break
                open_w = h
                if open_w != 0:
                    stack.append((cx, cw))
    # reference reconstruction (one-cell inset on the min corner)
    minx = x0 + ll[0] * dx + dx
    miny = y0 + ur[1] * dy + dy   # ur holds the smaller row index
    maxx = x0 + ur[0] * dx + dx
    maxy = y0 + ll[1] * dy + dy
    if minx > maxx:
        minx, maxx = maxx, minx
    if miny > maxy:
        miny, maxy = maxy, miny
    return minx, miny, maxx, maxy


# ---------------------------------------------------------------------------
# Thin-plate spline interpolation — TPSProcess (GT/gridcoverage/
# RasterInterpolationTPSOperation: radial basis r^2 ln r with affine part).
# The dense (m+3)x(m+3) solve is per GROUP of control points (m is small —
# the reference also solves one global dense system); evaluation is
# vectorized over queries.
# ---------------------------------------------------------------------------


def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    """U(r) = r^2 * ln(r^2) / 2 = r^2 ln r, with U(0) = 0."""
    out = np.zeros_like(r2)
    nz = r2 > 0
    out[nz] = 0.5 * r2[nz] * np.log(r2[nz])
    return out


def tps_fit(cx: np.ndarray, cy: np.ndarray, cv: np.ndarray):
    """Solve the exact-interpolation TPS system. Returns (w, a) with
    len(w) = m radial weights and a = (a0, ax, ay) affine part."""
    m = len(cx)
    d2 = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
    K = _tps_kernel(d2)
    P = np.column_stack([np.ones(m), cx, cy])
    A = np.zeros((m + 3, m + 3))
    A[:m, :m] = K
    A[:m, m:] = P
    A[m:, :m] = P.T
    b = np.concatenate([cv, np.zeros(3)])
    sol = np.linalg.solve(A, b)
    return sol[:m], sol[m:]


def tps_eval(
    cx: np.ndarray, cy: np.ndarray, w: np.ndarray, a: np.ndarray,
    qx: np.ndarray, qy: np.ndarray,
) -> np.ndarray:
    d2 = (qx[:, None] - cx[None, :]) ** 2 + (qy[:, None] - cy[None, :]) ** 2
    return a[0] + a[1] * qx + a[2] * qy + _tps_kernel(d2) @ w
