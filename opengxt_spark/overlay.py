"""Overlay and line operators: intersect, clipped line length, line-line
intersection points, point-to-line snapping, points along lines.

Reference parity map (paths relative to /root/reference):
- ``intersect_rects``      <- GeoTools/process-spatialstatistics/.../transformation/
                              IntersectFeatureCollection.java:61 (A∩B overlay,
                              attribute concat; axis-aligned rect geometry makes
                              the pairwise intersection closed-form)
- ``sum_line_length``      <- operations/CalculateSumLineLengthOperation.java:52
                              (per polygon: total clipped line length) — the
                              rect clip interval is Liang-Barsky, closed-form
- ``line_intersections``   <- operations/IntersectionPointsOperation.java:54
                              (points where two line layers cross)
- ``snap_points_to_lines`` <- operations/SnapPointsToLinesOperation.java:53
                              (nearest line within tolerance, projected point)
- ``points_along_lines``   <- transformation/PointsAlongLinesFeatureCollection
                              .java:49 (equidistant points along lines)

All predicates/coordinates are IEEE mul/add/div/sqrt expressions shared
verbatim with the DuckDB oracle, so results hash identically. Every join is
the cell-bucketed plan: bbox cell cover on the build side, one-cell probe (or
cell-ownership dedup when both sides multi-cell), exact refine after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cells, planner, world
from .world import dlit

SEG_CELL = 50.0  # cell size for segment-bbox covers (segments span ~100s units)


def _rect_cells(rects: DataFrame, cell_size: float) -> DataFrame:
    return cells.explode_extent_cells(
        world.rect_corners(planner.ensure_parallelism(rects)),
        cell_size=cell_size,
    )


def intersect_rects(
    a: DataFrame, b: DataFrame, cell_size: float = cells.DEFAULT_CELL_SIZE
) -> DataFrame:
    """Pairwise overlay intersection of two axis-aligned rectangle layers.

    Output one row per intersecting (rid_a, rid_b) pair with the
    intersection box and its area. Both sides explode to their bbox cell
    cover; a pair meeting in several cells is emitted exactly once via the
    **cell-ownership rule**: keep the match only in the cell containing the
    intersection box's min corner — a dedup with zero extra shuffle
    (SURVEY.md §2.4), unlike dropDuplicates which would re-shuffle the
    whole pair table.
    """
    cs = float(cell_size)
    aa = _rect_cells(
        a.select(
            F.col("rid").alias("rid_a"), F.col("cx").alias("acx"),
            F.col("cy").alias("acy"), F.col("hw").alias("ahw"),
            F.col("hh").alias("ahh"),
        ).withColumns({
            "cx": F.col("acx"), "cy": F.col("acy"),
            "hw": F.col("ahw"), "hh": F.col("ahh"),
        }),
        cs,
    ).drop("cx", "cy", "hw", "hh")
    bb = _rect_cells(
        b.select(
            F.col("rid").alias("rid_b"), F.col("cx").alias("bcx"),
            F.col("cy").alias("bcy"), F.col("hw").alias("bhw"),
            F.col("hh").alias("bhh"),
        ).withColumns({
            "cx": F.col("bcx"), "cy": F.col("bcy"),
            "hw": F.col("bhw"), "hh": F.col("bhh"),
        }),
        cs,
    ).drop("cx", "cy", "hw", "hh", "xmin", "xmax", "ymin", "ymax")
    joined = aa.join(bb, on=["cell_x", "cell_y"], how="inner")
    ixmin = F.greatest(F.col("acx") - F.col("ahw"), F.col("bcx") - F.col("bhw"))
    ixmax = F.least(F.col("acx") + F.col("ahw"), F.col("bcx") + F.col("bhw"))
    iymin = F.greatest(F.col("acy") - F.col("ahh"), F.col("bcy") - F.col("bhh"))
    iymax = F.least(F.col("acy") + F.col("ahh"), F.col("bcy") + F.col("bhh"))
    out = joined.where((ixmin <= ixmax) & (iymin <= iymax))
    # ownership: the cell containing the intersection's min corner
    own = (
        (F.floor(ixmin / F.lit(cs)).cast("long") == F.col("cell_x"))
        & (F.floor(iymin / F.lit(cs)).cast("long") == F.col("cell_y"))
    )
    return out.where(own).select(
        "rid_a", "rid_b",
        F.round(ixmin, 6).alias("ixmin"), F.round(iymin, 6).alias("iymin"),
        F.round(ixmax, 6).alias("ixmax"), F.round(iymax, 6).alias("iymax"),
        F.round((ixmax - ixmin) * (iymax - iymin), 6).alias("area"),
    )


def intersect_rects_oracle() -> str:
    return world.with_layers(
        """
SELECT a.rid AS rid_a, b.rid AS rid_b,
       ROUND(GREATEST(a.cx - a.hw, b.cx - b.hw), 6) AS ixmin,
       ROUND(GREATEST(a.cy - a.hh, b.cy - b.hh), 6) AS iymin,
       ROUND(LEAST(a.cx + a.hw, b.cx + b.hw), 6) AS ixmax,
       ROUND(LEAST(a.cy + a.hh, b.cy + b.hh), 6) AS iymax,
       ROUND((LEAST(a.cx + a.hw, b.cx + b.hw)
              - GREATEST(a.cx - a.hw, b.cx - b.hw))
           * (LEAST(a.cy + a.hh, b.cy + b.hh)
              - GREATEST(a.cy - a.hh, b.cy - b.hh)), 6) AS area
FROM rects_customer a JOIN rects_orders b
  ON GREATEST(a.cx - a.hw, b.cx - b.hw) <= LEAST(a.cx + a.hw, b.cx + b.hw)
 AND GREATEST(a.cy - a.hh, b.cy - b.hh) <= LEAST(a.cy + a.hh, b.cy + b.hh)
""",
        "rects_customer", "rects_orders",
    )


# ---------------------------------------------------------------------------
# Clipped line length per polygon (Liang-Barsky interval, closed-form)
# ---------------------------------------------------------------------------

# Shared SQL fragment: length of segment (x1,y1)-(x2,y2) inside rect
# (cx,cy,hw,hh). t-interval clip per axis; degenerate axes (dx=0) handled by
# the inside test (the parameterization divides only when |d| > 0).
_CLIP_STAGES = [
    ("sdx", "x2 - x1"),
    ("sdy", "y2 - y1"),
    # entering/exit t per axis; when the segment is axis-parallel use the
    # full [0,1] interval if inside the slab else an empty one.
    ("tx0", "CASE WHEN sdx > 0.0 THEN ((cx - hw) - x1) / sdx "
            "WHEN sdx < 0.0 THEN ((cx + hw) - x1) / sdx "
            "WHEN x1 >= cx - hw AND x1 <= cx + hw THEN 0.0 ELSE 1.0 END"),
    ("tx1", "CASE WHEN sdx > 0.0 THEN ((cx + hw) - x1) / sdx "
            "WHEN sdx < 0.0 THEN ((cx - hw) - x1) / sdx "
            "WHEN x1 >= cx - hw AND x1 <= cx + hw THEN 1.0 ELSE 0.0 END"),
    ("ty0", "CASE WHEN sdy > 0.0 THEN ((cy - hh) - y1) / sdy "
            "WHEN sdy < 0.0 THEN ((cy + hh) - y1) / sdy "
            "WHEN y1 >= cy - hh AND y1 <= cy + hh THEN 0.0 ELSE 1.0 END"),
    ("ty1", "CASE WHEN sdy > 0.0 THEN ((cy + hh) - y1) / sdy "
            "WHEN sdy < 0.0 THEN ((cy - hh) - y1) / sdy "
            "WHEN y1 >= cy - hh AND y1 <= cy + hh THEN 1.0 ELSE 0.0 END"),
    ("t_in", "GREATEST(tx0, ty0, 0.0)"),
    ("t_out", "LEAST(tx1, ty1, 1.0)"),
    ("clip_frac", "CASE WHEN t_out > t_in THEN t_out - t_in ELSE 0.0 END"),
    ("seg_len", "SQRT(sdx * sdx + sdy * sdy)"),
]


def _seg_bbox(segments: DataFrame) -> DataFrame:
    return (
        segments.withColumn("xmin", F.least("x1", "x2"))
        .withColumn("xmax", F.greatest("x1", "x2"))
        .withColumn("ymin", F.least("y1", "y2"))
        .withColumn("ymax", F.greatest("y1", "y2"))
    )


def sum_line_length(
    segments: DataFrame, rects: DataFrame, cell_size: float = SEG_CELL
) -> DataFrame:
    """Per rectangle: total length of the segment portions inside it.

    Plan: segments explode to their bbox cell cover (the build side — line
    bboxes span multiple cells), rect layer explodes likewise; matches
    dedup by cell ownership of the overlap region's min corner. The clip
    interval is closed-form, the length sum is one groupBy.
    """
    from .binning import apply_stages

    cs = float(cell_size)
    segs = cells.explode_extent_cells(
        _seg_bbox(planner.ensure_parallelism(segments)), cell_size=cs
    ).drop("xmin", "xmax", "ymin", "ymax")
    rc = cells.explode_extent_cells(
        world.rect_corners(planner.ensure_parallelism(rects)), cell_size=cs
    )
    joined = segs.join(rc, on=["cell_x", "cell_y"], how="inner")
    # ownership cell: min corner of the bbox-overlap region of seg x rect
    oxmin = F.greatest(F.least("x1", "x2"), F.col("cx") - F.col("hw"))
    oymin = F.greatest(F.least("y1", "y2"), F.col("cy") - F.col("hh"))
    joined = joined.where(
        (F.floor(oxmin / F.lit(cs)).cast("long") == F.col("cell_x"))
        & (F.floor(oymin / F.lit(cs)).cast("long") == F.col("cell_y"))
    )
    staged = apply_stages(joined, _CLIP_STAGES)
    return (
        staged.where(F.col("clip_frac") > 0.0)
        .groupBy("rid")
        .agg(
            F.round(F.sum(F.expr("clip_frac * seg_len")), 4).alias("sum_len"),
            F.count(F.lit(1)).alias("n_segs"),
        )
    )


def sum_line_length_oracle() -> str:
    from .binning import stages_to_subquery

    # bbox columns precomputed in a subquery: DuckDB's range-join machinery
    # hits an internal error on LEAST/GREATEST expressions inside ON.
    base = """
SELECT r.rid AS rid, l.x1, l.y1, l.x2, l.y2, r.cx, r.cy, r.hw, r.hh
FROM (SELECT lid, x1, y1, x2, y2,
             LEAST(x1, x2) AS bxmin, GREATEST(x1, x2) AS bxmax,
             LEAST(y1, y2) AS bymin, GREATEST(y1, y2) AS bymax
      FROM lines_orders) l
JOIN rects_customer r
  ON l.bxmin <= r.cx + r.hw AND l.bxmax >= r.cx - r.hw
 AND l.bymin <= r.cy + r.hh AND l.bymax >= r.cy - r.hh
"""
    sub = stages_to_subquery(base, _CLIP_STAGES)
    return world.with_layers(
        f"""
SELECT rid, ROUND(SUM(clip_frac * seg_len), 4) AS sum_len,
       CAST(COUNT(*) AS BIGINT) AS n_segs
FROM {sub} WHERE clip_frac > 0.0 GROUP BY rid
""",
        "lines_orders", "rects_customer",
    )


# ---------------------------------------------------------------------------
# Line x line intersection points
# ---------------------------------------------------------------------------

_XING_STAGES = [
    ("adx", "ax2 - ax1"),
    ("ady", "ay2 - ay1"),
    ("bdx", "bx2 - bx1"),
    ("bdy", "by2 - by1"),
    ("den", "adx * bdy - ady * bdx"),
    ("tnum", "(bx1 - ax1) * bdy - (by1 - ay1) * bdx"),
    ("unum", "(bx1 - ax1) * ady - (by1 - ay1) * adx"),
    ("ta", "CASE WHEN den <> 0.0 THEN tnum / den ELSE -1.0 END"),
    ("ua", "CASE WHEN den <> 0.0 THEN unum / den ELSE -1.0 END"),
    ("hit", "den <> 0.0 AND ta >= 0.0 AND ta <= 1.0 AND ua >= 0.0 AND ua <= 1.0"),
    ("px", "ax1 + ta * adx"),
    ("py", "ay1 + ta * ady"),
]


def line_intersections(
    a: DataFrame, b: DataFrame, cell_size: float = SEG_CELL
) -> DataFrame:
    """Crossing points of two segment layers -> (lid_a, lid_b, px, py).

    Segment-pair candidate generation is the bbox cell join with ownership
    dedup on the crossing point's cell (each true crossing lies in exactly
    one cell, so the emitted row is unique without a distinct).
    """
    from .binning import apply_stages

    cs = float(cell_size)
    aa = cells.explode_extent_cells(
        _seg_bbox(planner.ensure_parallelism(a).select(
            F.col("lid").alias("lid_a"), F.col("x1").alias("ax1"),
            F.col("y1").alias("ay1"), F.col("x2").alias("ax2"),
            F.col("y2").alias("ay2"),
        ).withColumns({"x1": F.col("ax1"), "y1": F.col("ay1"),
                       "x2": F.col("ax2"), "y2": F.col("ay2")})),
        cell_size=cs,
    ).drop("x1", "y1", "x2", "y2", "xmin", "xmax", "ymin", "ymax")
    bbx = cells.explode_extent_cells(
        _seg_bbox(planner.ensure_parallelism(b).select(
            F.col("lid").alias("lid_b"), F.col("x1").alias("bx1"),
            F.col("y1").alias("by1"), F.col("x2").alias("bx2"),
            F.col("y2").alias("by2"),
        ).withColumns({"x1": F.col("bx1"), "y1": F.col("by1"),
                       "x2": F.col("bx2"), "y2": F.col("by2")})),
        cell_size=cs,
    ).drop("x1", "y1", "x2", "y2", "xmin", "xmax", "ymin", "ymax")
    joined = aa.join(bbx, on=["cell_x", "cell_y"], how="inner")
    staged = apply_stages(joined, _XING_STAGES)
    out = staged.where(F.col("hit"))
    # Ownership on EXACT endpoint arithmetic (min corner of the two
    # segments' bbox overlap), not the FP-computed crossing point: a
    # crossing within ~1 ulp of a cell edge could otherwise round into a
    # cell outside one side's cover and silently drop the pair. The overlap
    # min corner is always inside both covers, and the crossing lies inside
    # the overlap, so exactly one joined row survives per true crossing.
    oxmin = F.greatest(
        F.least("ax1", "ax2"), F.least("bx1", "bx2")
    )
    oymin = F.greatest(
        F.least("ay1", "ay2"), F.least("by1", "by2")
    )
    own = (
        (F.floor(oxmin / F.lit(cs)).cast("long") == F.col("cell_x"))
        & (F.floor(oymin / F.lit(cs)).cast("long") == F.col("cell_y"))
    )
    return out.where(own).select(
        "lid_a", "lid_b",
        F.round("px", 6).alias("px"), F.round("py", 6).alias("py"),
    )


def line_intersections_oracle() -> str:
    from .binning import stages_to_subquery

    # bbox columns precomputed (see sum_line_length_oracle: DuckDB internal
    # error on LEAST/GREATEST in range-join ON clauses).
    base = """
SELECT a.lid AS lid_a, b.lid AS lid_b,
       a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2,
       b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2
FROM (SELECT lid, x1, y1, x2, y2,
             LEAST(x1, x2) AS bxmin, GREATEST(x1, x2) AS bxmax,
             LEAST(y1, y2) AS bymin, GREATEST(y1, y2) AS bymax
      FROM lines_orders) a
JOIN (SELECT lid, x1, y1, x2, y2,
             LEAST(x1, x2) AS bxmin, GREATEST(x1, x2) AS bxmax,
             LEAST(y1, y2) AS bymin, GREATEST(y1, y2) AS bymax
      FROM lines_part) b
  ON a.bxmin <= b.bxmax AND a.bxmax >= b.bxmin
 AND a.bymin <= b.bymax AND a.bymax >= b.bymin
"""
    sub = stages_to_subquery(base, _XING_STAGES)
    return world.with_layers(
        f"""
SELECT lid_a, lid_b, ROUND(px, 6) AS px, ROUND(py, 6) AS py
FROM {sub} WHERE hit
""",
        "lines_orders", "lines_part",
    )


# ---------------------------------------------------------------------------
# Snap points to lines (nearest segment within tolerance, projected point)
# ---------------------------------------------------------------------------

_SNAP_STAGES = [
    ("sdx", "x2 - x1"),
    ("sdy", "y2 - y1"),
    ("seglen2", "sdx * sdx + sdy * sdy"),
    ("tproj", "CASE WHEN seglen2 > 0.0 THEN "
              "GREATEST(LEAST(((x - x1) * sdx + (y - y1) * sdy) / seglen2, "
              "1.0), 0.0) ELSE 0.0 END"),
    ("qx", "x1 + tproj * sdx"),
    ("qy", "y1 + tproj * sdy"),
    ("snap_d2", "(x - qx) * (x - qx) + (y - qy) * (y - qy)"),
]


def snap_points_to_lines(
    points: DataFrame,
    segments: DataFrame,
    tolerance: float,
    cell_size: float | None = None,
) -> DataFrame:
    """Per point: nearest segment within tolerance and the snapped
    (projected, clamped-to-segment) coordinates.

    Plan: segments' bboxes expand by the tolerance and explode to cells
    (build side); points probe with their single cell. min(struct) picks
    the nearest with a deterministic lid tie-break — combines map-side.
    """
    from .binning import apply_stages

    cs = float(cell_size or max(tolerance, 25.0))
    p = cells.with_point_cells(
        planner.ensure_parallelism(points).select("pid", "x", "y"),
        cell_size=cs,
    )
    s = cells.explode_extent_cells(
        cells.expand_extent(
            _seg_bbox(planner.ensure_parallelism(segments)), tolerance
        ),
        cell_size=cs,
    ).drop("xmin", "xmax", "ymin", "ymax")
    joined = p.join(s, on=["cell_x", "cell_y"], how="inner")
    staged = apply_stages(joined, _SNAP_STAGES)
    near = staged.where(
        F.col("snap_d2") <= F.lit(float(tolerance) * float(tolerance))
    )
    best = (
        near.groupBy("pid")
        .agg(F.min(F.struct("snap_d2", "lid", "qx", "qy")).alias("_b"))
        .select(
            "pid",
            F.col("_b.lid").alias("lid"),
            F.round(F.sqrt(F.col("_b.snap_d2")), 6).alias("snap_dist"),
            F.round(F.col("_b.qx"), 6).alias("qx"),
            F.round(F.col("_b.qy"), 6).alias("qy"),
        )
    )
    return best


def snap_points_oracle(tolerance: float) -> str:
    from .binning import stages_to_subquery

    t2 = dlit(float(tolerance) * float(tolerance))
    base = """
SELECT p.pid AS pid, p.x, p.y, l.lid, l.x1, l.y1, l.x2, l.y2
FROM points_part p, lines_orders l
"""
    sub = stages_to_subquery(base, _SNAP_STAGES)
    return world.with_layers(
        f"""
SELECT pid, lid, snap_dist, qx, qy FROM (
  SELECT pid, lid,
         ROUND(SQRT(snap_d2), 6) AS snap_dist,
         ROUND(qx, 6) AS qx, ROUND(qy, 6) AS qy,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY snap_d2 ASC, lid ASC)
           AS rn
  FROM {sub} WHERE snap_d2 <= {t2}
) WHERE rn = 1
""",
        "points_part", "lines_orders",
    )


# ---------------------------------------------------------------------------
# Points along lines (equidistant stations)
# ---------------------------------------------------------------------------


def points_along_lines(segments: DataFrame, spacing: float) -> DataFrame:
    """Equidistant points along each segment at ``spacing`` intervals
    (station 0 at the start vertex). Narrow explode, no shuffle."""
    sp = dlit(float(spacing))
    df = planner.ensure_parallelism(segments).select(
        "lid", "x1", "y1", "x2", "y2",
        F.expr("SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))")
        .alias("seg_len"),
    )
    df = df.withColumn(
        "k",
        F.expr(f"explode(sequence(0, CAST(FLOOR(seg_len / {sp}) AS INT)))"),
    )
    t = F.expr(f"k * {sp} / seg_len")
    return df.select(
        "lid",
        F.col("k").cast("long").alias("k"),
        F.round(F.col("x1") + t * (F.col("x2") - F.col("x1")), 6).alias("sx"),
        F.round(F.col("y1") + t * (F.col("y2") - F.col("y1")), 6).alias("sy"),
    )


def points_along_lines_oracle(spacing: float) -> str:
    sp = dlit(float(spacing))
    return world.with_layers(
        f"""
SELECT lid, CAST(k AS BIGINT) AS k,
       ROUND(x1 + (k * {sp} / seg_len) * (x2 - x1), 6) AS sx,
       ROUND(y1 + (k * {sp} / seg_len) * (y2 - y1), 6) AS sy
FROM (
  SELECT lid, x1, y1, x2, y2,
         SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS seg_len
  FROM lines_orders
), LATERAL UNNEST(generate_series(0, CAST(FLOOR(seg_len / {sp}) AS INT))) AS u(k)
""",
        "lines_orders",
    )


def eliminate_slivers(
    rects: DataFrame, min_area: float, cell_size: float = cells.DEFAULT_CELL_SIZE
) -> DataFrame:
    """One elimination pass (EliminateOperation.java:82): every sliver
    polygon (area < min_area) merges into its largest-area intersecting
    neighbor; output the merged envelope per absorbing polygon.

    The reference iterates until no slivers remain; a pass is the building
    block (iterate by re-applying — each pass is one cell join + one
    grouped reduce, so k passes cost k shuffles, never O(n^2)).
    Output: (rid, n_absorbed, mxmin, mymin, mxmax, mymax).
    """
    cs = float(cell_size)
    area = F.expr("4.0 * hw * hh")
    base = planner.ensure_parallelism(rects).withColumn("area", area)
    slivers = base.where(F.col("area") < F.lit(float(min_area)))
    keepers = base.where(F.col("area") >= F.lit(float(min_area)))
    s = cells.explode_extent_cells(
        world.rect_corners(slivers.select(
            F.col("rid").alias("srid"), F.col("cx").alias("scx"),
            F.col("cy").alias("scy"), F.col("hw").alias("shw"),
            F.col("hh").alias("shh"),
        ).withColumns({"cx": F.col("scx"), "cy": F.col("scy"),
                       "hw": F.col("shw"), "hh": F.col("shh")})),
        cell_size=cs,
    ).drop("cx", "cy", "hw", "hh", "xmin", "xmax", "ymin", "ymax")
    k = cells.explode_extent_cells(
        world.rect_corners(keepers), cell_size=cs
    ).drop("xmin", "xmax", "ymin", "ymax")
    joined = s.join(k, on=["cell_x", "cell_y"], how="inner").where(
        F.expr(
            "ABS(scx - cx) <= shw + hw AND ABS(scy - cy) <= shh + hh"
        )
    )
    # best absorber per sliver: max area, rid tie-break; multi-cell matches
    # collapse inside the same min(struct) reduction (no distinct needed:
    # duplicates of the SAME pair reduce to one value).
    best = (
        joined.groupBy("srid")
        .agg(F.min(F.struct(
            (F.lit(0.0) - F.expr("4.0 * hw * hh")).alias("neg_area"),
            F.col("rid"),
            F.expr("scx - shw").alias("sxmin"),
            F.expr("scy - shh").alias("symin"),
            F.expr("scx + shw").alias("sxmax"),
            F.expr("scy + shh").alias("symax"),
        )).alias("_b"))
        .select(
            F.col("_b.rid").alias("rid"),
            F.col("_b.sxmin").alias("sxmin"), F.col("_b.symin").alias("symin"),
            F.col("_b.sxmax").alias("sxmax"), F.col("_b.symax").alias("symax"),
        )
    )
    kk = keepers.select(
        "rid",
        F.expr("cx - hw").alias("kxmin"), F.expr("cy - hh").alias("kymin"),
        F.expr("cx + hw").alias("kxmax"), F.expr("cy + hh").alias("kymax"),
    )
    return (
        best.join(kk, on="rid")
        .groupBy("rid")
        .agg(
            F.count(F.lit(1)).alias("n_absorbed"),
            F.round(F.least(F.min("sxmin"), F.first("kxmin")), 6).alias("mxmin"),
            F.round(F.least(F.min("symin"), F.first("kymin")), 6).alias("mymin"),
            F.round(F.greatest(F.max("sxmax"), F.first("kxmax")), 6).alias("mxmax"),
            F.round(F.greatest(F.max("symax"), F.first("kymax")), 6).alias("mymax"),
        )
    )


def eliminate_oracle(min_area: float) -> str:
    ma = dlit(float(min_area))
    return world.with_layers(
        f"""
WITH base AS (SELECT rid, cx, cy, hw, hh, 4.0 * hw * hh AS area
              FROM rects_customer),
slv AS (SELECT * FROM base WHERE area < {ma}),
kp AS (SELECT * FROM base WHERE area >= {ma}),
best AS (
  SELECT srid, rid, sxmin, symin, sxmax, symax FROM (
    SELECT s.rid AS srid, k.rid AS rid,
           s.cx - s.hw AS sxmin, s.cy - s.hh AS symin,
           s.cx + s.hw AS sxmax, s.cy + s.hh AS symax,
           ROW_NUMBER() OVER (PARTITION BY s.rid
             ORDER BY k.area DESC, k.rid ASC) AS rn
    FROM slv s JOIN kp k
      ON ABS(s.cx - k.cx) <= s.hw + k.hw AND ABS(s.cy - k.cy) <= s.hh + k.hh
  ) WHERE rn = 1
)
SELECT b.rid AS rid, CAST(COUNT(*) AS BIGINT) AS n_absorbed,
       ROUND(LEAST(MIN(b.sxmin), MIN(k.cx - k.hw)), 6) AS mxmin,
       ROUND(LEAST(MIN(b.symin), MIN(k.cy - k.hh)), 6) AS mymin,
       ROUND(GREATEST(MAX(b.sxmax), MAX(k.cx + k.hw)), 6) AS mxmax,
       ROUND(GREATEST(MAX(b.symax), MAX(k.cy + k.hh)), 6) AS mymax
FROM best b JOIN kp k ON b.rid = k.rid
GROUP BY b.rid
""",
        "rects_customer",
    )


def eliminate_pass(
    rects: DataFrame, min_area: float, cell_size: float = cells.DEFAULT_CELL_SIZE
) -> DataFrame:
    """One FULL-LAYER elimination pass: slivers (area < min_area) merge into
    their largest intersecting keeper (bbox union); keepers without slivers
    and slivers without any intersecting keeper pass through unchanged.
    Output is a rect layer again — (rid, cx, cy, hw, hh) — so passes chain.

    Same cell-join plan as ``eliminate_slivers`` (the pairing is one cell
    equi-join + one grouped reduce — k passes cost k shuffles, never O(n^2));
    the envelope arithmetic mirrors the unrolled oracle text exactly
    (LEAST/GREATEST over COALESCE'd absorbed extents, then (min+max)/2) so
    doubles match bit-for-bit across engines.
    """
    cs = float(cell_size)
    ma = F.lit(float(min_area))
    base = planner.ensure_parallelism(rects).withColumn(
        "area", F.expr("4.0 * hw * hh")
    )
    slivers = base.where(F.col("area") < ma)
    keepers = base.where(F.col("area") >= ma)
    s = cells.explode_extent_cells(
        world.rect_corners(slivers.select(
            F.col("rid").alias("srid"), F.col("cx").alias("scx"),
            F.col("cy").alias("scy"), F.col("hw").alias("shw"),
            F.col("hh").alias("shh"),
        ).withColumns({"cx": F.col("scx"), "cy": F.col("scy"),
                       "hw": F.col("shw"), "hh": F.col("shh")})),
        cell_size=cs,
    ).drop("cx", "cy", "hw", "hh", "xmin", "xmax", "ymin", "ymax")
    k = cells.explode_extent_cells(
        world.rect_corners(keepers), cell_size=cs
    ).drop("xmin", "xmax", "ymin", "ymax")
    joined = s.join(k, on=["cell_x", "cell_y"], how="inner").where(
        F.expr("ABS(scx - cx) <= shw + hw AND ABS(scy - cy) <= shh + hh")
    )
    best = (
        joined.groupBy("srid")
        .agg(F.min(F.struct(
            (F.lit(0.0) - F.expr("4.0 * hw * hh")).alias("neg_area"),
            F.col("rid"),
            F.expr("scx - shw").alias("sxmin"),
            F.expr("scy - shh").alias("symin"),
            F.expr("scx + shw").alias("sxmax"),
            F.expr("scy + shh").alias("symax"),
        )).alias("_b"))
        .select(
            F.col("srid"),
            F.col("_b.rid").alias("rid"),
            F.col("_b.sxmin").alias("sxmin"), F.col("_b.symin").alias("symin"),
            F.col("_b.sxmax").alias("sxmax"), F.col("_b.symax").alias("symax"),
        )
    )
    env = best.groupBy("rid").agg(
        F.min("sxmin").alias("axmin"), F.min("symin").alias("aymin"),
        F.max("sxmax").alias("axmax"), F.max("symax").alias("aymax"),
    )
    merged = (
        keepers.select("rid", "cx", "cy", "hw", "hh")
        .join(env, on="rid", how="left")
        .selectExpr(
            "rid",
            "(LEAST(cx - hw, COALESCE(axmin, cx - hw))"
            " + GREATEST(cx + hw, COALESCE(axmax, cx + hw))) / 2.0 AS cx",
            "(LEAST(cy - hh, COALESCE(aymin, cy - hh))"
            " + GREATEST(cy + hh, COALESCE(aymax, cy + hh))) / 2.0 AS cy",
            "(GREATEST(cx + hw, COALESCE(axmax, cx + hw))"
            " - LEAST(cx - hw, COALESCE(axmin, cx - hw))) / 2.0 AS hw",
            "(GREATEST(cy + hh, COALESCE(aymax, cy + hh))"
            " - LEAST(cy - hh, COALESCE(aymin, cy - hh))) / 2.0 AS hh",
        )
    )
    remaining = slivers.join(
        best.select("srid").hint("SHUFFLE_HASH"),
        on=F.col("rid") == F.col("srid"),
        how="left_anti",
    ).select("rid", "cx", "cy", "hw", "hh")
    return merged.unionByName(remaining)


def eliminate_converged(
    rects: DataFrame,
    min_area: float,
    max_iter: int = 10,
    cell_size: float = cells.DEFAULT_CELL_SIZE,
) -> DataFrame:
    """Iterate ``eliminate_pass`` to fixpoint — the reference's convergence
    loop (EliminateOperation.java:82 re-selects slivers after each merge
    round until none remain absorbable). A pass strictly reduces the layer
    row count while any sliver has an intersecting keeper, so the loop ends
    in <= initial-sliver-count passes; ``max_iter`` bounds the driver loop
    (each iteration is one eager count — the same bounded-iteration pattern
    as kmeans)."""
    cur = rects.select("rid", "cx", "cy", "hw", "hh")
    n = cur.count()
    for _ in range(max_iter):
        nxt = eliminate_pass(cur, min_area, cell_size).persist()
        n2 = nxt.count()
        if n2 == n:
            return nxt
        cur, n = nxt, n2
    return cur


def eliminate_fixed(
    rects: DataFrame,
    min_area: float,
    n_pass: int,
    cell_size: float = cells.DEFAULT_CELL_SIZE,
) -> DataFrame:
    """Exactly ``n_pass`` elimination passes (a pass over a converged layer
    is the identity), rounded for the gate — the static-plan twin of
    ``eliminate_converged`` whose unrolled-CTE oracle DuckDB can run."""
    from . import joins

    cur = rects.select("rid", "cx", "cy", "hw", "hh")
    for i in range(n_pass):
        cur = eliminate_pass(cur, min_area, cell_size)
        if i < n_pass - 1:
            # A pass consumes its input in four subtrees; without a
            # materialized boundary each level re-executes the one below it
            # ~4x (4^k recompute at depth k). Eager persist (registry's
            # release_scratch frees it) keeps k passes at k linear jobs.
            cur = joins._persist_scratch(cur)
    return cur.selectExpr(
        "rid", "ROUND(cx, 6) AS cx", "ROUND(cy, 6) AS cy",
        "ROUND(hw, 6) AS hw", "ROUND(hh, 6) AS hh",
    )


def eliminate_converged_oracle(min_area: float, n_pass: int) -> str:
    """Unrolled ``n_pass`` elimination passes as sibling CTE chains — the
    DuckDB twin of ``eliminate_fixed`` (same join predicate, same envelope
    arithmetic, same operation order, so doubles match exactly)."""
    ma = dlit(float(min_area))
    parts = ["l0 AS (SELECT rid, cx, cy, hw, hh FROM rects_customer)"]
    for i in range(1, n_pass + 1):
        p = i - 1
        parts.append(f"""
base{i} AS (SELECT rid, cx, cy, hw, hh, 4.0 * hw * hh AS area FROM l{p}),
slv{i} AS (SELECT * FROM base{i} WHERE area < {ma}),
kp{i} AS (SELECT * FROM base{i} WHERE area >= {ma}),
best{i} AS (
  SELECT srid, rid, sxmin, symin, sxmax, symax FROM (
    SELECT s.rid AS srid, k.rid AS rid,
           s.cx - s.hw AS sxmin, s.cy - s.hh AS symin,
           s.cx + s.hw AS sxmax, s.cy + s.hh AS symax,
           ROW_NUMBER() OVER (PARTITION BY s.rid
             ORDER BY k.area DESC, k.rid ASC) AS rn
    FROM slv{i} s JOIN kp{i} k
      ON ABS(s.cx - k.cx) <= s.hw + k.hw AND ABS(s.cy - k.cy) <= s.hh + k.hh
  ) WHERE rn = 1
),
env{i} AS (
  SELECT rid, MIN(sxmin) AS axmin, MIN(symin) AS aymin,
         MAX(sxmax) AS axmax, MAX(symax) AS aymax
  FROM best{i} GROUP BY rid
),
l{i} AS (
  SELECT k.rid,
         (LEAST(k.cx - k.hw, COALESCE(e.axmin, k.cx - k.hw))
          + GREATEST(k.cx + k.hw, COALESCE(e.axmax, k.cx + k.hw))) / 2.0 AS cx,
         (LEAST(k.cy - k.hh, COALESCE(e.aymin, k.cy - k.hh))
          + GREATEST(k.cy + k.hh, COALESCE(e.aymax, k.cy + k.hh))) / 2.0 AS cy,
         (GREATEST(k.cx + k.hw, COALESCE(e.axmax, k.cx + k.hw))
          - LEAST(k.cx - k.hw, COALESCE(e.axmin, k.cx - k.hw))) / 2.0 AS hw,
         (GREATEST(k.cy + k.hh, COALESCE(e.aymax, k.cy + k.hh))
          - LEAST(k.cy - k.hh, COALESCE(e.aymin, k.cy - k.hh))) / 2.0 AS hh
  FROM kp{i} k LEFT JOIN env{i} e ON e.rid = k.rid
  UNION ALL
  SELECT s.rid, s.cx, s.cy, s.hw, s.hh
  FROM slv{i} s LEFT JOIN best{i} b ON b.srid = s.rid WHERE b.srid IS NULL
)""")
    body = ",\n".join(parts)
    return world.with_layers(
        f"""
WITH {body}
SELECT rid, ROUND(cx, 6) AS cx, ROUND(cy, 6) AS cy,
       ROUND(hw, 6) AS hw, ROUND(hh, 6) AS hh
FROM l{n_pass}
""",
        "rects_customer",
    )


def wind_rose(segments: DataFrame) -> DataFrame:
    """8-sector direction histogram of a segment layer (WindRoseMapProcess,
    WindroseFeatureCollection.java:53). Sector from sign/magnitude
    comparisons of (dx, dy) — no atan2, so both engines agree exactly:
    sectors 0..7 anticlockwise from East, 45 degrees each.
    Output (sector, n, len_sum)."""
    df = planner.ensure_parallelism(segments).selectExpr(
        "lid", "x2 - x1 AS dx", "y2 - y1 AS dy",
        "SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS seg_len",
    )
    sector = (
        "CASE "
        "WHEN dy >= 0 AND dx > 0 AND dx >= dy THEN 0 "
        "WHEN dy > 0 AND dx >= 0 AND dy > dx THEN 1 "
        "WHEN dy > 0 AND dx < 0 AND dy >= -dx THEN 2 "
        "WHEN dy >= 0 AND dx < 0 AND -dx > dy THEN 3 "
        "WHEN dy < 0 AND dx <= 0 AND -dx >= -dy THEN 4 "
        "WHEN dy < 0 AND dx <= 0 THEN 5 "
        "WHEN dy < 0 AND dx > 0 AND -dy > dx THEN 6 "
        "ELSE 7 END"
    )
    return (
        df.withColumn("sector", F.expr(sector))
        .groupBy("sector")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(
                F.expr("CAST(FLOOR(seg_len * 1000000.0) AS BIGINT)")
            ) / 1e6, 6).alias("len_sum"),
        )
    )


def wind_rose_oracle() -> str:
    sector = (
        "CASE "
        "WHEN dy >= 0 AND dx > 0 AND dx >= dy THEN 0 "
        "WHEN dy > 0 AND dx >= 0 AND dy > dx THEN 1 "
        "WHEN dy > 0 AND dx < 0 AND dy >= -dx THEN 2 "
        "WHEN dy >= 0 AND dx < 0 AND -dx > dy THEN 3 "
        "WHEN dy < 0 AND dx <= 0 AND -dx >= -dy THEN 4 "
        "WHEN dy < 0 AND dx <= 0 THEN 5 "
        "WHEN dy < 0 AND dx > 0 AND -dy > dx THEN 6 "
        "ELSE 7 END"
    )
    return world.with_layers(
        f"""
SELECT {sector} AS sector, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(FLOOR(seg_len * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1e6, 6) AS len_sum
FROM (
  SELECT lid, x2 - x1 AS dx, y2 - y1 AS dy,
         SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS seg_len
  FROM lines_orders
) GROUP BY 1
""",
        "lines_orders",
    )


def polygons_along_lines(
    segments: DataFrame, spacing: float, width: float
) -> DataFrame:
    """Rectangular strips along each segment — PolygonsAlongLinesProcess
    (GT/operations/PolygonsAlongLinesOperation.java: polygon pieces every
    ``spacing`` units, ``width`` across). Piece i spans the sub-segment
    [i*spacing, min((i+1)*spacing, len)] offset by +-width/2 along the
    unit normal; corners emitted in CCW order. Narrow explode, no
    shuffle; closed form shared with the oracle."""
    sp = dlit(float(spacing))
    hwid = dlit(float(width) / 2.0)
    df = planner.ensure_parallelism(segments).select(
        "lid", "x1", "y1", "x2", "y2",
        F.expr("SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))")
        .alias("seg_len"),
    ).where("seg_len > 0.0")
    df = df.withColumn(
        "i",
        F.expr(
            f"explode(sequence(0, CAST(CEIL(seg_len / {sp}) AS INT) - 1))"
        ),
    )
    exprs = _PAL_CORNERS.format(sp=sp, hwid=hwid)
    return df.selectExpr("lid", "CAST(i AS BIGINT) AS i", *exprs.split("|"))


#: Corner expressions shared verbatim with the DuckDB oracle: t0/t1 are the
#: clamped parametric ends of piece i; (nx, ny) the unit normal.
_PAL_CORNERS = (
    "ROUND(x1 + LEAST(i * {sp} / seg_len, 1.0) * (x2 - x1)"
    " - {hwid} * ((y2 - y1) / seg_len), 6) AS ax|"
    "ROUND(y1 + LEAST(i * {sp} / seg_len, 1.0) * (y2 - y1)"
    " + {hwid} * ((x2 - x1) / seg_len), 6) AS ay|"
    "ROUND(x1 + LEAST((i + 1) * {sp} / seg_len, 1.0) * (x2 - x1)"
    " - {hwid} * ((y2 - y1) / seg_len), 6) AS bx|"
    "ROUND(y1 + LEAST((i + 1) * {sp} / seg_len, 1.0) * (y2 - y1)"
    " + {hwid} * ((x2 - x1) / seg_len), 6) AS by|"
    "ROUND(x1 + LEAST((i + 1) * {sp} / seg_len, 1.0) * (x2 - x1)"
    " + {hwid} * ((y2 - y1) / seg_len), 6) AS cx|"
    "ROUND(y1 + LEAST((i + 1) * {sp} / seg_len, 1.0) * (y2 - y1)"
    " - {hwid} * ((x2 - x1) / seg_len), 6) AS cy|"
    "ROUND(x1 + LEAST(i * {sp} / seg_len, 1.0) * (x2 - x1)"
    " + {hwid} * ((y2 - y1) / seg_len), 6) AS dx|"
    "ROUND(y1 + LEAST(i * {sp} / seg_len, 1.0) * (y2 - y1)"
    " - {hwid} * ((x2 - x1) / seg_len), 6) AS dy"
)


def polygons_along_lines_oracle(spacing: float, width: float) -> str:
    sp = dlit(float(spacing))
    hwid = dlit(float(width) / 2.0)
    cols = _PAL_CORNERS.format(sp=sp, hwid=hwid).replace("|", ",\n       ")
    return world.with_layers(
        f"""
SELECT lid, CAST(i AS BIGINT) AS i,
       {cols}
FROM (
  SELECT lid, x1, y1, x2, y2,
         SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS seg_len
  FROM lines_orders
  WHERE SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) > 0.0
), LATERAL UNNEST(generate_series(0,
     CAST(CEIL(seg_len / {sp}) AS INT) - 1)) AS u(i)
""",
        "lines_orders",
    )
