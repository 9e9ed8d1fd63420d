"""Geometry transformer long tail: densify, flip, extend/trim, split,
vertices/points conversions, octagonal envelope, multipart handling,
Chaikin smoothing, kNN circles.

Reference parity map (GT = /root/reference/GeoTools/process-spatialstatistics/
src/main/java/org/geotools/process/spatialstatistics):
- ``densify``            <- GT/transformation/DensifyFeatureCollection.java:41
                            (vertices every <= tolerance along each segment)
- ``flip_lines``         <- GT/transformation/FlipLineFeatureCollection.java:40
- ``extend_lines``/``trim_lines`` <- GT/operations/ExtendLineOperation.java:51 /
                            TrimLineOperation.java:51 (endpoint offset along
                            the segment direction)
- ``split_line_by_distance`` <- GT/operations/SplitLineByDistanceOperation.java:48
- ``vertices_to_points`` <- GT/transformation/VerticesToPointsFeatureCollection
                            .java:44 (both endpoints of every segment)
- ``points_to_line``     <- GT/operations/PointsToLineOperation.java:59
                            (per-group ordered vertex chain -> segments)
- ``octagonal_envelope`` <- GT/transformation/OctagonalEnvelopeFeature
                            Collection.java:44 (min/max of x, y, x+y, x-y)
- ``singlepart_to_multipart`` <- GT/SinglepartToMultipartProcess.java:43
                            (group singleparts on an attribute)
- ``remove_parts``       <- GT/transformation/RemovePartsFeatureCollection
                            .java:46 (drop parts below an area threshold)
- ``remove_holes``       <- GT/transformation/RemoveHolesFeatureCollection
                            .java:46 (fill holes below an area threshold;
                            holes modeled as B-rects wholly inside A)
- ``smooth_chaikin``     <- GT/SmoothProcess.java:44 (vertex-doubling
                            corner-cut smoothing; documented stand-in for the
                            reference's JTS spline smoother — same vertex
                            count contract: 2(n-1) output vertices)
- ``feature_to_line``    <- GT/transformation/FeatureToLineFeatureCollection
                            .java:44 (polygon boundary -> segments)
- ``knn_circle``         <- GT/pattern/KNearestNeighborCircleOperation.java:59
                            (circle through each point's k-th neighbor)

Everything here is a narrow per-row projection/explode or a per-group
window — one scan, at most one keyed shuffle; identical SQL text runs in
the DuckDB oracle (fragments shared verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import joins, planner, world
from .world import dlit

SEG_LEN_SQL = "SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))"


def densify(segments: DataFrame, tolerance: float) -> DataFrame:
    """Insert vertices so consecutive gaps never exceed ``tolerance``:
    k = CEIL(len/tol) equal sub-segments, vertices at i/k for i in 0..k.
    Output (lid, i, vx, vy)."""
    tol = dlit(float(tolerance))
    df = planner.ensure_parallelism(segments).selectExpr(
        "lid", "x1", "y1", "x2", "y2",
        f"CAST(CEIL({SEG_LEN_SQL} / {tol}) AS BIGINT) AS k",
    )
    df = df.selectExpr(
        "lid", "x1", "y1", "x2", "y2", "k",
        "explode(sequence(CAST(0 AS BIGINT), GREATEST(k, 1))) AS i",
    )
    t = "CAST(i AS DOUBLE) / GREATEST(k, 1)"
    return df.selectExpr(
        "lid", "i",
        f"ROUND(x1 + ({t}) * (x2 - x1), 6) AS vx",
        f"ROUND(y1 + ({t}) * (y2 - y1), 6) AS vy",
    )


def densify_oracle(layer: str, tolerance: float) -> str:
    tol = dlit(float(tolerance))
    return world.with_layers(
        f"""
SELECT lid, CAST(i AS BIGINT) AS i,
       ROUND(x1 + (CAST(i AS DOUBLE) / GREATEST(k, 1)) * (x2 - x1), 6) AS vx,
       ROUND(y1 + (CAST(i AS DOUBLE) / GREATEST(k, 1)) * (y2 - y1), 6) AS vy
FROM (SELECT lid, x1, y1, x2, y2,
             CAST(CEIL({SEG_LEN_SQL} / {tol}) AS BIGINT) AS k FROM {layer}),
     LATERAL UNNEST(generate_series(0, GREATEST(k, 1))) AS u(i)
""",
        layer,
    )


def flip_lines(segments: DataFrame) -> DataFrame:
    """Reverse segment direction (FlipLineProcess)."""
    return planner.ensure_parallelism(segments).selectExpr(
        "lid",
        "ROUND(x2, 6) AS x1", "ROUND(y2, 6) AS y1",
        "ROUND(x1, 6) AS x2", "ROUND(y1, 6) AS y2",
    )


def flip_lines_oracle(layer: str) -> str:
    return world.with_layers(
        f"SELECT lid, ROUND(x2, 6) AS x1, ROUND(y2, 6) AS y1, "
        f"ROUND(x1, 6) AS x2, ROUND(y1, 6) AS y2 FROM {layer}",
        layer,
    )


_EXTEND_EXPRS = (
    "lid",
    "ROUND(x1 - d * (x2 - x1) / len, 6) AS ex1",
    "ROUND(y1 - d * (y2 - y1) / len, 6) AS ey1",
    "ROUND(x2 + d * (x2 - x1) / len, 6) AS ex2",
    "ROUND(y2 + d * (y2 - y1) / len, 6) AS ey2",
)


def extend_lines(segments: DataFrame, distance: float) -> DataFrame:
    """Extend both endpoints outward by ``distance`` along the segment
    direction; degenerate (zero-length) segments pass through unchanged."""
    d = dlit(float(distance))
    df = planner.ensure_parallelism(segments).selectExpr(
        "lid", "x1", "y1", "x2", "y2", f"{SEG_LEN_SQL} AS len", f"{d} AS d"
    ).where("len > 0.0")
    return df.selectExpr(*_EXTEND_EXPRS)


def extend_lines_oracle(layer: str, distance: float) -> str:
    d = dlit(float(distance))
    cols = ", ".join(_EXTEND_EXPRS)
    return world.with_layers(
        f"""
SELECT {cols}
FROM (SELECT lid, x1, y1, x2, y2, {SEG_LEN_SQL} AS len, {d} AS d FROM {layer})
WHERE len > 0.0
""",
        layer,
    )


def trim_lines(segments: DataFrame, distance: float) -> DataFrame:
    """Trim both endpoints inward by ``distance``; segments shorter than
    2*distance are dropped (the reference drops collapsed geometries)."""
    d = dlit(float(distance))
    df = planner.ensure_parallelism(segments).selectExpr(
        "lid", "x1", "y1", "x2", "y2", f"{SEG_LEN_SQL} AS len",
        f"CAST(-1.0 AS DOUBLE) * {d} AS d",
    ).where(f"len > 2.0 * {d}")
    return df.selectExpr(*_EXTEND_EXPRS)


def trim_lines_oracle(layer: str, distance: float) -> str:
    d = dlit(float(distance))
    cols = ", ".join(_EXTEND_EXPRS)
    return world.with_layers(
        f"""
SELECT {cols}
FROM (SELECT lid, x1, y1, x2, y2, {SEG_LEN_SQL} AS len,
             CAST(-1.0 AS DOUBLE) * {d} AS d FROM {layer})
WHERE len > 2.0 * {d}
""",
        layer,
    )


def split_line_by_distance(segments: DataFrame, piece_len: float) -> DataFrame:
    """Cut each segment into pieces of ``piece_len`` (last piece shorter).
    Output (lid, piece, px1, py1, px2, py2)."""
    pl = dlit(float(piece_len))
    df = planner.ensure_parallelism(segments).selectExpr(
        "lid", "x1", "y1", "x2", "y2", f"{SEG_LEN_SQL} AS len"
    ).where("len > 0.0")
    df = df.selectExpr(
        "lid", "x1", "y1", "x2", "y2", "len",
        f"explode(sequence(CAST(0 AS BIGINT), "
        f"CAST(CEIL(len / {pl}) AS BIGINT) - 1)) AS piece",
    )
    t0 = f"LEAST(piece * {pl} / len, 1.0)"
    t1 = f"LEAST((piece + 1) * {pl} / len, 1.0)"
    return df.selectExpr(
        "lid", "piece",
        f"ROUND(x1 + ({t0}) * (x2 - x1), 6) AS px1",
        f"ROUND(y1 + ({t0}) * (y2 - y1), 6) AS py1",
        f"ROUND(x1 + ({t1}) * (x2 - x1), 6) AS px2",
        f"ROUND(y1 + ({t1}) * (y2 - y1), 6) AS py2",
    )


def split_line_oracle(layer: str, piece_len: float) -> str:
    pl = dlit(float(piece_len))
    t0 = f"LEAST(piece * {pl} / len, 1.0)"
    t1 = f"LEAST((piece + 1) * {pl} / len, 1.0)"
    return world.with_layers(
        f"""
SELECT lid, CAST(piece AS BIGINT) AS piece,
       ROUND(x1 + ({t0}) * (x2 - x1), 6) AS px1,
       ROUND(y1 + ({t0}) * (y2 - y1), 6) AS py1,
       ROUND(x1 + ({t1}) * (x2 - x1), 6) AS px2,
       ROUND(y1 + ({t1}) * (y2 - y1), 6) AS py2
FROM (SELECT lid, x1, y1, x2, y2, {SEG_LEN_SQL} AS len FROM {layer}
      WHERE {SEG_LEN_SQL} > 0.0),
     LATERAL UNNEST(generate_series(0, CAST(CEIL(len / {pl}) AS BIGINT) - 1))
       AS u(piece)
""",
        layer,
    )


def vertices_to_points(segments: DataFrame) -> DataFrame:
    """Both endpoints of every segment: (lid, which, vx, vy)."""
    df = planner.ensure_parallelism(segments)
    a = df.selectExpr("lid", "0 AS which", "ROUND(x1, 6) AS vx",
                      "ROUND(y1, 6) AS vy")
    b = df.selectExpr("lid", "1 AS which", "ROUND(x2, 6) AS vx",
                      "ROUND(y2, 6) AS vy")
    return a.unionByName(b).selectExpr(
        "lid", "CAST(which AS INT) AS which", "vx", "vy"
    )


def vertices_to_points_oracle(layer: str) -> str:
    return world.with_layers(
        f"""
SELECT lid, CAST(0 AS INT) AS which, ROUND(x1, 6) AS vx, ROUND(y1, 6) AS vy
FROM {layer}
UNION ALL
SELECT lid, CAST(1 AS INT) AS which, ROUND(x2, 6) AS vx, ROUND(y2, 6) AS vy
FROM {layer}
""",
        layer,
    )


def points_to_line(points: DataFrame, group_col: str = "cat") -> DataFrame:
    """Per-group ordered vertex chain -> consecutive segments
    (PointsToLineProcess, order by pid = the reference's sort field).
    Output (cat, seq, x1, y1, x2, y2)."""
    w = Window.partitionBy(group_col).orderBy("pid")
    df = planner.ensure_parallelism(points.select(group_col, "pid", "x", "y"))
    df = (
        df.withColumn("nx", F.lead("x").over(w))
        .withColumn("ny", F.lead("y").over(w))
        .withColumn("seq", F.row_number().over(w))
        .where(F.col("nx").isNotNull())
    )
    return df.select(
        F.col(group_col),
        F.col("seq").cast("long").alias("seq"),
        F.round("x", 6).alias("x1"), F.round("y", 6).alias("y1"),
        F.round("nx", 6).alias("x2"), F.round("ny", 6).alias("y2"),
    )


def points_to_line_oracle(layer: str = "points_events",
                          group_col: str = "cat") -> str:
    return world.with_layers(
        f"""
SELECT {group_col}, CAST(seq AS BIGINT) AS seq,
       ROUND(x, 6) AS x1, ROUND(y, 6) AS y1,
       ROUND(nx, 6) AS x2, ROUND(ny, 6) AS y2
FROM (
  SELECT {group_col}, x, y,
         LEAD(x) OVER (PARTITION BY {group_col} ORDER BY pid) AS nx,
         LEAD(y) OVER (PARTITION BY {group_col} ORDER BY pid) AS ny,
         ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY pid) AS seq
  FROM {layer}
) WHERE nx IS NOT NULL
""",
        layer,
    )


def octagonal_envelope(points: DataFrame, group_col: str = "cat") -> DataFrame:
    """Per group: the octagonal envelope parameters — extremes of x, y,
    x+y, x-y (the 4 support-line families of the octagon)."""
    df = planner.ensure_parallelism(points)
    return df.groupBy(group_col).agg(
        F.round(F.min("x"), 6).alias("xmin"),
        F.round(F.max("x"), 6).alias("xmax"),
        F.round(F.min("y"), 6).alias("ymin"),
        F.round(F.max("y"), 6).alias("ymax"),
        F.round(F.min(F.col("x") + F.col("y")), 6).alias("dmin"),
        F.round(F.max(F.col("x") + F.col("y")), 6).alias("dmax"),
        F.round(F.min(F.col("x") - F.col("y")), 6).alias("amin"),
        F.round(F.max(F.col("x") - F.col("y")), 6).alias("amax"),
    )


def octagonal_envelope_oracle(layer: str = "points_events",
                              group_col: str = "cat") -> str:
    return world.with_layers(
        f"""
SELECT {group_col},
       ROUND(MIN(x), 6) AS xmin, ROUND(MAX(x), 6) AS xmax,
       ROUND(MIN(y), 6) AS ymin, ROUND(MAX(y), 6) AS ymax,
       ROUND(MIN(x + y), 6) AS dmin, ROUND(MAX(x + y), 6) AS dmax,
       ROUND(MIN(x - y), 6) AS amin, ROUND(MAX(x - y), 6) AS amax
FROM {layer} GROUP BY {group_col}
""",
        layer,
    )


def singlepart_to_multipart(rects: DataFrame, group_col: str = "seg") -> DataFrame:
    """Group singlepart rects into multipart features on an attribute:
    (seg, n_parts, total_area, env bbox)."""
    df = planner.ensure_parallelism(rects)
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum(
            F.expr("CAST(FLOOR(4.0 * hw * hh * 1000000.0 + 0.5) AS BIGINT)")
        ) / 1e6, 6).alias("total_area"),
        F.round(F.min(F.expr("cx - hw")), 6).alias("exmin"),
        F.round(F.min(F.expr("cy - hh")), 6).alias("eymin"),
        F.round(F.max(F.expr("cx + hw")), 6).alias("exmax"),
        F.round(F.max(F.expr("cy + hh")), 6).alias("eymax"),
    )


def singlepart_to_multipart_oracle(layer: str = "rects_customer",
                                   group_col: str = "seg") -> str:
    return world.with_layers(
        f"""
SELECT {group_col}, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(CAST(FLOOR(4.0 * hw * hh * 1000000.0 + 0.5) AS BIGINT))
             AS DOUBLE) / 1e6, 6) AS total_area,
       ROUND(MIN(cx - hw), 6) AS exmin, ROUND(MIN(cy - hh), 6) AS eymin,
       ROUND(MAX(cx + hw), 6) AS exmax, ROUND(MAX(cy + hh), 6) AS eymax
FROM {layer} GROUP BY {group_col}
""",
        layer,
    )


def remove_parts(rects: DataFrame, min_area: float,
                 group_col: str = "seg") -> DataFrame:
    """Multipart part filter: drop parts below ``min_area`` from each
    multipart group. Output (seg, n_kept, n_dropped, kept_area)."""
    ma = dlit(float(min_area))
    df = planner.ensure_parallelism(rects).withColumn(
        "part_area", F.expr("4.0 * hw * hh")
    )
    return df.groupBy(group_col).agg(
        F.sum(F.expr(f"CASE WHEN part_area >= {ma} THEN 1 ELSE 0 END"))
        .cast("long").alias("n_kept"),
        F.sum(F.expr(f"CASE WHEN part_area < {ma} THEN 1 ELSE 0 END"))
        .cast("long").alias("n_dropped"),
        F.round(F.sum(F.expr(
            f"CASE WHEN part_area >= {ma} THEN "
            "CAST(FLOOR(part_area * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END"
        )) / 1e6, 6).alias("kept_area"),
    )


def remove_parts_oracle(layer: str, min_area: float,
                        group_col: str = "seg") -> str:
    ma = dlit(float(min_area))
    return world.with_layers(
        f"""
SELECT {group_col},
       CAST(SUM(CASE WHEN part_area >= {ma} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN part_area < {ma} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       ROUND(CAST(SUM(CASE WHEN part_area >= {ma} THEN
             CAST(FLOOR(part_area * 1000000.0 + 0.5) AS BIGINT)
             ELSE 0 END) AS DOUBLE) / 1e6, 6) AS kept_area
FROM (SELECT {group_col}, 4.0 * hw * hh AS part_area FROM {layer})
GROUP BY {group_col}
""",
        layer,
    )


def remove_holes(a: DataFrame, b: DataFrame, min_area: float) -> DataFrame:
    """Fill holes smaller than ``min_area``: holes are B-rects wholly inside
    an A-rect. Output per A with >=1 hole: (rid, n_holes, n_filled,
    net_area = area(A) - Σ area(kept holes))."""
    from . import cells

    ma = float(min_area)
    cs = cells.DEFAULT_CELL_SIZE
    aa = cells.explode_extent_cells(
        world.rect_corners(planner.ensure_parallelism(a)), cell_size=cs
    )
    bb = planner.ensure_parallelism(b).select(
        F.col("rid").alias("hid"),
        F.col("cx").alias("bcx"), F.col("cy").alias("bcy"),
        F.col("hw").alias("bhw"), F.col("hh").alias("bhh"),
        F.expr(f"CAST(FLOOR(cx / {cs}) AS BIGINT)").alias("cell_x"),
        F.expr(f"CAST(FLOOR(cy / {cs}) AS BIGINT)").alias("cell_y"),
    )
    j = aa.join(bb, on=["cell_x", "cell_y"], how="inner").where(
        F.expr(
            "bcx - bhw >= cx - hw AND bcx + bhw <= cx + hw AND "
            "bcy - bhh >= cy - hh AND bcy + bhh <= cy + hh"
        )
    )
    # one cell owns the hole (its center cell) so no dedup needed
    return j.groupBy("rid").agg(
        F.count(F.lit(1)).alias("n_holes"),
        F.sum(F.expr(
            f"CASE WHEN 4.0 * bhw * bhh < {dlit(ma)} THEN 1 ELSE 0 END"
        )).cast("long").alias("n_filled"),
        F.round(
            (F.first(F.expr(
                "CAST(FLOOR(4.0 * hw * hh * 1000000.0 + 0.5) AS BIGINT)"))
             - F.sum(F.expr(
                f"CASE WHEN 4.0 * bhw * bhh >= {dlit(ma)} THEN "
                "CAST(FLOOR(4.0 * bhw * bhh * 1000000.0 + 0.5) AS BIGINT) "
                "ELSE 0 END"))) / 1e6,
            6,
        ).alias("net_area"),
    )


def remove_holes_oracle(a_layer: str, b_layer: str, min_area: float) -> str:
    ma = dlit(float(min_area))
    return world.with_layers(
        f"""
SELECT a.rid AS rid, CAST(COUNT(*) AS BIGINT) AS n_holes,
       CAST(SUM(CASE WHEN 4.0 * b.hw * b.hh < {ma} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_filled,
       ROUND(CAST(MIN(CAST(FLOOR(4.0 * a.hw * a.hh * 1000000.0 + 0.5)
                  AS BIGINT))
             - SUM(CASE WHEN 4.0 * b.hw * b.hh >= {ma} THEN
                   CAST(FLOOR(4.0 * b.hw * b.hh * 1000000.0 + 0.5) AS BIGINT)
                   ELSE 0 END) AS DOUBLE) / 1e6, 6) AS net_area
FROM {a_layer} a JOIN {b_layer} b
  ON b.cx - b.hw >= a.cx - a.hw AND b.cx + b.hw <= a.cx + a.hw
 AND b.cy - b.hh >= a.cy - a.hh AND b.cy + b.hh <= a.cy + a.hh
GROUP BY a.rid
""",
        a_layer, b_layer,
    )


def smooth_chaikin(points: DataFrame, group_col: str = "cat") -> DataFrame:
    """One Chaikin corner-cutting pass over each group's ordered polyline:
    every consecutive vertex pair yields points at t=1/4 and t=3/4.
    Output (cat, seq, which, qx, qy)."""
    segs = points_to_line(points, group_col)
    df = segs.selectExpr(
        group_col, "seq", "x1", "y1", "x2", "y2",
        "explode(array(0, 1)) AS which",
    )
    t = "CASE WHEN which = 0 THEN 0.25 ELSE 0.75 END"
    return df.selectExpr(
        group_col, "seq", "CAST(which AS INT) AS which",
        f"ROUND(x1 + ({t}) * (x2 - x1), 6) AS qx",
        f"ROUND(y1 + ({t}) * (y2 - y1), 6) AS qy",
    )


def smooth_chaikin_oracle(layer: str = "points_events",
                          group_col: str = "cat") -> str:
    t = "CASE WHEN which = 0 THEN 0.25 ELSE 0.75 END"
    return world.with_layers(
        f"""
SELECT {group_col}, seq, CAST(which AS INT) AS which,
       ROUND(x1 + ({t}) * (x2 - x1), 6) AS qx,
       ROUND(y1 + ({t}) * (y2 - y1), 6) AS qy
FROM (
  SELECT {group_col}, CAST(seq AS BIGINT) AS seq,
         ROUND(x, 6) AS x1, ROUND(y, 6) AS y1,
         ROUND(nx, 6) AS x2, ROUND(ny, 6) AS y2
  FROM (
    SELECT {group_col}, x, y,
           LEAD(x) OVER (PARTITION BY {group_col} ORDER BY pid) AS nx,
           LEAD(y) OVER (PARTITION BY {group_col} ORDER BY pid) AS ny,
           ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY pid) AS seq
    FROM {layer}
  ) WHERE nx IS NOT NULL
), LATERAL UNNEST([0, 1]) AS u(which)
""",
        layer,
    )


def feature_to_line(rects: DataFrame) -> DataFrame:
    """Polygon boundary -> 4 directed segments per rect (CCW from SW).
    Output (rid, side, x1, y1, x2, y2)."""
    df = planner.ensure_parallelism(rects).selectExpr(
        "rid",
        "cx - hw AS x0", "cx + hw AS xz", "cy - hh AS y0", "cy + hh AS yz",
    ).selectExpr("rid", "x0", "xz", "y0", "yz",
                 "explode(array(0, 1, 2, 3)) AS side")
    return df.selectExpr(
        "rid", "CAST(side AS INT) AS side",
        "ROUND(CASE side WHEN 0 THEN x0 WHEN 1 THEN xz WHEN 2 THEN xz ELSE x0 END, 6) AS x1",
        "ROUND(CASE side WHEN 0 THEN y0 WHEN 1 THEN y0 WHEN 2 THEN yz ELSE yz END, 6) AS y1",
        "ROUND(CASE side WHEN 0 THEN xz WHEN 1 THEN xz WHEN 2 THEN x0 ELSE x0 END, 6) AS x2",
        "ROUND(CASE side WHEN 0 THEN y0 WHEN 1 THEN yz WHEN 2 THEN yz ELSE y0 END, 6) AS y2",
    )


def feature_to_line_oracle(layer: str = "rects_customer") -> str:
    return world.with_layers(
        f"""
SELECT rid, CAST(side AS INT) AS side,
       ROUND(CASE side WHEN 0 THEN x0 WHEN 1 THEN xz WHEN 2 THEN xz ELSE x0 END, 6) AS x1,
       ROUND(CASE side WHEN 0 THEN y0 WHEN 1 THEN y0 WHEN 2 THEN yz ELSE yz END, 6) AS y1,
       ROUND(CASE side WHEN 0 THEN xz WHEN 1 THEN xz WHEN 2 THEN x0 ELSE x0 END, 6) AS x2,
       ROUND(CASE side WHEN 0 THEN y0 WHEN 1 THEN yz WHEN 2 THEN yz ELSE y0 END, 6) AS y2
FROM (SELECT rid, cx - hw AS x0, cx + hw AS xz, cy - hh AS y0, cy + hh AS yz
      FROM {layer}),
     LATERAL UNNEST([0, 1, 2, 3]) AS u(side)
""",
        layer,
    )


def knn_circle(points: DataFrame, k: int, radius: float) -> DataFrame:
    """Per point: the circle through its k-th nearest neighbor —
    (pid, k_dist, circle_area). Bounded-radius narrowing as in knn_join."""
    topk = joins.knn_join(points, points, k=k, radius=radius,
                          exclude_self=True)
    kth = topk.where(F.col("rank") == k)
    pi = dlit(3.141592653589793)
    return kth.select(
        F.col("pid_l").alias("pid"),
        F.col("dist").alias("k_dist"),
        F.round(F.expr(f"{pi} * dist * dist"), 6).alias("circle_area"),
    )


def knn_circle_oracle(layer: str, k: int, radius: float) -> str:
    r2 = dlit(float(radius) * float(radius))
    pi = dlit(3.141592653589793)
    return world.with_layers(
        f"""
SELECT pid, k_dist, ROUND({pi} * k_dist * k_dist, 6) AS circle_area FROM (
  SELECT a.pid AS pid,
         ROUND(SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6)
           AS k_dist,
         ROW_NUMBER() OVER (PARTITION BY a.pid
           ORDER BY (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) ASC,
                    b.pid ASC) AS rn
  FROM {layer} a JOIN {layer} b
    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {r2}
   AND a.pid <> b.pid
) WHERE rn = {k}
""",
        layer,
    )


# ---------------------------------------------------------------------------
# Grouped numpy-kernel transformers (no SQL closed form): minimum bounding
# circle + minimum rotated rectangle per feature group
# ---------------------------------------------------------------------------


def min_bounding_circles(points: DataFrame, group_col: str = "cat") -> DataFrame:
    """FeatureToMinimumBoundingCircleProcess per group: (cat, mbc_x, mbc_y,
    mbc_r). Arrow-batched Welzl over each group's hull (applyInPandas);
    rows-only gate (non-SQL kernel), brute-force-verified in tests."""
    import pandas as pd

    from . import geomlib

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        xs = pdf["x"].to_numpy(dtype=np.float64)
        ys = pdf["y"].to_numpy(dtype=np.float64)
        cx, cy, r = geomlib.min_bounding_circle(xs, ys)
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]],
             "mbc_x": [round(cx, 6)], "mbc_y": [round(cy, 6)],
             "mbc_r": [round(r, 6)]}
        )

    schema = f"{group_col} string, mbc_x double, mbc_y double, mbc_r double"
    return (
        planner.ensure_parallelism(points.select(group_col, "x", "y"))
        .groupBy(group_col)
        .applyInPandas(per_group, schema=schema)
    )


def min_rotated_rects(points: DataFrame, group_col: str = "cat") -> DataFrame:
    """FeatureToMinimumRectangleProcess per group: (cat, mrr_area, mrr_w,
    mrr_h). Rotating calipers over the group hull."""
    import pandas as pd

    from . import geomlib

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        xs = pdf["x"].to_numpy(dtype=np.float64)
        ys = pdf["y"].to_numpy(dtype=np.float64)
        area, _ang, w, h = geomlib.min_rotated_rect(xs, ys)
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]],
             "mrr_area": [round(area, 6)],
             "mrr_w": [round(w, 6)], "mrr_h": [round(h, 6)]}
        )

    schema = f"{group_col} string, mrr_area double, mrr_w double, mrr_h double"
    return (
        planner.ensure_parallelism(points.select(group_col, "x", "y"))
        .groupBy(group_col)
        .applyInPandas(per_group, schema=schema)
    )


def delaunay_groups(points: DataFrame, group_col: str = "cat") -> DataFrame:
    """DelaunayTriangulationProcess per group: (cat, n_points, n_triangles,
    tri_area). Bowyer-Watson per group inside applyInPandas; the
    triangulation area equals the convex hull area (pytest invariant) and
    n_triangles obeys Euler's 2n-2-h."""
    import pandas as pd

    from . import geomlib

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        xs = pdf["x"].to_numpy(dtype=np.float64)
        ys = pdf["y"].to_numpy(dtype=np.float64)
        tris, pts = geomlib.delaunay(xs, ys)
        areas, _ = geomlib.tri_metrics(tris, pts)
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]],
             "n_points": [len(pts)], "n_triangles": [len(tris)],
             "tri_area": [round(float(areas.sum()), 6)]}
        )

    schema = (
        f"{group_col} string, n_points long, n_triangles long, tri_area double"
    )
    return (
        planner.ensure_parallelism(points.select(group_col, "x", "y"))
        .groupBy(group_col)
        .applyInPandas(per_group, schema=schema)
    )


def hull_count_sql(src_sql: str) -> str:
    """Engine-shared SQL: per-group convex-hull VERTEX COUNT over
    (cat, pid, x, y) rows — an independent hull implementation used to
    cross-check the Delaunay kernel via Euler's relation.

    Per point p: sort its co-group points by direction angle around p;
    p is a hull vertex iff some consecutive angular gap (incl. the wrap
    from last back to first) is >= pi. The >= pi decision is EXACT
    integer arithmetic on millicoordinate vectors — cross(v, next) < 0,
    or = 0 with negative dot (antipodal) — ATAN2 only ORDERS directions
    (sub-ulp engine differences can only reorder equal-direction ties,
    whose zero gaps never flip the flag). O(n^2 log n) per group."""
    from .overlay_diff import mm_sql

    return f"""
pts AS (
  SELECT cat, pid, {mm_sql('x')} AS xm, {mm_sql('y')} AS ym FROM ({src_sql}) __src
),
vec AS (
  SELECT a.cat AS cat, a.pid AS pid, b.pid AS qid,
         (b.xm - a.xm) AS dx, (b.ym - a.ym) AS dy,
         ATAN2(CAST(b.ym - a.ym AS DOUBLE), CAST(b.xm - a.xm AS DOUBLE)) AS ang
  FROM pts a JOIN pts b ON a.cat = b.cat AND a.pid <> b.pid
),
ring AS (
  SELECT cat, pid, dx, dy,
         COALESCE(LEAD(dx) OVER w, FIRST_VALUE(dx) OVER w) AS ndx,
         COALESCE(LEAD(dy) OVER w, FIRST_VALUE(dy) OVER w) AS ndy
  FROM vec
  WINDOW w AS (PARTITION BY cat, pid ORDER BY ang ASC, qid ASC)
),
hflag AS (
  SELECT cat, pid,
         MAX(CASE WHEN (ndx * dy - ndy * dx) > 0
                    OR ((ndx * dy - ndy * dx) = 0
                        AND (ndx * dx + ndy * dy) < 0)
              THEN 1 ELSE 0 END) AS on_hull
  FROM ring GROUP BY cat, pid
),
hullcnt AS (
  SELECT cat, CAST(SUM(on_hull) AS BIGINT) AS h FROM hflag GROUP BY cat
)"""


DELAUNAY_CAT_SQL = (
    "SELECT CAST(pid % 5 AS STRING) AS cat, pid, x, y FROM points_part"
)


def delaunay_euler_oracle() -> str:
    """Closed-relation oracle for the Delaunay twin: n_triangles must be
    2n - 2 - h with h from the INDEPENDENT SQL hull above (Euler's
    relation for a triangulation of the convex hull) — bit-exact integer
    topology check against the Bowyer-Watson kernel."""
    return world.with_layers(
        f"""
WITH {hull_count_sql(DELAUNAY_CAT_SQL)}
SELECT n.cat AS cat, n.n AS n_points,
       CAST(2 * n.n - 2 - hc.h AS BIGINT) AS n_triangles
FROM (SELECT cat, CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY cat) n
JOIN hullcnt hc ON hc.cat = n.cat
""",
        "points_part",
    )


def concave_hull_groups(
    points: DataFrame, alpha: float, group_col: str = "cat"
) -> DataFrame:
    """ConcaveHullProcess per group as the alpha-shape of the Delaunay
    triangulation: (cat, hull_area, n_kept_tris, n_boundary_edges).
    hull_area <= convex hull area (pytest invariant)."""
    import pandas as pd

    from . import geomlib

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        xs = pdf["x"].to_numpy(dtype=np.float64)
        ys = pdf["y"].to_numpy(dtype=np.float64)
        area, nk, nb = geomlib.alpha_shape_metrics(xs, ys, float(alpha))
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]],
             "hull_area": [round(area, 6)], "n_kept_tris": [nk],
             "n_boundary_edges": [nb]}
        )

    schema = (
        f"{group_col} string, hull_area double, n_kept_tris long, "
        "n_boundary_edges long"
    )
    return (
        planner.ensure_parallelism(points.select(group_col, "x", "y"))
        .groupBy(group_col)
        .applyInPandas(per_group, schema=schema)
    )


def thiessen_groups(points: DataFrame, group_col: str = "cat") -> DataFrame:
    """ThiessenPolygonProcess per group: one row per site with its exact
    Voronoi cell invariants (cell_area, n_verts) clipped to the group's
    20%-expanded point bbox (GT/operations/ThiessenPolygonOperation.java:
    88-103 — JTS VoronoiDiagramBuilder with clipEnvelope expanded by 0.2).

    The vector kernel (geomlib.voronoi_metrics: iterated half-plane
    clipping) is exact but O(n^2) per group — the per-feature-group path;
    the globally scalable variant remains the raster-form
    ``discrete_voronoi`` (SURVEY §7.4). Gate invariant: the cells tile the
    expanded bbox, so sum(cell_area) per group == bbox area (verified in
    pytest; rows-only driver gate — Voronoi topology is not
    SQL-expressible)."""
    import pandas as pd

    from . import geomlib

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        xs = pdf["x"].to_numpy(dtype=np.float64)
        ys = pdf["y"].to_numpy(dtype=np.float64)
        areas, nverts, bbox = geomlib.voronoi_metrics(xs, ys)
        return pd.DataFrame(
            {group_col: pdf[group_col],
             "pid": pdf["pid"],
             "cell_area": np.round(areas, 6),
             "n_verts": nverts,
             "bbox_area": round((bbox[2] - bbox[0]) * (bbox[3] - bbox[1]), 6)}
        )

    schema = (
        f"{group_col} string, pid long, cell_area double, n_verts long, "
        "bbox_area double"
    )
    return (
        planner.ensure_parallelism(points.select(group_col, "pid", "x", "y"))
        .groupBy(group_col)
        .applyInPandas(per_group, schema=schema)
    )


def repair_rings(rects: DataFrame) -> DataFrame:
    """RepairGeometryProcess (GT/RepairGeometryProcess.java:41: validate +
    fix via GeoTools FeatureFactory): close rings, drop consecutive
    duplicate vertices, normalize to CCW, reject degenerate rings.

    The query side synthesizes a deterministic DIRTY ring per rect as an
    array<struct<x,y>> column — the repo's generic-polygon vertex
    representation: corner order reversed (CW) for odd rids, corner 2
    duplicated, the closing vertex repeated, and every 13th ring collapsed
    to a degenerate point. The Arrow-batched kernel (geomlib.repair_ring)
    repairs each ring; output (rid, n_verts, area, valid, fx, fy) has a
    closed-form DuckDB oracle because the dirty transform is known."""
    import pandas as pd
    from pyspark.sql import types as T

    from . import geomlib

    # dirty ring: CCW corners v0..v3 for even rid, reversed for odd; v2
    # duplicated; explicit closure (first vertex appended); rid % 13 == 0
    # collapses all vertices to the center.
    ring = rects.selectExpr(
        "rid",
        "CASE WHEN rid % 13 = 0 THEN "
        " array(struct(cx AS x, cy AS y), struct(cx AS x, cy AS y),"
        "       struct(cx AS x, cy AS y)) "
        "WHEN rid % 2 = 0 THEN "
        " array(struct(cx - hw AS x, cy - hh AS y),"
        "       struct(cx + hw AS x, cy - hh AS y),"
        "       struct(cx + hw AS x, cy + hh AS y),"
        "       struct(cx + hw AS x, cy + hh AS y),"
        "       struct(cx - hw AS x, cy + hh AS y),"
        "       struct(cx - hw AS x, cy - hh AS y)) "
        "ELSE "
        " array(struct(cx - hw AS x, cy - hh AS y),"
        "       struct(cx - hw AS x, cy + hh AS y),"
        "       struct(cx + hw AS x, cy + hh AS y),"
        "       struct(cx + hw AS x, cy + hh AS y),"
        "       struct(cx + hw AS x, cy - hh AS y),"
        "       struct(cx - hw AS x, cy - hh AS y)) "
        "END AS ring",
    )

    out_schema = T.StructType([
        T.StructField("rid", T.LongType()),
        T.StructField("n_verts", T.LongType()),
        T.StructField("area", T.DoubleType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("fx", T.DoubleType()),
        T.StructField("fy", T.DoubleType()),
    ])

    def repair(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for rid, verts in zip(pdf["rid"], pdf["ring"]):
                xs = np.asarray([v["x"] for v in verts], dtype=np.float64)
                ys = np.asarray([v["y"] for v in verts], dtype=np.float64)
                rx, ry, ok = geomlib.repair_ring(xs, ys)
                area = geomlib.shoelace(np.column_stack([rx, ry])) if ok else 0.0
                rows.append(
                    (rid, len(rx), round(float(area), 6), bool(ok),
                     float(rx[0]) if ok else None,
                     float(ry[0]) if ok else None)
                )
            yield pd.DataFrame(
                rows, columns=["rid", "n_verts", "area", "valid", "fx", "fy"]
            )

    return planner.ensure_parallelism(ring).mapInPandas(repair, schema=out_schema)


def repair_rings_oracle(layer: str = "rects_customer") -> str:
    """Closed-form oracle: the dirty transform is deterministic, so the
    repaired invariants are direct expressions of (cx, cy, hw, hh)."""
    from .overlay_diff import mm_sql

    return world.with_layers(
        f"""
SELECT rid,
       CAST(CASE WHEN rid % 13 = 0 THEN 1 ELSE 4 END AS BIGINT) AS n_verts,
       rid % 13 <> 0 AS valid,
       CASE WHEN rid % 13 = 0 THEN 0
            ELSE 4 * {mm_sql('hw')} * {mm_sql('hh')} END AS area_um2,
       CASE WHEN rid % 13 = 0 THEN NULL
            WHEN rid % 2 = 0 THEN {mm_sql('cx - hw')}
            ELSE {mm_sql('cx + hw')} END AS fx_mm,
       CASE WHEN rid % 13 = 0 THEN NULL
            ELSE {mm_sql('cy - hh')} END AS fy_mm
FROM {layer}
""",
        layer,
    )


# ---------------------------------------------------------------------------
# FeatureToPolygonProcess — polygonize a bare segment soup
# (GT/operations/FeatureToPolygonOperation.java:48, JTS Polygonizer)
# ---------------------------------------------------------------------------


def polygonize(segs: DataFrame, iterations: int = 2) -> DataFrame:
    """Assemble closed polygons from an UNLABELLED segment table
    (sid, x1, y1, x2, y2) — endpoints matched exactly on mm-quantized
    coordinates.

    Distributed plan: connected components by min-label propagation over
    shared endpoints (each round: per-node min of incident segment labels,
    then per-segment min of its nodes' labels — a pair of keyed aggregations
    per round, no driver participation), then per-component ring assembly
    in an Arrow batch (geomlib.assemble_ring). ``iterations`` bounds the
    propagated graph distance: i rounds cover rings of diameter <= 2**i is
    NOT available from plain neighbour passes — each round moves labels one
    edge, so rings need ceil(diameter/1) rounds; quadrilateral rings
    (diameter 2) close in the default 2. The reference's JTS Polygonizer
    is single-node global; bounding the component diameter is the 100 TB
    contract (unbounded components need iterate-to-fixpoint, which the
    ``iterations`` knob expresses explicitly).

    Output: (comp, n_segs, n_verts, area, closed).
    """
    from pyspark.sql import types as T

    from . import geomlib

    mmx = "CAST(FLOOR(x{e} * 1000.0 + 0.5) AS BIGINT)"
    mmy = "CAST(FLOOR(y{e} * 1000.0 + 0.5) AS BIGINT)"
    ends = (
        segs.selectExpr("sid", mmx.format(e="1") + " AS kx",
                        mmy.format(e="1") + " AS ky")
        .unionByName(
            segs.selectExpr("sid", mmx.format(e="2") + " AS kx",
                            mmy.format(e="2") + " AS ky")
        )
    )
    lab = segs.selectExpr("sid", "sid AS lab")
    for _ in range(iterations):
        le = ends.join(lab, "sid")
        nb = le.groupBy("kx", "ky").agg(F.min("lab").alias("nlab"))
        lab = (
            le.join(nb, ["kx", "ky"])
            .groupBy("sid")
            .agg(F.min(F.least(F.col("lab"), F.col("nlab"))).alias("lab"))
        )

    ring = segs.join(lab, "sid").selectExpr(
        "lab AS comp",
        "CAST(" + mmx.format(e="1") + " AS DOUBLE) / 1000.0 AS x1",
        "CAST(" + mmy.format(e="1") + " AS DOUBLE) / 1000.0 AS y1",
        "CAST(" + mmx.format(e="2") + " AS DOUBLE) / 1000.0 AS x2",
        "CAST(" + mmy.format(e="2") + " AS DOUBLE) / 1000.0 AS y2",
    )

    out_schema = T.StructType([
        T.StructField("comp", T.LongType()),
        T.StructField("n_segs", T.LongType()),
        T.StructField("n_verts", T.LongType()),
        T.StructField("area", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ])

    def per_comp(pdf):
        import numpy as np
        import pandas as pd

        rows = []
        for comp, grp in pdf.groupby("comp"):
            nv, area, ok = geomlib.assemble_ring(
                grp["x1"].to_numpy(), grp["y1"].to_numpy(),
                grp["x2"].to_numpy(), grp["y2"].to_numpy(),
            )
            rows.append((comp, len(grp), nv, round(float(area), 6), ok))
        return pd.DataFrame(
            rows, columns=["comp", "n_segs", "n_verts", "area", "closed"]
        )

    return ring.groupBy("comp").applyInPandas(per_comp, schema=out_schema)


#: Per-rid inset (integer mm): distinct insets per rect make coincident
#: corners between different rects (which would merge components and are
#: out of the single-ring assembly contract) astronomically unlikely in
#: the synthetic world, while keeping every coordinate an exact integer
#: millimeter. Clamped so the inset rect stays non-degenerate.
_INSET_MM = (
    "GREATEST(LEAST(rid % 89 + 1, "
    "LEAST({hw_mm}, {hh_mm}) - 1), 0)"
)


def _inset_sql(layer_cols: bool = True) -> dict[str, str]:
    from .overlay_diff import mm_sql

    hw_mm, hh_mm = mm_sql("hw"), mm_sql("hh")
    i_mm = _INSET_MM.format(hw_mm=hw_mm, hh_mm=hh_mm)
    return {
        "i_mm": i_mm,
        "x0": f"CAST({mm_sql('cx - hw')} + {i_mm} AS DOUBLE) / 1000.0",
        "xz": f"CAST({mm_sql('cx + hw')} - {i_mm} AS DOUBLE) / 1000.0",
        "y0": f"CAST({mm_sql('cy - hh')} + {i_mm} AS DOUBLE) / 1000.0",
        "yz": f"CAST({mm_sql('cy + hh')} - {i_mm} AS DOUBLE) / 1000.0",
    }


def inset_boundary_segments(rects: DataFrame) -> DataFrame:
    """Anonymous segment soup: per-rid-inset rect boundaries with
    sid = rid * 4 + side and the rid column DROPPED — polygonize must
    recover the rings from geometry alone."""
    s = _inset_sql()
    df = planner.ensure_parallelism(rects).selectExpr(
        "rid", f"{s['x0']} AS x0", f"{s['xz']} AS xz",
        f"{s['y0']} AS y0", f"{s['yz']} AS yz",
    ).selectExpr(
        "rid", "x0", "xz", "y0", "yz",
        "explode(array(0, 1, 2, 3)) AS side",
    )
    return df.selectExpr(
        "rid * 4 + side AS sid",
        "CASE side WHEN 0 THEN x0 WHEN 1 THEN xz WHEN 2 THEN xz ELSE x0 END AS x1",
        "CASE side WHEN 0 THEN y0 WHEN 1 THEN y0 WHEN 2 THEN yz ELSE yz END AS y1",
        "CASE side WHEN 0 THEN xz WHEN 1 THEN xz WHEN 2 THEN x0 ELSE x0 END AS x2",
        "CASE side WHEN 0 THEN y0 WHEN 1 THEN yz WHEN 2 THEN yz ELSE y0 END AS y2",
    )


def polygonize_oracle(layer: str = "rects_customer") -> str:
    """Closed form: each rect's 4 inset boundary segments form one
    component labelled min(sid) = rid * 4, assembling to a 4-vertex closed
    ring of area 4 * (hw - inset) * (hh - inset)."""
    from .overlay_diff import mm_sql

    hw_mm, hh_mm = mm_sql("hw"), mm_sql("hh")
    i_mm = _INSET_MM.format(hw_mm=hw_mm, hh_mm=hh_mm)
    return world.with_layers(
        f"""
SELECT rid * 4 AS comp,
       CAST(4 AS BIGINT) AS n_segs,
       CAST(4 AS BIGINT) AS n_verts,
       4 * ({hw_mm} - {i_mm}) * ({hh_mm} - {i_mm}) AS area_um2,
       TRUE AS closed
FROM {layer}
WHERE {hw_mm} - {i_mm} > 0 AND {hh_mm} - {i_mm} > 0
""",
        layer,
    )


def tin_interpolation_groups(
    points: DataFrame, group_col: str = "cat"
) -> DataFrame:
    """TINInterpolationProcess per group (GT/gridcoverage/
    TINInterpolationProcess: linear barycentric interpolation over the
    Delaunay TIN of control points). Input rows carry ``is_ctl`` (1 =
    control with value ``v``, 0 = query); output (cat, pid, iv) for
    in-hull queries. Rows-only gate — TIN topology is not SQL-expressible;
    the kernel reproduces linear fields exactly (pytest)."""
    import pandas as pd
    from pyspark.sql import types as T

    from . import geomlib

    schema = T.StructType([
        T.StructField(group_col, T.StringType()),
        T.StructField("pid", T.LongType()),
        T.StructField("iv", T.DoubleType()),
    ])

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        ctl = pdf[pdf["is_ctl"] == 1]
        qry = pdf[pdf["is_ctl"] == 0]
        if len(ctl) < 3 or len(qry) == 0:
            return pd.DataFrame({group_col: [], "pid": [], "iv": []})
        out = geomlib.tin_interpolate(
            ctl["x"].to_numpy(), ctl["y"].to_numpy(), ctl["v"].to_numpy(),
            qry["x"].to_numpy(), qry["y"].to_numpy(),
        )
        keep = ~np.isnan(out)
        return pd.DataFrame(
            {group_col: qry[group_col].to_numpy()[keep],
             "pid": qry["pid"].to_numpy()[keep],
             "iv": np.round(out[keep], 6)}
        )

    return (
        planner.ensure_parallelism(
            points.select(group_col, "pid", "x", "y", "is_ctl", "v")
        )
        .groupBy(group_col)
        .applyInPandas(per_group, schema=schema)
    )


def max_inscribed_rects(points: DataFrame, group_col: str = "cat") -> DataFrame:
    """FeatureToMaximumInscribedRectangleProcess per group (GT/util/
    MaximumInscribedRectangle.java:144-262: 40x40 cell-center
    rasterization + largest-true-rectangle sweep; axis-aligned variant —
    the reference's rotate=true pre-rotation by the minimum-diameter angle
    is a documented narrowing). Polygon = the group's convex hull. Output
    (cat, minx, miny, maxx, maxy, rect_area); rows-only gate, containment
    and area invariants in pytest (the reference's one-cell reconstruction
    inset can overhang slanted edges by <= one cell — identical here)."""
    import pandas as pd

    from . import geomlib

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        hx, hy = geomlib.convex_hull(
            pdf["x"].to_numpy(), pdf["y"].to_numpy()
        )
        if len(hx) < 3:
            return pd.DataFrame(
                {group_col: [], "minx": [], "miny": [], "maxx": [],
                 "maxy": [], "rect_area": []}
            )
        minx, miny, maxx, maxy = geomlib.max_inscribed_rect(hx, hy)
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]],
             "minx": [round(minx, 6)], "miny": [round(miny, 6)],
             "maxx": [round(maxx, 6)], "maxy": [round(maxy, 6)],
             "rect_area": [round((maxx - minx) * (maxy - miny), 6)]}
        )

    schema = (
        f"{group_col} string, minx double, miny double, maxx double, "
        "maxy double, rect_area double"
    )
    return (
        planner.ensure_parallelism(points.select(group_col, "x", "y"))
        .groupBy(group_col)
        .applyInPandas(per_group, schema=schema)
    )


def tps_interpolation_groups(
    points: DataFrame, group_col: str = "cat"
) -> DataFrame:
    """TPSProcess per group (GT/gridcoverage/RasterInterpolationTPS
    Operation): thin-plate spline r^2 ln r + affine part, exact
    interpolation, per-group dense solve in the Arrow batch (controls are
    small; the reference solves one global dense system single-threaded).
    Input rows carry ``is_ctl``/``v`` like tin_interpolation_groups;
    output (cat, pid, iv). Rows-only gate — kernel reproduces affine
    fields and control values exactly (pytest)."""
    import pandas as pd
    from pyspark.sql import types as T

    from . import geomlib

    schema = T.StructType([
        T.StructField(group_col, T.StringType()),
        T.StructField("pid", T.LongType()),
        T.StructField("iv", T.DoubleType()),
    ])

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        ctl = pdf[pdf["is_ctl"] == 1]
        qry = pdf[pdf["is_ctl"] == 0]
        if len(ctl) < 4 or len(qry) == 0:
            return pd.DataFrame({group_col: [], "pid": [], "iv": []})
        w, a = geomlib.tps_fit(
            ctl["x"].to_numpy(), ctl["y"].to_numpy(), ctl["v"].to_numpy()
        )
        out = geomlib.tps_eval(
            ctl["x"].to_numpy(), ctl["y"].to_numpy(), w, a,
            qry["x"].to_numpy(), qry["y"].to_numpy(),
        )
        return pd.DataFrame(
            {group_col: qry[group_col].to_numpy(),
             "pid": qry["pid"].to_numpy(),
             "iv": np.round(out, 6)}
        )

    return (
        planner.ensure_parallelism(
            points.select(group_col, "pid", "x", "y", "is_ctl", "v")
        )
        .groupBy(group_col)
        .applyInPandas(per_group, schema=schema)
    )


# ---------------------------------------------------------------------------
# RingMap cartographic dressing (RingMapsOperation.java:100-213)
# ---------------------------------------------------------------------------

_RM_SEGS = 10          # DEFAULT_SEGS (RingMapsOperation.java:52)
_RM_GAPS = 1           # ring gap, in arc segments (java:72)
_RM_SECTORS = 8        # feature_count: one sector per rect category
_RM_RINGS = 3          # ring_num = number of value fields
#: chart radius = half the layer-bbox diagonal (java:100-103); world bbox
#: is the fixed [0,1000)^2, so the radius is a shared constant.
_RM_RADIUS = 707.1067811865476
_RM_CENTER = 500.0


def _rm_cells_values() -> str:
    """The 504 cell vertices as one shared inline-VALUES table.

    Every angle is static (sector span 45 deg, SEGS arc steps, GAPS
    trailing steps dropped for the visual gap — java:184-204), and the
    world bbox is fixed, so the entire dressing geometry precomputes to
    literals in Python; only the sector->feature assignment and the ring
    values come from data. Vertex order matches createCell: inner arc
    ascending, outer arc descending, explicit closure."""
    import math as _m

    interval = _RM_RADIUS / _RM_RINGS
    step = (360.0 / _RM_SECTORS) / _RM_SEGS
    rows = []
    for s in range(_RM_SECTORS):
        base = s * (360.0 / _RM_SECTORS)
        for ring in range(1, _RM_RINGS + 1):
            r_in = _RM_RADIUS + (ring - 1) * interval
            r_out = r_in + interval
            verts = []
            for idx in range(_RM_SEGS + 1 - _RM_GAPS):
                a = _m.radians(base + idx * step)
                verts.append((_RM_CENTER + r_in * _m.cos(a),
                              _RM_CENTER + r_in * _m.sin(a)))
            for idx in range(_RM_SEGS - _RM_GAPS, -1, -1):
                a = _m.radians(base + idx * step)
                verts.append((_RM_CENTER + r_out * _m.cos(a),
                              _RM_CENTER + r_out * _m.sin(a)))
            verts.append(verts[0])
            for seq, (vx, vy) in enumerate(verts):
                rows.append(
                    f"({s}, {ring}, {seq}, {round(vx, 6)!r}, {round(vy, 6)!r})"
                )
    return ",\n   ".join(rows)


def _rm_anchor_points() -> list[tuple[float, float]]:
    """Sector anchor points: mid-angle at the inner chart radius — the
    reference's anchor-line origin (java:139-142), reused here as the
    greedy-matching reference point (the Java code uses the ring-1 cell
    centroid; the mid-angle point is the same direction at the same
    radius, an equivalent deterministic choice, documented deviation)."""
    import math as _m

    pts = []
    for s in range(_RM_SECTORS):
        a = _m.radians(s * 45.0 + 22.5)
        pts.append((_RM_CENTER + _RM_RADIUS * _m.cos(a),
                    _RM_CENTER + _RM_RADIUS * _m.sin(a)))
    return pts


def _rm_feats_cte() -> str:
    """Per-category feature: exact-integer centroid sums (mm) + the 3 ring
    value fields (count, 2*hw sum, 2*hh sum — all exact BIGINTs)."""
    return """
feats AS (
  SELECT cat,
         CAST(SUM(cxm) AS DOUBLE) / (1000.0 * COUNT(*)) AS fcx,
         CAST(SUM(cym) AS DOUBLE) / (1000.0 * COUNT(*)) AS fcy,
         COUNT(*) AS f1,
         SUM(CAST(hw * 2 AS BIGINT)) AS f2,
         SUM(CAST(hh * 2 AS BIGINT)) AS f3
  FROM (SELECT rid % 8 AS cat,
               CAST(ROUND(cx * 1000.0) AS BIGINT) AS cxm,
               CAST(ROUND(cy * 1000.0) AS BIGINT) AS cym,
               hw, hh
        FROM rects_customer) __c
  GROUP BY cat
)"""


def _rm_assign_ctes() -> str:
    """Greedy sector->feature matching, unrolled (java:127-146): sector 0
    takes the feature nearest its anchor, that feature leaves the pool,
    sector 1 matches next, ... Deterministic ties on smallest cat."""
    from .world import dlit

    pts = _rm_anchor_points()
    parts = []
    for s, (ax, ay) in enumerate(pts):
        d2 = (
            f"(fcx - {dlit(round(ax, 6))}) * (fcx - {dlit(round(ax, 6))})"
            f" + (fcy - {dlit(round(ay, 6))}) * (fcy - {dlit(round(ay, 6))})"
        )
        if s == 0:
            pool = "feats"
        else:
            taken = " UNION ALL ".join(
                f"SELECT cat FROM m{i}" for i in range(s)
            )
            pool = f"(SELECT * FROM feats WHERE cat NOT IN ({taken})) __p{s}"
        parts.append(f"""
m{s} AS (
  SELECT cat FROM (
    SELECT cat, ROW_NUMBER() OVER (ORDER BY {d2} ASC, cat ASC) AS rn
    FROM {pool}
  ) __m{s} WHERE rn = 1
)""")
    union = " UNION ALL ".join(
        f"SELECT {s} AS sector, cat FROM m{s}" for s in range(_RM_SECTORS)
    )
    parts.append(f"""
assign AS (
  {union}
)""")
    return ",".join(parts)


def ring_map_dressing_sql() -> str:
    """Engine-shared SQL for the dressed ring map: 24 annulus-sector cell
    polygons as vertex rows (sector, cat, ring, seq, vx, vy, val) — the
    chart layer RingMapsOperation emits, minus nothing: geometry, ring_num
    and the per-ring value field all materialize."""
    from . import world as _w

    return _w.with_layers(
        f"""
WITH {_rm_feats_cte().lstrip()},
{_rm_assign_ctes().lstrip().lstrip(',')},
cells AS (
  SELECT * FROM (VALUES
   {_rm_cells_values()}
  ) AS __t(sector, ring, seq, vx, vy)
)
SELECT CAST(a.sector AS INT) AS sector, CAST(f.cat AS INT) AS cat,
       CAST(c.ring AS INT) AS ring, CAST(c.seq AS INT) AS seq,
       CAST(c.vx AS DOUBLE) AS vx, CAST(c.vy AS DOUBLE) AS vy,
       CAST(CASE c.ring WHEN 1 THEN f.f1 WHEN 2 THEN f.f2 ELSE f.f3 END
            AS BIGINT) AS val
FROM cells c
JOIN assign a ON a.sector = c.sector
JOIN feats f ON f.cat = a.cat
""",
        "rects_customer",
    )


def ring_map_anchors_sql() -> str:
    """Engine-shared SQL for the anchor-line layer (java:139-152): one row
    per sector with the chart-side endpoint and the matched feature's
    centroid (sector, cat, ax, ay, fcx, fcy)."""
    from . import world as _w
    from .world import dlit

    pts = _rm_anchor_points()
    axs = " ".join(
        f"WHEN {s} THEN {dlit(round(ax, 6))}" for s, (ax, _) in enumerate(pts)
    )
    ays = " ".join(
        f"WHEN {s} THEN {dlit(round(ay, 6))}" for s, (_, ay) in enumerate(pts)
    )
    return _w.with_layers(
        f"""
WITH {_rm_feats_cte().lstrip()},
{_rm_assign_ctes().lstrip().lstrip(',')}
SELECT CAST(a.sector AS INT) AS sector, CAST(f.cat AS INT) AS cat,
       ROUND(CASE a.sector {axs} END, 6) AS ax,
       ROUND(CASE a.sector {ays} END, 6) AS ay,
       ROUND(f.fcx, 6) AS fcx, ROUND(f.fcy, 6) AS fcy
FROM assign a JOIN feats f ON f.cat = a.cat
""",
        "rects_customer",
    )


def ring_map_feats(spark) -> list:
    """Collect the per-category chart features — BOUNDED driver-side step
    (8 rows; asserted <= 64): the reference's RingMapsOperation itself
    runs its sector matching as a sequential driver loop over the loaded
    features (java:115-146), and a ring chart has O(sectors) features by
    construction. Exact integer sums cross the wire; the centroid division
    happens once below in Python doubles — the same IEEE ops as the
    oracle's SQL text, so the greedy decisions agree bit-for-bit."""
    from . import world as _w

    rows = spark.sql(_w.with_layers(
        """
SELECT cat, SUM(cxm) AS sx, SUM(cym) AS sy, COUNT(*) AS cnt,
       SUM(CAST(hw * 2 AS BIGINT)) AS f2, SUM(CAST(hh * 2 AS BIGINT)) AS f3
FROM (SELECT rid % 8 AS cat,
             CAST(ROUND(cx * 1000.0) AS BIGINT) AS cxm,
             CAST(ROUND(cy * 1000.0) AS BIGINT) AS cym, hw, hh
      FROM rects_customer) __c
GROUP BY cat
""",
        "rects_customer",
    )).collect()
    assert len(rows) <= 64, "ring map feature pool must stay chart-sized"
    return sorted(rows, key=lambda r: r["cat"])


def ring_map_assign(feats: list) -> list[tuple[int, int]]:
    """Greedy sector->feature matching in sector order (java:127-146):
    nearest unassigned feature to each sector anchor, ties on smallest
    cat. Python doubles reproduce the oracle SQL exactly: fcx/fcy are one
    exact-int division each, d2 two mults + one add."""
    out = []
    taken = set()
    for ax, ay in _rm_anchor_points():
        axr, ayr = round(ax, 6), round(ay, 6)
        best = None
        for r in feats:
            if r["cat"] in taken:
                continue
            fcx = float(r["sx"]) / (1000.0 * r["cnt"])
            fcy = float(r["sy"]) / (1000.0 * r["cnt"])
            d2 = (fcx - axr) * (fcx - axr) + (fcy - ayr) * (fcy - ayr)
            if best is None or (d2, r["cat"]) < best[:2]:
                best = (d2, r["cat"])
        taken.add(best[1])
        out.append(best[1])
    return [(s, c) for s, c in enumerate(out)]


def _rm_assign_values(assign: list[tuple[int, int]]) -> str:
    return ", ".join(f"({s}, {c})" for s, c in assign)


def ring_map_dressing(spark) -> "DataFrame":
    """Spark-side dressed ring map: cells from the static VALUES table,
    sector->cat from the bounded driver-side greedy match, ring VALUES
    re-aggregated in-engine. Output matches ring_map_dressing_sql()'s
    oracle hash exactly."""
    from . import world as _w

    assign = ring_map_assign(ring_map_feats(spark))
    return spark.sql(_w.with_layers(
        f"""
WITH {_rm_feats_cte().lstrip()},
assign AS (
  SELECT * FROM (VALUES {_rm_assign_values(assign)}) AS __a(sector, cat)
),
cells AS (
  SELECT * FROM (VALUES
   {_rm_cells_values()}
  ) AS __t(sector, ring, seq, vx, vy)
)
SELECT CAST(a.sector AS INT) AS sector, CAST(f.cat AS INT) AS cat,
       CAST(c.ring AS INT) AS ring, CAST(c.seq AS INT) AS seq,
       CAST(c.vx AS DOUBLE) AS vx, CAST(c.vy AS DOUBLE) AS vy,
       CAST(CASE c.ring WHEN 1 THEN f.f1 WHEN 2 THEN f.f2 ELSE f.f3 END
            AS BIGINT) AS val
FROM cells c
JOIN assign a ON a.sector = c.sector
JOIN feats f ON f.cat = a.cat
""",
        "rects_customer",
    ))


def ring_map_anchors(spark) -> "DataFrame":
    """Spark-side anchor-line layer; see ring_map_anchors_sql()."""
    from . import world as _w
    from .world import dlit

    assign = ring_map_assign(ring_map_feats(spark))
    pts = _rm_anchor_points()
    axs = " ".join(
        f"WHEN {s} THEN {dlit(round(ax, 6))}" for s, (ax, _) in enumerate(pts)
    )
    ays = " ".join(
        f"WHEN {s} THEN {dlit(round(ay, 6))}" for s, (_, ay) in enumerate(pts)
    )
    return spark.sql(_w.with_layers(
        f"""
WITH {_rm_feats_cte().lstrip()},
assign AS (
  SELECT * FROM (VALUES {_rm_assign_values(assign)}) AS __a(sector, cat)
)
SELECT CAST(a.sector AS INT) AS sector, CAST(f.cat AS INT) AS cat,
       ROUND(CASE a.sector {axs} END, 6) AS ax,
       ROUND(CASE a.sector {ays} END, 6) AS ay,
       ROUND(f.fcx, 6) AS fcx, ROUND(f.fcy, 6) AS fcy
FROM assign a JOIN feats f ON f.cat = a.cat
""",
        "rects_customer",
    ))


# ---------------------------------------------------------------------------
# CircleMap cartographic dressing (CircleMapOperation.java:88-213)
# ---------------------------------------------------------------------------

_CM_SEGS = 32          # buffer(r, 8) -> 4*8 perimeter vertices (java:152)


def _cm_slots() -> list[tuple[float, float]]:
    """Perimeter slot centers: slot s at degree 360 - s*45 (clockwise,
    java:103-104), radius = center-to-bbox-corner distance (java:92)."""
    import math as _m

    pts = []
    for s in range(_RM_SECTORS):
        a = _m.radians(360.0 - s * 45.0)
        pts.append((_RM_CENTER + _RM_RADIUS * _m.cos(a),
                    _RM_CENTER + _RM_RADIUS * _m.sin(a)))
    return pts


def _cm_radii() -> tuple[float, float]:
    """(maxRadius, minRadius): half the chord between adjacent slots, and
    its 10% floor (java:97-98, 207-211)."""
    import math as _m

    (x1, y1), (x2, y2) = _cm_slots()[0], (
        _RM_CENTER + _RM_RADIUS * _m.cos(_m.radians(45.0)),
        _RM_CENTER + _RM_RADIUS * _m.sin(_m.radians(45.0)),
    )
    mx = _m.hypot(x2 - x1, y2 - y1) / 2.0
    return mx, mx * 0.1


def _cm_units_values() -> str:
    """33 unit-circle vertex rows (seq, ux, uy) — 32-gon + explicit
    closure. The reference's JTS buffer emits the same 32-segment ring;
    vertex phase/start differs (documented deviation, polygon-equal)."""
    import math as _m

    rows = []
    for seq in range(_CM_SEGS + 1):
        a = 2.0 * _m.pi * (seq % _CM_SEGS) / _CM_SEGS
        rows.append(f"({seq}, {round(_m.cos(a), 9)!r}, {round(_m.sin(a), 9)!r})")
    return ",\n   ".join(rows)


def _cm_slots_values() -> str:
    return ", ".join(
        f"({s}, {round(x, 6)!r}, {round(y, 6)!r})"
        for s, (x, y) in enumerate(_cm_slots())
    )


def _cm_radii_cte() -> str:
    """radii: per assigned feature the value-scaled circle radius
    r_adj = clamp((v - min)/(max - min) * maxRadius, >= minRadius)
    (java:145-149); value field = the category rect count."""
    from .world import dlit

    mx, mn = _cm_radii()
    scale = (
        f"((CAST(f.f1 AS DOUBLE) - s.vmin) / (s.vmax - s.vmin)) * {dlit(mx)}"
    )
    return f"""
stats AS (
  SELECT MIN(CAST(f1 AS DOUBLE)) AS vmin, MAX(CAST(f1 AS DOUBLE)) AS vmax
  FROM feats
),
radii AS (
  SELECT a.slot, a.cat, f.fcx, f.fcy, f.f1,
         CASE WHEN (s.vmax - s.vmin) <= 0.0 THEN {dlit(mn)}
              WHEN {scale} <= {dlit(mn)} THEN {dlit(mn)}
              ELSE {scale} END AS r_adj
  FROM assign a
  JOIN feats f ON f.cat = a.cat
  CROSS JOIN stats s
)"""


def _cm_assign_ctes() -> str:
    """Greedy feature->slot matching, unrolled: features in cat order each
    take the nearest FREE perimeter slot (java:126-143's STRtree
    nearest-with-processed-filter loop). Ties on smallest slot."""
    parts = []
    for c in range(_RM_SECTORS):
        if c == 0:
            pool = "slotc"
        else:
            taken = " UNION ALL ".join(
                f"SELECT slot FROM s{i}" for i in range(c)
            )
            pool = f"(SELECT * FROM slotc WHERE slot NOT IN ({taken}))"
        parts.append(f"""
s{c} AS (
  SELECT slot FROM (
    SELECT sl.slot,
           ROW_NUMBER() OVER (ORDER BY
             (f.fcx - sl.scx) * (f.fcx - sl.scx)
             + (f.fcy - sl.scy) * (f.fcy - sl.scy) ASC, sl.slot ASC) AS rn
    FROM {pool} sl CROSS JOIN (SELECT fcx, fcy FROM feats WHERE cat = {c}) f
  ) __s{c} WHERE rn = 1
)""")
    union = " UNION ALL ".join(
        f"SELECT {c} AS cat, slot FROM s{c}" for c in range(_RM_SECTORS)
    )
    parts.append(f"""
assign AS (
  {union}
)""")
    return ",".join(parts)


_CM_BODY = """
SELECT CAST(r.slot AS INT) AS slot, CAST(r.cat AS INT) AS cat,
       CAST(u.seq AS INT) AS seq,
       ROUND(sl.scx + r.r_adj * CAST(u.ux AS DOUBLE), 6) AS vx,
       ROUND(sl.scy + r.r_adj * CAST(u.uy AS DOUBLE), 6) AS vy,
       CAST(r.f1 AS BIGINT) AS val, ROUND(r.r_adj, 6) AS r_circle
FROM radii r
JOIN slotc sl ON sl.slot = r.slot
CROSS JOIN units u
"""

_CM_ANCHOR_BODY = """
SELECT CAST(r.slot AS INT) AS slot, CAST(r.cat AS INT) AS cat,
       ROUND(r.fcx, 6) AS x1, ROUND(r.fcy, 6) AS y1,
       ROUND(sl.scx + r.r_adj * (r.fcx - sl.scx) / d.dist, 6) AS x2,
       ROUND(sl.scy + r.r_adj * (r.fcy - sl.scy) / d.dist, 6) AS y2,
       ROUND(d.dist - r.r_adj, 6) AS anchor_len
FROM radii r
JOIN slotc sl ON sl.slot = r.slot
CROSS JOIN LATERAL (
  SELECT SQRT((r.fcx - sl.scx) * (r.fcx - sl.scx)
              + (r.fcy - sl.scy) * (r.fcy - sl.scy)) AS dist
) d
"""


def circle_map_sql(anchors: bool = False) -> str:
    """Engine-shared CircleMap SQL (oracle path: greedy fully unrolled)."""
    from . import world as _w

    return _w.with_layers(
        f"""
WITH {_rm_feats_cte().lstrip()},
slotc AS (
  SELECT * FROM (VALUES {_cm_slots_values()}) AS __s(slot, scx, scy)
),
{_cm_assign_ctes().lstrip().lstrip(',')},
{_cm_radii_cte().lstrip()},
units AS (
  SELECT * FROM (VALUES
   {_cm_units_values()}
  ) AS __u(seq, ux, uy)
)
{_CM_ANCHOR_BODY if anchors else _CM_BODY}
""",
        "rects_customer",
    )


def circle_map_assign(feats: list) -> list[tuple[int, int]]:
    """Greedy feature->slot matching in cat order (bounded driver-side
    mirror of the oracle CTEs; same IEEE arithmetic)."""
    slots = [(s, round(x, 6), round(y, 6)) for s, (x, y) in enumerate(_cm_slots())]
    out = []
    taken = set()
    for r in feats:
        fcx = float(r["sx"]) / (1000.0 * r["cnt"])
        fcy = float(r["sy"]) / (1000.0 * r["cnt"])
        best = None
        for s, sx, sy in slots:
            if s in taken:
                continue
            d2 = (fcx - sx) * (fcx - sx) + (fcy - sy) * (fcy - sy)
            if best is None or (d2, s) < best:
                best = (d2, s)
        taken.add(best[1])
        out.append((r["cat"], best[1]))
    return out


def circle_map(spark, anchors: bool = False) -> "DataFrame":
    """Spark-side CircleMap: greedy matching from the bounded feature
    collect (reference runs the same loop driver-side), geometry in-engine.
    Output hashes equal circle_map_sql()'s."""
    from . import world as _w

    assign = circle_map_assign(ring_map_feats(spark))
    vals = ", ".join(f"({c}, {s})" for c, s in assign)
    return spark.sql(_w.with_layers(
        f"""
WITH {_rm_feats_cte().lstrip()},
slotc AS (
  SELECT * FROM (VALUES {_cm_slots_values()}) AS __s(slot, scx, scy)
),
assign AS (
  SELECT * FROM (VALUES {vals}) AS __a(cat, slot)
),
{_cm_radii_cte().lstrip()},
units AS (
  SELECT * FROM (VALUES
   {_cm_units_values()}
  ) AS __u(seq, ux, uy)
)
{_CM_ANCHOR_BODY if anchors else _CM_BODY}
""",
        "rects_customer",
    ))
