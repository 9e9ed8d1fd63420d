"""Overlay difference family: Difference, SymDifference, Identity, Update,
ClipWithFeatures — the A-minus-B / A-split-by-B overlays.

Reference parity map (paths relative to /root/reference):
- ``difference_rects``     <- GeoTools/process-spatialstatistics/.../transformation/
                              DifferenceFeatureCollection.java:59 (per A feature:
                              geometry = A.difference(union of intersecting B);
                              empty results dropped)
- ``sym_difference_rects`` <- SymDifferenceProcess.java:41 (Difference(A,B) union
                              Difference(B,A))
- ``identity_rects``       <- IdentityProcess.java:43 (pairwise A∩B pieces +
                              the A remainders)
- ``update_rects``         <- UpdateProcess.java:45 (B features + A remainders)
- ``clip_with_features``   <- operations/ClipWithFeaturesOperation.java:55
                              (A clipped to union(B); empty results dropped)

Architecture — scan-line union area, fully distributed:

The reference materializes JTS geometries and unions the overlapping B set
per A feature. For axis-aligned rectangle layers the union *area* inside an
A feature has an exact closed form via the classic slab sweep: clip every
intersecting B box to A, take the distinct x-edges of the clipped boxes as
slab boundaries, and inside each vertical slab merge the y-intervals with a
running-max window. Everything partitions by (rid_a) / (rid_a, slab) —
window groups are the per-feature overlap set (local density, O(k) rows),
so the sweep runs shuffle-parallel with no global structure; at 100 TB the
cost is one cell join + two keyed shuffles.

Engine-parity contract: coordinates quantized to exact integer
millicoordinates (the synthetic world's native resolution — every rect edge
is an integer number of mm), so slab widths, interval unions, and areas are
exact BIGINT sums — bit-identical across Spark and the DuckDB oracle in any
partitioning/order. Areas are reported in world units² = mm²/1e6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import cells, planner, world


def mm_sql(expr: str) -> str:
    """Exact integer millicoordinate of a world coordinate expression.

    FLOOR(x*1000 + 0.5) (round-half-up) is identical in Spark and DuckDB
    (plain CAST differs: Spark truncates, DuckDB rounds). World coordinates
    are ix/1000 ± integer, so x*1000 lands within ~1e-9 of an integer and
    the rounding is exact.
    """
    return f"CAST(FLOOR(({expr}) * 1000.0 + 0.5) AS BIGINT)"


def _rects_mm(df: DataFrame, rid: str = "rid") -> DataFrame:
    """Project a rect layer to exact integer mm extent columns."""
    return df.select(
        F.col(rid),
        F.expr(mm_sql("cx - hw")).alias("mx0"),
        F.expr(mm_sql("cx + hw")).alias("mx1"),
        F.expr(mm_sql("cy - hh")).alias("my0"),
        F.expr(mm_sql("cy + hh")).alias("my1"),
    )


def _pairs_mm(
    a: DataFrame, b: DataFrame, cell_size: float = cells.DEFAULT_CELL_SIZE
) -> DataFrame:
    """Positive-area clipped intersection boxes of B against A, exact mm:
    (rid_a, rid_b, bxmin, bxmax, bymin, bymax). Candidates come from the
    bbox cell join with min-corner cell-ownership dedup (zero-shuffle
    dedup, as in overlay.intersect_rects)."""
    cs = float(cell_size)
    am = _rects_mm(planner.ensure_parallelism(a)).withColumnRenamed("rid", "rid_a")
    bm = _rects_mm(planner.ensure_parallelism(b)).withColumnRenamed("rid", "rid_b")
    ac = cells.explode_extent_cells(
        am.withColumns({
            "xmin": F.col("mx0") / 1000.0, "xmax": F.col("mx1") / 1000.0,
            "ymin": F.col("my0") / 1000.0, "ymax": F.col("my1") / 1000.0,
        }),
        cell_size=cs,
    ).drop("xmin", "xmax", "ymin", "ymax")
    bc = cells.explode_extent_cells(
        bm.select(
            "rid_b",
            F.col("mx0").alias("nx0"), F.col("mx1").alias("nx1"),
            F.col("my0").alias("ny0"), F.col("my1").alias("ny1"),
        ).withColumns({
            "xmin": F.col("nx0") / 1000.0, "xmax": F.col("nx1") / 1000.0,
            "ymin": F.col("ny0") / 1000.0, "ymax": F.col("ny1") / 1000.0,
        }),
        cell_size=cs,
    ).drop("xmin", "xmax", "ymin", "ymax")
    j = ac.join(bc, on=["cell_x", "cell_y"], how="inner")
    bxmin = F.greatest("mx0", "nx0")
    bxmax = F.least("mx1", "nx1")
    bymin = F.greatest("my0", "ny0")
    bymax = F.least("my1", "ny1")
    j = j.where((bxmin < bxmax) & (bymin < bymax))
    own = (
        (F.floor(bxmin / F.lit(1000.0 * cs)).cast("long") == F.col("cell_x"))
        & (F.floor(bymin / F.lit(1000.0 * cs)).cast("long") == F.col("cell_y"))
    )
    return j.where(own).select(
        "rid_a", "rid_b",
        bxmin.alias("bxmin"), bxmax.alias("bxmax"),
        bymin.alias("bymin"), bymax.alias("bymax"),
    )


def union_cut_mm(pairs: DataFrame) -> DataFrame:
    """Exact area (mm²) of union(clipped B boxes) per rid_a, via slab sweep.

    Slabs: distinct x-edges of the clipped boxes. A box overlapping a slab
    covers its full width (slab edges are box edges), so per (rid_a, slab)
    the union reduces to a 1-D y-interval merge: running max of bymax in
    (bymin, bymax, rid_b) order; a row opens a new island when its bymin
    exceeds every previous bymax. All quantities are BIGINT.
    """
    edges = (
        pairs.select("rid_a", F.col("bxmin").alias("x"))
        .unionByName(pairs.select("rid_a", F.col("bxmax").alias("x")))
        .distinct()
    )
    wlead = Window.partitionBy("rid_a").orderBy("x")
    slabs = edges.withColumn("ex", F.lead("x").over(wlead)).where(
        F.col("ex").isNotNull()
    ).withColumnRenamed("x", "sx")
    sb = slabs.join(pairs, on="rid_a", how="inner").where(
        (F.col("bxmin") <= F.col("sx")) & (F.col("bxmax") >= F.col("ex"))
    )
    word = Window.partitionBy("rid_a", "sx").orderBy("bymin", "bymax", "rid_b")
    prev_max = F.max("bymax").over(
        word.rowsBetween(Window.unboundedPreceding, -1)
    )
    sb = sb.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("bymin") > prev_max), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            word.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = sb.groupBy("rid_a", "sx", "ex", "island").agg(
        F.min("bymin").alias("y0"), F.max("bymax").alias("y1")
    )
    return islands.groupBy("rid_a").agg(
        F.sum((F.col("ex") - F.col("sx")) * (F.col("y1") - F.col("y0")))
        .cast("long")
        .alias("cut_mm2")
    )


def _a_with_cut(a: DataFrame, b: DataFrame) -> DataFrame:
    """Every A feature with its exact mm² area and union-cut area."""
    am = _rects_mm(planner.ensure_parallelism(a))
    cut = union_cut_mm(_pairs_mm(a, b)).withColumnRenamed("rid_a", "rid")
    ncut = (
        _pairs_mm(a, b)
        .groupBy("rid_a")
        .agg(F.count(F.lit(1)).alias("n_cut"))
        .withColumnRenamed("rid_a", "rid")
    )
    out = (
        am.join(cut, on="rid", how="left")
        .join(ncut, on="rid", how="left")
        .na.fill({"cut_mm2": 0, "n_cut": 0})
    )
    return out.withColumn(
        "area_mm2",
        ((F.col("mx1") - F.col("mx0")) * (F.col("my1") - F.col("my0"))).cast("long"),
    )


def difference_rects(a: DataFrame, b: DataFrame) -> DataFrame:
    """DifferenceProcess: per A feature, area of A minus union(B). Features
    whose difference is empty are dropped (the reference drops empty
    geometries). Output (rid, n_cut, area_a, cut_area, diff_area)."""
    d = _a_with_cut(a, b)
    d = d.withColumn("diff_mm2", F.col("area_mm2") - F.col("cut_mm2"))
    return d.where(F.col("diff_mm2") > 0).select(
        "rid",
        F.col("n_cut").cast("long").alias("n_cut"),
        F.round(F.col("area_mm2") / 1e6, 6).alias("area_a"),
        F.round(F.col("cut_mm2") / 1e6, 6).alias("cut_area"),
        F.round(F.col("diff_mm2") / 1e6, 6).alias("diff_area"),
    )


def sym_difference_rects(a: DataFrame, b: DataFrame) -> DataFrame:
    """SymDifferenceProcess: Difference(A, B) ∪ Difference(B, A), each row
    tagged with its source side. Output (side, rid, diff_area)."""
    da = difference_rects(a, b).select(
        F.lit("A").alias("side"), "rid", "diff_area"
    )
    db = difference_rects(b, a).select(
        F.lit("B").alias("side"), "rid", "diff_area"
    )
    return da.unionByName(db)


def identity_rects(a: DataFrame, b: DataFrame) -> DataFrame:
    """IdentityProcess: pairwise A∩B pieces (both ids) + A remainders
    (rid_b NULL). Output (rid_a, rid_b, piece_area)."""
    pieces = _pairs_mm(a, b).select(
        "rid_a",
        "rid_b",
        F.round(
            ((F.col("bxmax") - F.col("bxmin"))
             * (F.col("bymax") - F.col("bymin"))).cast("long") / 1e6,
            6,
        ).alias("piece_area"),
    )
    rem = difference_rects(a, b).select(
        F.col("rid").alias("rid_a"),
        F.lit(None).cast("long").alias("rid_b"),
        F.col("diff_area").alias("piece_area"),
    )
    return pieces.unionByName(rem)


def update_rects(a: DataFrame, b: DataFrame) -> DataFrame:
    """UpdateProcess: B features whole + A remainders (A minus union B).
    Output (src, rid, out_area)."""
    bm = _rects_mm(planner.ensure_parallelism(b))
    bfull = bm.select(
        F.lit("B").alias("src"),
        "rid",
        F.round(
            ((F.col("mx1") - F.col("mx0"))
             * (F.col("my1") - F.col("my0"))).cast("long") / 1e6,
            6,
        ).alias("out_area"),
    )
    rem = difference_rects(a, b).select(
        F.lit("A").alias("src"), "rid", F.col("diff_area").alias("out_area")
    )
    return bfull.unionByName(rem)


def clip_with_features(a: DataFrame, b: DataFrame) -> DataFrame:
    """ClipWithFeaturesProcess: per A feature, area of A ∩ union(B); empty
    clips dropped. Output (rid, clip_area)."""
    d = _a_with_cut(a, b)
    return d.where(F.col("cut_mm2") > 0).select(
        "rid", F.round(F.col("cut_mm2") / 1e6, 6).alias("clip_area")
    )


# ---------------------------------------------------------------------------
# DuckDB oracles — same slab-sweep algorithm, same integer arithmetic
# ---------------------------------------------------------------------------

def _mm_cte(a_layer: str, b_layer: str) -> str:
    """Shared CTE text: mm-quantized layers + positive-area clipped pairs.
    Extents precomputed in subqueries (DuckDB errors on LEAST/GREATEST
    inside range-join ON clauses)."""
    return f"""
am AS (SELECT rid AS rid_a, {mm_sql('cx - hw')} AS mx0, {mm_sql('cx + hw')} AS mx1,
              {mm_sql('cy - hh')} AS my0, {mm_sql('cy + hh')} AS my1 FROM {a_layer}),
bm AS (SELECT rid AS rid_b, {mm_sql('cx - hw')} AS nx0, {mm_sql('cx + hw')} AS nx1,
              {mm_sql('cy - hh')} AS ny0, {mm_sql('cy + hh')} AS ny1 FROM {b_layer}),
pairs AS (
  SELECT rid_a, rid_b,
         GREATEST(mx0, nx0) AS bxmin, LEAST(mx1, nx1) AS bxmax,
         GREATEST(my0, ny0) AS bymin, LEAST(my1, ny1) AS bymax
  FROM am JOIN bm
    ON mx0 < nx1 AND nx0 < mx1 AND my0 < ny1 AND ny0 < my1
)"""


_SWEEP_CTE = """
edges AS (SELECT DISTINCT rid_a, x FROM (
  SELECT rid_a, bxmin AS x FROM pairs
  UNION ALL SELECT rid_a, bxmax AS x FROM pairs)),
slabs AS (SELECT rid_a, x AS sx, LEAD(x) OVER (PARTITION BY rid_a ORDER BY x) AS ex
          FROM edges),
sb AS (SELECT s.rid_a, s.sx, s.ex, p.rid_b, p.bymin, p.bymax
       FROM slabs s JOIN pairs p ON p.rid_a = s.rid_a
       WHERE s.ex IS NOT NULL AND p.bxmin <= s.sx AND p.bxmax >= s.ex),
isl AS (SELECT *, SUM(CASE WHEN prev_max IS NULL OR bymin > prev_max
                           THEN 1 ELSE 0 END)
               OVER (PARTITION BY rid_a, sx ORDER BY bymin, bymax, rid_b
                     ROWS UNBOUNDED PRECEDING) AS island
        FROM (SELECT *, MAX(bymax) OVER (PARTITION BY rid_a, sx
                       ORDER BY bymin, bymax, rid_b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max FROM sb)),
islands AS (SELECT rid_a, sx, ex, island, MIN(bymin) AS y0, MAX(bymax) AS y1
            FROM isl GROUP BY rid_a, sx, ex, island),
cut AS (SELECT rid_a, CAST(SUM((ex - sx) * (y1 - y0)) AS BIGINT) AS cut_mm2
        FROM islands GROUP BY rid_a),
acut AS (SELECT a.rid_a AS rid,
                CAST((a.mx1 - a.mx0) * (a.my1 - a.my0) AS BIGINT) AS area_mm2,
                COALESCE(c.cut_mm2, 0) AS cut_mm2,
                COALESCE(n.n_cut, 0) AS n_cut
         FROM am a
         LEFT JOIN cut c ON c.rid_a = a.rid_a
         LEFT JOIN (SELECT rid_a, CAST(COUNT(*) AS BIGINT) AS n_cut
                    FROM pairs GROUP BY rid_a) n ON n.rid_a = a.rid_a)
"""


def _diff_select() -> str:
    return """
SELECT rid, CAST(n_cut AS BIGINT) AS n_cut,
       ROUND(area_mm2 / 1e6, 6) AS area_a,
       ROUND(cut_mm2 / 1e6, 6) AS cut_area,
       ROUND((area_mm2 - cut_mm2) / 1e6, 6) AS diff_area
FROM acut WHERE area_mm2 - cut_mm2 > 0
"""


def difference_oracle(a_layer: str = "rects_customer",
                      b_layer: str = "rects_orders") -> str:
    return world.with_layers(
        f"WITH {_mm_cte(a_layer, b_layer)},{_SWEEP_CTE}{_diff_select()}",
        a_layer, b_layer,
    )


def sym_difference_oracle() -> str:
    ab = f"WITH {_mm_cte('rects_customer', 'rects_orders')},{_SWEEP_CTE}"
    ba = f"WITH {_mm_cte('rects_orders', 'rects_customer')},{_SWEEP_CTE}"
    return world.with_layers(
        f"""
SELECT 'A' AS side, rid, diff_area FROM ({ab}{_diff_select()})
UNION ALL
SELECT 'B' AS side, rid, diff_area FROM ({ba}{_diff_select()})
""",
        "rects_customer", "rects_orders",
    )


def identity_oracle() -> str:
    return world.with_layers(
        f"""
WITH {_mm_cte('rects_customer', 'rects_orders')},{_SWEEP_CTE}
SELECT rid_a, rid_b,
       ROUND(CAST((bxmax - bxmin) * (bymax - bymin) AS BIGINT) / 1e6, 6)
         AS piece_area
FROM pairs
UNION ALL
SELECT rid AS rid_a, CAST(NULL AS BIGINT) AS rid_b,
       ROUND((area_mm2 - cut_mm2) / 1e6, 6) AS piece_area
FROM acut WHERE area_mm2 - cut_mm2 > 0
""",
        "rects_customer", "rects_orders",
    )


def update_oracle() -> str:
    return world.with_layers(
        f"""
WITH {_mm_cte('rects_customer', 'rects_orders')},{_SWEEP_CTE}
SELECT 'B' AS src, rid_b AS rid,
       ROUND(CAST((nx1 - nx0) * (ny1 - ny0) AS BIGINT) / 1e6, 6) AS out_area
FROM bm
UNION ALL
SELECT 'A' AS src, rid,
       ROUND((area_mm2 - cut_mm2) / 1e6, 6) AS out_area
FROM acut WHERE area_mm2 - cut_mm2 > 0
""",
        "rects_customer", "rects_orders",
    )


def clip_with_features_oracle() -> str:
    return world.with_layers(
        f"""
WITH {_mm_cte('rects_customer', 'rects_orders')},{_SWEEP_CTE}
SELECT rid, ROUND(cut_mm2 / 1e6, 6) AS clip_area
FROM acut WHERE cut_mm2 > 0
""",
        "rects_customer", "rects_orders",
    )
