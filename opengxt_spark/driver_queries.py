"""Registry of driver-facing queries and their DuckDB oracle SQL.

Each entry pairs a Spark implementation (built from the operator library)
with ANSI SQL over the same parquet views, sharing the synthetic-world SQL
fragments from ``world.py`` verbatim so values match bit-for-bit.

Conventions for hash-stable cross-engine parity:
- integer outputs wherever possible (counts, integer weights, cell ids);
- double outputs rounded via ROUND(x, 4..6) on BOTH sides;
- sums of integers CAST to BIGINT (DuckDB sum(BIGINT) is HUGEINT);
- squared-distance predicates from mul/add (IEEE-deterministic), sqrt only
  on output (IEEE correctly rounded in both engines);
- every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import gatenorm, joins, world

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Two-phase joins persist phase-1 intermediates; a gate session
            # running the whole registry would otherwise accumulate cached
            # blocks for its lifetime. Dropping the previous query's scratch
            # here keeps executor storage flat (the current query's own
            # scratch stays alive until the next builder runs).
            joins.release_scratch()
            # Final -0.0 -> +0.0 projection: the driver's value hash
            # distinguishes signed zeros that the engines emit differently
            # (see gatenorm). The matching oracle wrapper is applied in
            # __spark_entry__.oracle_sql().
            return gatenorm.dezero_df(fn(spark, sf_dir))

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# ---------------------------------------------------------------------------
# Spatial joins
# ---------------------------------------------------------------------------

_PIP_RECT_ORACLE = f"""
{world.oracle_cte('points_events', 'rects_customer')}
SELECT r.rid AS rid,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(p.w) AS BIGINT) AS sum_w
FROM rects_customer r
JOIN points_events p
  ON p.x >= r.cx - r.hw AND p.x <= r.cx + r.hw
 AND p.y >= r.cy - r.hh AND p.y <= r.cy + r.hh
GROUP BY r.rid
"""


@_register("pip_count_rect", _PIP_RECT_ORACLE)
def q_pip_count_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: point-in-polygon aggregate join (PointsInPolygonOperation)."""
    pts = world.points_events(spark, sf_dir)
    rects = world.rects_customer(spark, sf_dir)
    return joins.pip_count_join(pts, rects)


# Hot-cell skewed layer: a third of the events squashed into [0,10)^2 —
# one pathologically hot cell at any sensible cell size.
_SKEW_X = "CASE WHEN pid % 3 = 0 THEN x * 0.01 ELSE x END"
_SKEW_Y = "CASE WHEN pid % 3 = 0 THEN y * 0.01 ELSE y END"

_PIP_SKEW_ORACLE = f"""
{world.oracle_cte('points_events', 'rects_customer')},
skew AS (
  SELECT pid, {_SKEW_X} AS x, {_SKEW_Y} AS y, w FROM points_events
)
SELECT r.rid AS rid,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(p.w) AS BIGINT) AS sum_w
FROM rects_customer r
JOIN skew p
  ON p.x >= r.cx - r.hw AND p.x <= r.cx + r.hw
 AND p.y >= r.cy - r.hh AND p.y <= r.cy + r.hh
GROUP BY r.rid
"""


@_register("pip_count_skew_salted", _PIP_SKEW_ORACLE)
def q_pip_count_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIP aggregate over a hot-cell-skewed layer through the AUTO-salted
    planner path (SURVEY §4.2 custom piece #1: "salt hot cells from a
    pre-count"): broadcast_limit=0 models the 100 TB regime where the
    build side cannot broadcast, and choose_strategy's memoized top-cell
    pre-count then escalates shuffle -> salted on its own (hot_min pinned
    low so the decision exercises at gate scale; pytest covers both the
    fire and no-fire sides of the threshold)."""
    pts = world.points_events(spark, sf_dir).selectExpr(
        "pid", f"{_SKEW_X} AS x", f"{_SKEW_Y} AS y", "w"
    )
    rects = world.rects_customer(spark, sf_dir)
    return joins.pip_count_join(
        pts, rects, broadcast_limit=0, hot_min=1000
    )


_PIP_HEX_ORACLE = f"""
{world.oracle_cte('points_events', 'hex_supplier')}
SELECT h.hid AS hid, CAST(COUNT(*) AS BIGINT) AS cnt
FROM hex_supplier h
JOIN points_events p
  ON ABS(p.x - h.cx) <= h.r
 AND ABS(p.y - h.cy) <= {world.HALF_SQRT3} * h.r
 AND {world.HALF_SQRT3} * ABS(p.x - h.cx) + 0.5 * ABS(p.y - h.cy)
     <= {world.HALF_SQRT3} * h.r
GROUP BY h.hid
"""


@_register("pip_count_hex", _PIP_HEX_ORACLE)
def q_pip_count_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = world.points_events(spark, sf_dir)
    hexes = world.hex_supplier(spark, sf_dir)
    return joins.pip_hex_count_join(pts, hexes)


_NEIGHBOR_COUNT_ORACLE = f"""
{world.oracle_cte('points_events', 'points_part')}
SELECT l.pid AS pid_l, CAST(COUNT(*) AS BIGINT) AS cnt
FROM points_events l
JOIN points_part r
  ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 225.0
GROUP BY l.pid
"""


@_register("neighbor_count_r15", _NEIGHBOR_COUNT_ORACLE)
def q_neighbor_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event-point: number of part-points within radius 15
    (NearestNeighborCountOperation)."""
    l = world.points_events(spark, sf_dir)
    r = world.points_part(spark, sf_dir)
    return joins.neighbor_count_join(l, r, radius=15.0)


_NEAREST_ORACLE = f"""
{world.oracle_cte('points_events', 'points_part')}
SELECT pid_l, pid_r, dist FROM (
  SELECT l.pid AS pid_l, r.pid AS pid_r,
         ROUND(SQRT((l.x - r.x) * (l.x - r.x)
                  + (l.y - r.y) * (l.y - r.y)), 6) AS dist,
         ROW_NUMBER() OVER (
           PARTITION BY l.pid
           ORDER BY (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) ASC,
                    r.pid ASC
         ) AS rn
  FROM points_events l
  JOIN points_part r
    ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 625.0
) WHERE rn = 1
"""


@_register("nearest_join_r25", _NEAREST_ORACLE)
def q_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-feature join within radius 25 (SpatialJoinOperation nearest)."""
    l = world.points_events(spark, sf_dir)
    r = world.points_part(spark, sf_dir)
    return joins.nearest_join(l, r, radius=25.0).select("pid_l", "pid_r", "dist")


# Same world, radius given in FEET (25 m / 0.3048, an exact IEEE
# round-trip back to 25.0), output distance reported in feet — the
# DistanceUnit contract of NearOperation.java:96-117 (radius in) and
# 145-155 (distance out) with UnitConverter.java's international factors.
# The join SET is bit-identical to nearest_join_r25; only the dist column
# is scaled, and the oracle replays the identical double ops.
_NEAREST_FEET_ORACLE = f"""
{world.oracle_cte('points_events', 'points_part')}
SELECT pid_l, pid_r, dist_ft FROM (
  SELECT l.pid AS pid_l, r.pid AS pid_r,
         ROUND(SQRT((l.x - r.x) * (l.x - r.x)
                  + (l.y - r.y) * (l.y - r.y)) / 0.3048, 6) AS dist_ft,
         ROW_NUMBER() OVER (
           PARTITION BY l.pid
           ORDER BY (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) ASC,
                    r.pid ASC
         ) AS rn
  FROM points_events l
  JOIN points_part r
    ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 625.0
) WHERE rn = 1
"""


@_register("nearest_join_r25_feet", _NEAREST_FEET_ORACLE)
def q_nearest_join_feet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nearest_join_r25 with the radius given in Feet (DistanceUnit.java:
    26-58): unit converts at plan time, dist reports in feet."""
    l = world.points_events(spark, sf_dir)
    r = world.points_part(spark, sf_dir)
    return joins.nearest_join(
        l, r, radius=25.0 / 0.3048, unit="Feet"
    ).select("pid_l", "pid_r", F.col("dist").alias("dist_ft"))


# Ordering and the presentation distance both derive from the EXACT
# integer-mm squared distance (coords are exact n/1000 doubles, so
# ROUND(x*1000) recovers n): the true distance order, shared bit-for-bit
# with joins.knn_join(mm_exact=True)'s packed top-k. The join FILTER stays
# the double expression — identical text on both engines, so the candidate
# set matches bit-for-bit too.
_KNN_ORACLE = f"""
{world.oracle_cte('points_events', 'points_part')}
SELECT pid_l, pid_r, dist, knn_rank FROM (
  SELECT pid_l, pid_r,
         ROUND(SQRT(CAST(d2m AS DOUBLE) / 1000000.0), 6) AS dist,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY pid_l ORDER BY d2m ASC, pid_r ASC
         ) AS INTEGER) AS knn_rank
  FROM (
    SELECT l.pid AS pid_l, r.pid AS pid_r,
           (CAST(FLOOR(l.x * 1000 + 0.5) AS BIGINT) - CAST(FLOOR(r.x * 1000 + 0.5) AS BIGINT))
         * (CAST(FLOOR(l.x * 1000 + 0.5) AS BIGINT) - CAST(FLOOR(r.x * 1000 + 0.5) AS BIGINT))
         + (CAST(FLOOR(l.y * 1000 + 0.5) AS BIGINT) - CAST(FLOOR(r.y * 1000 + 0.5) AS BIGINT))
         * (CAST(FLOOR(l.y * 1000 + 0.5) AS BIGINT) - CAST(FLOOR(r.y * 1000 + 0.5) AS BIGINT))
           AS d2m
    FROM points_events l
    JOIN points_part r
      ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 2500.0
  )
) WHERE knn_rank <= 4
"""


@_register("knn_join_k4_r50", _KNN_ORACLE)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN map join, k=4 within radius 50 (KNearestNeighborMapOperation)."""
    l = world.points_events(spark, sf_dir)
    r = world.points_part(spark, sf_dir)
    out = joins.knn_join(l, r, k=4, radius=50.0, exclude_self=False,
                         mm_exact=True)
    return out.select("pid_l", "pid_r", "dist", F.col("rank").alias("knn_rank"))


_ATTR_JOIN_ORACLE = """
SELECT c.c_mktsegment AS seg,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@_register("attribute_join_agg", _ATTR_JOIN_ORACLE)
def q_attribute_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AttributeJoinProcess: equi-join + group aggregate (Catalyst native)."""
    world.register_tables(spark, sf_dir)
    orders = spark.table("orders")
    customer = spark.table("customer")
    j = joins.attribute_join(
        orders, customer, on=orders.o_custkey == customer.c_custkey
    )
    return j.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# ---------------------------------------------------------------------------
# Binning & grids (M2)
# ---------------------------------------------------------------------------

from . import binning  # noqa: E402

_WORLD = binning.WORLD_BBOX


@_register(
    "rect_binning_events",
    binning.rect_bin_oracle_sql(world.POINTS_EVENTS_SQL, _WORLD, 50, 40),
)
def q_rect_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RectangularBinningProcess: 50x40 grid, sum of integer weight."""
    pts = world.points_events(spark, sf_dir)
    return binning.rect_binning(pts, _WORLD, columns=50, rows=40)


@_register(
    "hex_binning_events",
    binning.hex_bin_oracle_sql(world.POINTS_EVENTS_SQL, _WORLD, 12.0),
)
def q_hex_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HexagonalBinningProcess: pointy-top hex grid size=12, exact
    reference assignment math (nearest-center correction included)."""
    pts = world.points_events(spark, sf_dir)
    return binning.hex_binning(pts, _WORLD, size=12.0)


@_register("fishnet_grid_25", binning.fishnet_oracle_sql(_WORLD, 25.0, 25.0))
def q_fishnet_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FishnetProcess: 40x40 rectangular grid generator (spark.range)."""
    return binning.fishnet_grid(spark, _WORLD, 25.0, 25.0)


@_register("hexagon_grid_30", binning.hexagon_grid_oracle_sql(_WORLD, 30.0))
def q_hexagon_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HexagonProcess: pointy-top hexagon grid generator, size=30."""
    return binning.hexagon_grid(spark, _WORLD, 30.0)


# ---------------------------------------------------------------------------
# Aggregation statistics (M2) — shared-text SQL with exact-integer-sum
# discipline: every SUM runs over integers (order-free), double arithmetic
# happens once per group on exact inputs, so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------

_STATS_LINEITEM_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS qty_sum_c,
       ROUND(CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 / COUNT(*), 6) AS qty_avg,
       MIN(l_quantity) AS qty_min,
       MAX(l_quantity) AS qty_max,
       ROUND((CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)
                 * CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
              - CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                * CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                / COUNT(*))
             / (COUNT(*) - 1) / 10000.0, 6) AS qty_var,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS price_sum_c,
       MIN(l_extendedprice) AS price_min,
       MAX(l_extendedprice) AS price_max
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@_register("stats_lineitem", _STATS_LINEITEM_SQL)
def q_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StatisticsFeaturesProcess: grouped count/sum/mean/min/max/variance
    (DataStatisticsOperation + StatisticsVisitor semantics)."""
    world.register_tables(spark, sf_dir)
    return spark.sql(_STATS_LINEITEM_SQL)


_ZSCORE_SQL = f"""
WITH stats AS (
  SELECT CAST(SUM(w) AS BIGINT) AS s,
         CAST(SUM(w * w) AS BIGINT) AS s2,
         COUNT(*) AS n
  FROM points_events
)
SELECT p.pid AS pid, p.w AS w,
       ROUND((CAST(p.w AS DOUBLE) - CAST(s AS DOUBLE) / n)
             / SQRT((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                    / (n - 1)), 6) AS z
FROM points_events p CROSS JOIN stats
"""


@_register("zscores_events", world.with_layers(_ZSCORE_SQL, "points_events"))
def q_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardizedScoresProcess: per-row z-score of the integer weight
    (sample stddev, matching StatisticsVisitor's n-1)."""
    world.register_layers(spark, sf_dir)
    return spark.sql(_ZSCORE_SQL)


_PEARSON_SQL = """
WITH s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(qx) AS BIGINT) AS sx, CAST(SUM(qy) AS BIGINT) AS sy,
         CAST(SUM(qx * qx) AS BIGINT) AS sxx, CAST(SUM(qy * qy) AS BIGINT) AS syy,
         CAST(SUM(qx * qy) AS BIGINT) AS sxy
  FROM (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS qx,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS qy
        FROM lineitem)
)
SELECT ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (SQRT(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * SQRT(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
FROM s
"""


@_register("pearson_lineitem", _PEARSON_SQL)
def q_pearson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PearsonCorrelationProcess via exact integer sums (order-free)."""
    world.register_tables(spark, sf_dir)
    return spark.sql(_PEARSON_SQL)


_DISSOLVE_SQL = """
SELECT seg,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       MIN(cx - hw) AS uxmin, MIN(cy - hh) AS uymin,
       MAX(cx + hw) AS uxmax, MAX(cy + hh) AS uymax,
       CAST(SUM(CAST(FLOOR(bal * 100.0) AS BIGINT)) AS BIGINT) AS bal_sum_c,
       ROUND(CAST(SUM(CAST(FLOOR(bal * 100.0) AS BIGINT)) AS DOUBLE)
             / 100.0 / COUNT(*), 6) AS bal_avg
FROM rects_customer
GROUP BY seg
"""


@_register("dissolve_rects_seg", world.with_layers(_DISSOLVE_SQL, "rects_customer"))
def q_dissolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DissolveProcess: group rects by segment -> union envelope + stats
    (DissolveOperation.java:74-169; envelope stands in for the cascaded
    polygon union, exact for axis-aligned layers)."""
    world.register_layers(spark, sf_dir)
    return spark.sql(_DISSOLVE_SQL)


# ---------------------------------------------------------------------------
# Spatial autocorrelation (M5) — pair table + exact integer sums + shared
# scalar stage fragments (see autocorr.py docstring for the parity contract).
# Analysis field v = w % 97 keeps 4th-moment integer sums overflow-free.
# ---------------------------------------------------------------------------

from . import autocorr  # noqa: E402

_AC_BAND = 10.0


def _ac_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return world.points_events(spark, sf_dir).withColumn("v", F.expr("w % 97"))


_AC_PTS_CTE = (
    "pts AS (SELECT pid, x, y, w % 97 AS v FROM points_events)"
)
_AC_PAIRS_CTE = (
    "pairs AS (SELECT a.pid AS pid_l, b.pid AS pid_r, a.v AS vi, b.v AS vj "
    "FROM pts a JOIN pts b ON (a.x - b.x) * (a.x - b.x) "
    "+ (a.y - b.y) * (a.y - b.y) <= 100.0)"
)
_AC_MOMENTS_CTE = (
    "moments AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s, "
    "CAST(SUM(v * v) AS BIGINT) AS s2, CAST(SUM(v * v * v) AS BIGINT) AS s3, "
    "CAST(SUM(v * v * v * v) AS BIGINT) AS s4 FROM pts)"
)


def _moran_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM moments CROSS JOIN pagg CROSS JOIN degs",
        autocorr.GLOBAL_MORAN_STAGES,
    )
    return world.with_layers(
        f"""
WITH {_AC_PTS_CTE},
{_AC_PAIRS_CTE},
nself AS (SELECT * FROM pairs WHERE pid_l <> pid_r),
{_AC_MOMENTS_CTE},
pagg AS (SELECT COUNT(*) AS n_pairs, CAST(SUM(vi * vj) AS BIGINT) AS p11,
         CAST(SUM(vi) AS BIGINT) AS pl, CAST(SUM(vj) AS BIGINT) AS pr FROM nself),
degs AS (SELECT CAST(SUM(deg * deg) AS BIGINT) AS sumdeg2 FROM
         (SELECT pid_l, COUNT(*) AS deg FROM nself GROUP BY pid_l))
SELECT ROUND(moran_i, 6) AS moran_i, ROUND(expected_i, 6) AS expected_i,
       ROUND(z_var, 6) AS z_var, ROUND(z_score, 6) AS z_score,
       ROUND(p_value, 6) AS p_value
FROM {nested}
""",
        "points_events",
    )


@_register("global_morans_i", _moran_oracle())
def q_global_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalMoransIProcess: fixed-distance-band binary weights, band=10."""
    return autocorr.global_morans_i(_ac_points(spark, sf_dir), _AC_BAND)


def _local_moran_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM per_i CROSS JOIN moments", autocorr.LOCAL_MORAN_STAGES
    )
    return world.with_layers(
        f"""
WITH {_AC_PTS_CTE},
{_AC_PAIRS_CTE},
nself AS (SELECT * FROM pairs WHERE pid_l <> pid_r),
{_AC_MOMENTS_CTE},
per_i AS (SELECT pid_l AS pid, vi AS v, COUNT(*) AS deg,
          CAST(SUM(vj) AS BIGINT) AS nbr_sum FROM nself GROUP BY pid_l, vi)
SELECT pid, ROUND(lmi_index, 6) AS lmi_index, ROUND(lmi_z, 6) AS lmi_z,
       ROUND(lmi_p, 6) AS lmi_p, co_type
FROM {nested}
""",
        "points_events",
    )


@_register("local_morans_i", _local_moran_oracle())
def q_local_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalMoransIProcess (Anselin LISA) + HH/LL/HL/LH COType bins."""
    return autocorr.local_morans_i(_ac_points(spark, sf_dir), _AC_BAND)


def _local_g_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM per_i CROSS JOIN moments", autocorr.LOCAL_G_STAGES
    )
    return world.with_layers(
        f"""
WITH {_AC_PTS_CTE},
{_AC_PAIRS_CTE},
{_AC_MOMENTS_CTE},
per_i AS (SELECT pid_l AS pid, vi AS v, COUNT(*) AS deg_s,
          CAST(SUM(vj) AS BIGINT) AS loc_sum FROM pairs GROUP BY pid_l, vi)
SELECT pid, ROUND(gi_z, 6) AS gi_z, ROUND(gi_p, 6) AS gi_p,
       ROUND(gi_mean, 6) AS gi_mean, ROUND(gi_var, 6) AS gi_var
FROM {nested}
""",
        "points_events",
    )


@_register("local_g_star", _local_g_oracle())
def q_local_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalGStatisticsProcess (Getis-Ord Gi*, selfNeighbors=true)."""
    return autocorr.local_g(_ac_points(spark, sf_dir), _AC_BAND)


def _nni_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM agg", autocorr.NNI_STAGES
    )
    return world.with_layers(
        f"""
WITH nearest AS (
  SELECT pid_l, d2 FROM (
    SELECT a.pid AS pid_l, b.pid AS pid_r,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
           ROW_NUMBER() OVER (PARTITION BY a.pid
             ORDER BY (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) ASC,
                      b.pid ASC) AS rn
    FROM points_events a JOIN points_events b
      ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 2500.0
     AND a.pid <> b.pid
  ) WHERE rn = 1
),
agg AS (SELECT COUNT(*) AS n,
        CAST(SUM(CAST(FLOOR(SQRT(d2) * 1000000.0) AS BIGINT)) AS BIGINT) AS dist_sum_u
        FROM nearest)
SELECT CAST(n AS BIGINT) AS n, ROUND(obs_mean, 6) AS obs_mean,
       ROUND(exp_mean, 6) AS exp_mean, ROUND(nn_ratio, 6) AS nn_ratio,
       ROUND(nni_z, 6) AS nni_z, ROUND(nni_p, 6) AS nni_p
FROM {nested}
""",
        "points_events",
    )


@_register("nni_events", _nni_oracle())
def q_nni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NearestNeighborProcess (average NN index), search radius 50."""
    return autocorr.nni(world.points_events(spark, sf_dir), search_radius=50.0)


def _quadrat_oracle() -> str:
    nq = 40 * 40
    sub = binning.stages_to_subquery(
        world.LAYER_SQL["points_events"], binning.rect_bin_stages(_WORLD, 40, 40)
    )
    stages = [
        ("qmean", f"CAST(sum_c AS DOUBLE) / {world.dlit(float(nq))}"),
        (
            "qvariance",
            f"(CAST(sum_c2 AS DOUBLE) - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE) "
            f"/ {world.dlit(float(nq))}) / {world.dlit(float(nq))}",
        ),
        ("vmr", "qvariance / qmean"),
    ]
    nested = binning.stages_to_subquery("SELECT * FROM agg", stages)
    return f"""
WITH cellcnt AS (
  SELECT col, row, COUNT(*) AS c FROM {sub}
  WHERE col >= 0 AND row >= 0 AND col < 40 AND row < 40 GROUP BY col, row
),
agg AS (SELECT CAST(SUM(c) AS BIGINT) AS sum_c,
        CAST(SUM(c * c) AS BIGINT) AS sum_c2 FROM cellcnt)
SELECT CAST({nq} AS BIGINT) AS n_quadrats, sum_c AS n_points,
       ROUND(qmean, 6) AS qmean, ROUND(qvariance, 6) AS qvariance,
       ROUND(vmr, 6) AS vmr
FROM {nested}
"""


@_register("quadrat_events", _quadrat_oracle())
def q_quadrat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuadratAnalysisProcess VMR over a 40x40 grid (KS-D computed
    driver-side via autocorr.quadrat_ks on the tiny histogram)."""
    return autocorr.quadrat(world.points_events(spark, sf_dir), _WORLD, 40, 40)


# ---------------------------------------------------------------------------
# Raster / image pipeline (M4)
# ---------------------------------------------------------------------------

from . import raster  # noqa: E402


@_register("image_tile_assign", raster.footprint_tiles_oracle_sql())
def q_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footprint->tile assignment for the image+caption table (the
    BASELINE.json tile-assignment contract; caption carried through to prove
    per-row caption equality)."""
    return raster.footprint_tiles(raster.images_meta(spark, sf_dir))


@_register("zonal_stats_rects", raster.zonal_oracle_sql())
def q_zonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterZonalStatisticsProcess: per-zone count/sum/mean/min/max of the
    synthetic value raster (500x500) under customer-rect zones."""
    return raster.zonal_stats(spark, world.rects_customer(spark, sf_dir))


@_register(
    "kernel_density_quartic",
    raster.kernel_density_oracle_sql(world.POINTS_EVENTS_SQL),
)
def q_kernel_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KernelDensityProcess (quartic kernel, exact reference stamping
    semantics: integer pixel offsets, scaleArea normalization)."""
    return raster.kernel_density(world.points_events(spark, sf_dir))


def q_rasterize_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rasterize image luminance into world tiles (pixel-level path;
    rows-only check — pixel blocks validated in pytest instead)."""
    tiles = raster.rasterize_tiles(raster.images_table(spark, sf_dir))
    return tiles.select(
        "tx", "ty", "npix", F.round("sum_lum", 2).alias("sum_lum")
    )


QUERIES["rasterize_tiles"] = q_rasterize_tiles


@_register("rasterize_tiles_sums", raster.rasterize_tiles_sums_oracle())
def q_rasterize_tiles_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated rasterize_tiles twin: per tile (npix, lum3) where lum3
    recovers the exact INTEGER 3*sum_lum (luminance is s/3 with integer
    s per generator pixel) — the closed-form oracle replays the burn
    kernel's dyadic pixel-center mapping and mod-256 generator in SQL,
    pinning the raster<->vector nearest-neighbor geometry bit-exactly."""
    tiles = raster.rasterize_tiles(raster.images_table(spark, sf_dir))
    return tiles.select(
        "tx", "ty", F.col("npix").cast("long").alias("npix"),
        F.expr("CAST(FLOOR(sum_lum * 3.0 + 0.5) AS BIGINT)").alias("lum3"),
    )


def q_rasterize_tiles_lossy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rasterize tiles from the LOSSY (fmt='dct') image table — exercises
    the BASELINE "PSNR>=40dB for lossy formats" invariant end-to-end: the
    burn decodes through the pure-numpy DCT codec (rows-only check; the
    40 <= PSNR < inf bound itself is asserted in pytest)."""
    tiles = raster.rasterize_tiles(raster.images_table_lossy(spark, sf_dir))
    return tiles.select(
        "tx", "ty", "npix", F.round("sum_lum", 2).alias("sum_lum")
    )


QUERIES["rasterize_tiles_lossy"] = q_rasterize_tiles_lossy


from . import imageops  # noqa: E402

_RESIZE_CONST_ORACLE = """
SELECT CONCAT('img_', CAST(o_orderkey AS VARCHAR(32))) AS image_id,
       CAST(16 AS INT) AS w, CAST(12 AS INT) AS h,
       CAST((o_orderkey % 251) * 16 * 12 * 3 AS BIGINT) AS pix_sum
FROM orders
"""


@_register("image_resize_const", _RESIZE_CONST_ORACLE)
def q_image_resize_const(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImageResize (bilinear, half-pixel centers) against a CLOSED-FORM
    answer: bilinear resampling of a constant-color image is that constant
    at any output size, so resizing v = okey % 251 planes to 16x12 gives
    pix_sum = v*16*12*3 exactly (the kernel's floor(v+0.5) re-quantization
    absorbs fp weight error). Gates decode -> resize -> checksum
    end-to-end through mapInPandas."""
    const = imageops.with_const_bytes(raster.images_meta(spark, sf_dir))
    return imageops.image_pixel_sums(
        imageops.resize_images(const, 16, 12)
    )


_RESIZE_IDENT_ORACLE = """
WITH m AS (SELECT o_orderkey AS okey,
           CONCAT('img_', CAST(o_orderkey AS VARCHAR(32))) AS image_id
           FROM orders WHERE o_orderkey % 12 = 0),
s AS (SELECT image_id, okey,
      UNNEST(generate_series(0, 767)) AS i FROM m)
SELECT image_id, CAST(16 AS INT) AS w, CAST(16 AS INT) AS h,
       CAST(SUM((okey * 31 + i * 7) % 256) AS BIGINT) AS pix_sum
FROM s GROUP BY image_id
"""


@_register("image_resize_identity", _RESIZE_IDENT_ORACLE)
def q_image_resize_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity-dimension bilinear resize reproduces the deterministic
    16x16 pattern images bit-exactly (sampling grid hits integer
    coordinates, weights collapse to 1), so the decoded checksum equals
    the pattern sum the oracle computes term-by-term. Verifies the
    resize kernel's grid alignment on REAL (non-constant) pixel data."""
    imgs = raster.images_table(spark, sf_dir).where("okey % 12 = 0")
    return imageops.image_pixel_sums(imageops.resize_images(imgs, 16, 16))


@_register("frame_sample_stride2", imageops.frame_sample_oracle_sql(2))
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FrameSample over a video-as-binary column: every 2nd frame of each
    synthetic rgb8seq payload, one row per sampled frame with its decoded
    checksum (closed-form oracle). The frame bytes themselves are dropped
    for the gate (binary not oracle-expressible); pytest pins them."""
    return imageops.frame_sample(
        imageops.videos_table(spark, sf_dir), stride=2
    ).drop("frame")


def _perm_gate_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The permutation-op gate input: real decoded-pattern images on the
    deterministic okey % 7 = 3 subsample (all (w,h) combos, bounded
    oracle fan-out — see imageops.PERM_GATE_FILTER)."""
    return raster.images_table(spark, sf_dir).where(
        imageops.PERM_GATE_FILTER)


@_register("image_flip_h", imageops.flip_h_oracle_sql())
def q_image_flip_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImageFlip (left-right mirror) gated by the position-WEIGHTED
    checksum — plain pixel sums are permutation-invariant, so the gate
    projects sum(pixel[i] * (i+1)), which the oracle reproduces term by
    term from the closed-form generator through the flip index map."""
    return imageops.probe_checksums(
        imageops.flip_images(_perm_gate_images(spark, sf_dir), "h"))


@_register("image_flip_v", imageops.flip_v_oracle_sql())
def q_image_flip_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImageFlip (top-bottom mirror); same weighted-checksum contract as
    `image_flip_h` with the row-reversal index map."""
    return imageops.probe_checksums(
        imageops.flip_images(_perm_gate_images(spark, sf_dir), "v"))


@_register("image_rot90", imageops.rot90_oracle_sql())
def q_image_rot90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImageRotate90 (CCW, np.rot90 convention, dims swapped); weighted
    checksum vs the rotation index map oracle."""
    return imageops.probe_checksums(
        imageops.rotate90_images(_perm_gate_images(spark, sf_dir)))


@_register("image_center_crop", imageops.center_crop_oracle_sql(12, 10))
def q_image_center_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImageCenterCrop (centered 12x10 window, floor-offset convention);
    weighted checksum vs the crop index map oracle."""
    return imageops.probe_checksums(
        imageops.center_crop_images(_perm_gate_images(spark, sf_dir),
                                    12, 10))


@_register("image_channel_stats", imageops.channel_stats_oracle_sql())
def q_image_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel decoded statistics (sum/min/max per RGB channel) — the
    feature-extraction projection a curation pipeline filters on; oracle
    computes the same stats from the closed-form pixel generator."""
    return imageops.channel_stats(_perm_gate_images(spark, sf_dir))


@_register("image_patchify", imageops.patchify_oracle_sql())
def q_image_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImagePatchify (ViT-style non-overlapping 8x8 patch extraction):
    one row per patch with the patch pixel sum and the local
    position-weighted checksum, which pins the within-patch pixel ORDER
    the patch-embedding contract depends on."""
    return imageops.patchify_images(_perm_gate_images(spark, sf_dir))


@_register("image_grayscale", imageops.grayscale_oracle_sql())
def q_image_grayscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImageGrayscale (BT.601 integer luma) gated through the gray8
    payload's weighted checksum — exact integer math end-to-end, so the
    oracle rebuilds every luma term from the pixel generator."""
    return imageops.gray_checksums(
        imageops.grayscale_images(_perm_gate_images(spark, sf_dir)))


@_register("image_histogram", imageops.value_histogram_oracle_sql())
def q_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 16-bin byte-value histogram (quality/anomaly scoring
    primitive); sparse (image_id, bin, cnt) rows vs the closed-form
    generator histogram."""
    return imageops.value_histogram(_perm_gate_images(spark, sf_dir))


@_register("image_pad_square", imageops.pad_square_oracle_sql())
def q_image_pad_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImagePadSquare (zero-pad right/bottom to max(w,h) square);
    weighted checksum over the padded output, where the zero pad region
    still shifts every source pixel's weight — a wrong pad layout
    hash-mismatches even though zeros add nothing."""
    return imageops.probe_checksums(
        imageops.pad_square_images(_perm_gate_images(spark, sf_dir)))


@_register("image_exact_dedup", imageops.exact_dedup_oracle_sql())
def q_image_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup over the FULL image table: Spark groups
    by sha2(bytes) while the oracle groups by the generator's
    duplicate-class key (okey mod 768 — see exact_dedup_images docstring
    for the proof they coincide), so the gate verifies real binary
    dedup against metadata-only SQL."""
    return imageops.exact_dedup_images(raster.images_table(spark, sf_dir))


@_register("image_ar_buckets", imageops.aspect_ratio_oracle_sql())
def q_image_ar_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing over the FULL table (per-mille integer
    ratio) — the batch-shape grouping pass; pure Catalyst agg, no
    decode."""
    return imageops.aspect_ratio_buckets(raster.images_table(spark, sf_dir))


@_register("image_brightness_filter", imageops.brightness_filter_oracle_sql())
def q_image_brightness_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-then-threshold curation filter: keep images whose mean
    BT.601 luma exceeds the population median, compared as the exact
    integer predicate 16*lsum > 2029*w*h on both engines."""
    return imageops.brightness_filter(_perm_gate_images(spark, sf_dir))


@_register("video_temporal_diff", imageops.temporal_diff_oracle_sql())
def q_video_temporal_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VideoTemporalDiff (consecutive-frame L1 distance, the
    shot-boundary score) over the full packed-frame video table; the
    constant-plane generator makes every pairwise diff closed-form."""
    return imageops.temporal_diff(imageops.videos_table(spark, sf_dir))


@_register("image_nn_resize", imageops.nn_resize_oracle_sql(20, 14))
def q_image_nn_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImageResize (nearest-neighbor) to 20x14 — a non-divisor size that
    upscales or downscales depending on each image's dims; the exact
    integer index map gives REAL pattern images a closed-form weighted
    checksum at arbitrary scale (bilinear only gates at its
    identity/constant closed-form points)."""
    return imageops.probe_checksums(
        imageops.nn_resize_images(_perm_gate_images(spark, sf_dir), 20, 14))


_CAPTION_STATS_ORACLE = """
WITH c AS (SELECT o_orderpriority AS pri,
           CONCAT('cap ', o_orderpriority, ' ',
                  CAST(o_orderkey AS VARCHAR(32))) AS caption
           FROM orders)
SELECT pri,
       CAST(COUNT(*) AS BIGINT) AS n_caps,
       CAST(COUNT(DISTINCT caption) AS BIGINT) AS n_distinct,
       CAST(SUM(len(string_split(caption, ' '))) AS BIGINT) AS tok_sum,
       CAST(SUM(length(caption)) AS BIGINT) AS char_sum
FROM c GROUP BY pri
"""


@_register("caption_token_stats", _CAPTION_STATS_ORACLE)
def q_caption_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-column text stats over the image+caption table: the Spark
    side works ONLY from the materialized caption strings (priority
    re-extracted as the second whitespace token, token/char sums from the
    actual text), while the oracle rebuilds captions from orders — so any
    caption corruption anywhere in the image table pipeline
    hash-mismatches. Exact-caption-handling evidence for the BASELINE
    per-row caption-equality contract, at full-table scale with no
    decode. (The priority itself may contain spaces — '4-NOT SPECIFIED'
    — so it is recovered as everything between the 'cap ' prefix and the
    trailing numeric id, not as a whitespace token.)"""
    return (
        raster.images_meta(spark, sf_dir)
        .select(
            F.regexp_extract("caption", r"^cap (.*) [0-9]+$", 1)
            .alias("pri"),
            F.col("caption"),
        )
        .groupBy("pri")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_caps"),
            F.countDistinct("caption").cast("long").alias("n_distinct"),
            F.sum(F.size(F.split("caption", " "))).cast("long")
            .alias("tok_sum"),
            F.sum(F.length("caption")).cast("long").alias("char_sum"),
        )
    )


@_register("image_augment_chain", imageops.augment_chain_oracle_sql(14, 12))
def q_image_augment_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused augmentation chain (flip_h -> rot90 -> center_crop 14x12) in
    ONE decode/encode pass; the oracle composes the three verified
    single-op index maps textually, so the gate pins that the fused
    kernel equals the sequential pipeline term by term."""
    return imageops.probe_checksums(
        imageops.augment_chain_images(_perm_gate_images(spark, sf_dir),
                                      14, 12))


@_register("image_train_split", imageops.train_split_oracle_sql())
def q_image_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5(image_id)
    bucket over the FULL image table — both engines hash the same id
    strings through the same portable hex-decode SQL, so per-split counts
    and okey checksums must agree exactly."""
    return imageops.train_split(raster.images_meta(spark, sf_dir))


@_register("image_diversity", imageops.image_diversity_oracle_sql())
def q_image_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image exact-integer Gini-Simpson diversity (sum of squared
    16-bin histogram counts) — the low-diversity/near-constant-image
    quality filter, gated bit-exactly (a Shannon entropy would sit on
    sub-ulp libm log differences)."""
    return imageops.image_diversity(_perm_gate_images(spark, sf_dir))


@_register("image_shard_plan", imageops.shard_plan_oracle_sql(1 << 20))
def q_image_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-grain shard plan: running-size cutoff at 1 MiB in okey
    order -> per-shard (count, bytes, okey span). The sizing pass the tar
    sink uses; at 10^12 images it runs over the per-file lineage table,
    never per-image rows (see imageops.shard_plan docstring)."""
    return imageops.shard_plan(raster.images_meta(spark, sf_dir), 1 << 20)


_WDS_CAPSUM = imageops.md5_bucket_sql("concat(image_id, '|', caption)")
_WDS_META_ORACLE = f"""
WITH m AS (SELECT CONCAT('img_', CAST(o_orderkey AS VARCHAR(32)))
           AS image_id,
           CAST(16 + (o_orderkey % 4) * 8 AS INT) AS w,
           CAST(16 + (o_orderkey % 3) * 8 AS INT) AS h,
           CONCAT('cap ', o_orderpriority, ' ',
                  CAST(o_orderkey AS VARCHAR(32))) AS caption
           FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(CAST(w AS BIGINT) * h * 3) AS BIGINT) AS payload_bytes,
       CAST(SUM({_WDS_CAPSUM}) AS BIGINT) AS capsum
FROM m
"""


@_register("wds_roundtrip_meta", _WDS_META_ORACLE)
def q_wds_roundtrip_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar-shard round-trip, metadata leg: export the FULL
    image table as tar shards, re-read via binaryFile + tar parse, and
    aggregate (row count, payload bytes, md5 caption-row checksum). The
    oracle recomputes all three from orders alone — any id/caption/dims
    corruption through the tar layer hash-mismatches. The BASELINE
    per-row caption-equality contract, exercised through a real external
    format."""
    from . import wds

    path = wds.wds_fixture(spark, sf_dir)
    back = wds.read_wds_shards(spark, path)
    return back.agg(
        F.count("*").cast("long").alias("n_images"),
        F.sum(F.expr("CAST(w AS BIGINT) * h * 3")).alias("payload_bytes"),
        F.sum(F.expr(_WDS_CAPSUM)).cast("long").alias("capsum"),
    )


_WDS_LOOKUP_ORACLE = """
SELECT CONCAT('img_', CAST(o_orderkey AS VARCHAR(32))) AS image_id,
       CAST(o_orderkey AS BIGINT) AS okey,
       CAST(16 + (o_orderkey % 4) * 8 AS INT) AS w,
       CAST(16 + (o_orderkey % 3) * 8 AS INT) AS h,
       'rgb8' AS fmt,
       CONCAT('cap ', o_orderpriority, ' ',
              CAST(o_orderkey AS VARCHAR(32))) AS caption
FROM orders WHERE o_orderkey BETWEEN 1 AND 40
"""


@_register("wds_lookup_pruned", _WDS_LOOKUP_ORACLE)
def q_wds_lookup_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-range lookup through the WDS MANIFEST zone map: the reader
    prunes shards by [okey_min, okey_max] BEFORE the binaryFile scan
    (range-partitioned export -> disjoint shard ranges -> a point lookup
    opens one tar of N), then row-filters to the exact range; the oracle
    regenerates the metadata from orders. Pruning-efficacy (only 1 shard
    read for a point key) is pytest-pinned in tests/test_wds.py."""
    from . import wds

    path = wds.wds_fixture(spark, sf_dir)
    return wds.read_wds_shards(spark, path, okey_range=(1, 40)).select(
        "image_id", "okey", "w", "h", "fmt", "caption"
    )


@_register("wds_roundtrip_pixels", imageops._perm_oracle_sql("i"))
def q_wds_roundtrip_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset round-trip, pixel leg: decode the re-read tar payloads
    (okey % 7 = 3 subsample) and take the position-weighted checksum; the
    identity index-map oracle recomputes it from the closed-form
    generator — bit-exact pixel preservation through export + import."""
    from . import wds

    path = wds.wds_fixture(spark, sf_dir)
    back = wds.read_wds_shards(spark, path).where(imageops.PERM_GATE_FILTER)
    return imageops.probe_checksums(back)


from . import quadkey as _qk_mod  # noqa: E402

_IMG_QK_ORACLE = _qk_mod.quadkey_rollup_oracle(
    fine_level=7,
    coarse_levels=2,
    layer_cte=f"WITH m AS ({raster.IMAGES_META_SQL_DUCK})",
    layer_name="m",
    x="fx",
    y="fy",
    w="CAST(w AS BIGINT) * h",
)


@_register("image_quadkey_rollup", _IMG_QK_ORACLE)
def q_image_quadkey_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical cell index OVER THE IMAGE TABLE: level-7 Morton
    quadkeys of each image's footprint origin with per-cell image count
    and pixel volume, parents rolled up from cells (qk DIV 4) — the
    spatial x image fusion the north rule centers on: where is my
    training data, at every zoom, one scan of 10^12 rows."""
    pts = raster.images_meta(spark, sf_dir).selectExpr(
        "fx AS x", "fy AS y", "CAST(w AS BIGINT) * h AS w"
    )
    return _qk_mod.quadkey_rollup(pts, fine_level=7, coarse_levels=2)


_IMG_ZONES_ORACLE = f"""
{world.oracle_cte('rects_customer')},
m AS ({raster.IMAGES_META_SQL_DUCK})
SELECT r.rid AS rid,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(m.w AS BIGINT) * m.h) AS BIGINT) AS px_total
FROM rects_customer r
JOIN m ON m.fx >= r.cx - r.hw AND m.fx <= r.cx + r.hw
      AND m.fy >= r.cy - r.hh AND m.fy <= r.cy + r.hh
GROUP BY r.rid
"""


@_register("images_in_zones", _IMG_ZONES_ORACLE)
def q_images_in_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-zone image inventory: PIP join of image footprint origins
    against the customer polygon layer -> (rid, cnt, px_total). The
    image-table instance of the flagship broadcast cell join — curation
    by geography ("how much training data covers each AOI")."""
    pts = raster.images_meta(spark, sf_dir).selectExpr(
        "image_id", "fx AS x", "fy AS y", "CAST(w AS BIGINT) * h AS px"
    )
    return (
        joins.pip_count_join(pts, world.rects_customer(spark, sf_dir),
                             weight_col="px")
        .withColumnRenamed("sum_w", "px_total")
    )


_SPLIT_ZONE_ORACLE = f"""
{world.oracle_cte('rects_customer')},
m AS ({raster.IMAGES_META_SQL_DUCK})
SELECT r.rid AS rid, {imageops.SPLIT_CASE_SQL} AS split,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM rects_customer r
JOIN m ON m.fx >= r.cx - r.hw AND m.fx <= r.cx + r.hw
      AND m.fy >= r.cy - r.hh AND m.fy <= r.cy + r.hh
GROUP BY r.rid, split
"""


@_register("split_zone_balance", _SPLIT_ZONE_ORACLE)
def q_split_zone_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator COMPOSITION: the deterministic train/val/test split
    layered onto the per-zone PIP join -> (rid, split, cnt) — the
    "is my validation set geographically balanced" audit. Built from the
    public pair-level join (`joins.pip_pairs_join`) plus the shared split
    expression; one broadcast cell join, one aggregation."""
    pts = (
        raster.images_meta(spark, sf_dir)
        .selectExpr("image_id", "fx AS x", "fy AS y")
        .withColumn("split", F.expr(imageops.SPLIT_CASE_SQL))
    )
    pairs = joins.pip_pairs_join(pts, world.rects_customer(spark, sf_dir))
    return pairs.groupBy("rid", "split").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


@_register("caption_collision_audit", imageops.caption_collision_oracle_sql())
def q_caption_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption classes labeling >1 distinct content — the label-noise
    groups a caption-dedup would wrongly collapse."""
    return imageops.caption_collision(spark, sf_dir)


@_register("split_leakage_audit", imageops.split_leakage_oracle_sql())
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs straddling a train/val/test boundary — the split-
    leakage quarantine list. Split rides the phash chunk shuffle
    (carry=), so the audit costs exactly the near-dup join."""
    return imageops.split_leakage(spark, sf_dir)


@_register("image_dedup_canonical", imageops.dedup_canonical_oracle_sql())
def q_image_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup survivor set over the FULL image table: the canonical
    (min-okey) representative per sha2 content class, with class size —
    the other half of the dedup contract (`image_exact_dedup` reports
    classes; this is the filtered table you train on)."""
    return imageops.dedup_canonical(raster.images_table(spark, sf_dir))


# ---------------------------------------------------------------------------
# Training-data pipeline ops: dedup / text analysis / ANN
# ---------------------------------------------------------------------------

from . import ann, textops  # noqa: E402

_EXACT_DEDUP_ORACLE = """
WITH twice AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents
)
SELECT CAST(MIN(doc_id) AS BIGINT) AS keeper, CAST(COUNT(*) AS BIGINT) AS dup_cnt
FROM twice GROUP BY text
"""


@_register("dedup_exact", _EXACT_DEDUP_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash groupBy on the document body); input doubled with
    shifted ids so every text has exactly one duplicate to collapse."""
    world.register_tables(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    twice = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return textops.exact_dedup(twice)


@_register("ngram_jaccard_pairs", textops.ngram_jaccard_oracle())
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram (word-3gram) Jaccard near-dup pairs, same-lang candidates."""
    world.register_tables(spark, sf_dir)
    return textops.ngram_jaccard_pairs(spark)


@_register("minhash_lsh_pairs", textops.minhash_lsh_oracle())
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) signatures + LSH(4x4) banding candidate pairs."""
    world.register_tables(spark, sf_dir)
    return textops.minhash_lsh_pairs(spark)


@_register("minhash_lsh_b8r2", textops.minhash_lsh_oracle(bands=8, rows=2))
def q_minhash_lsh_b8r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH at the second banding config (8 bands x 2 rows —
    S-curve threshold j* ~ 0.35 vs the default 4x4's ~ 0.71), proving the
    width is a real parameter of the same banded topology."""
    world.register_tables(spark, sf_dir)
    return textops.minhash_lsh_pairs(spark, bands=8, rows=2)


@_register("neardup_clusters", textops.neardup_clusters_oracle())
def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster assignment — the deliverable a near-dup pipeline
    actually ships: connected components over the MinHash-LSH(8x2)
    candidate graph (integer n_match >= 8 edge threshold), cluster id =
    min doc_id in the component, keep = canonical representative.
    Spark: min-label propagation to fixpoint (rounds = component
    diameter); oracle: transitive closure by recursive CTE."""
    world.register_tables(spark, sf_dir)
    return textops.neardup_clusters(spark)


@_register("simhash_docs", textops.simhash_oracle())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 16-bit SimHash over token hashes."""
    world.register_tables(spark, sf_dir)
    return textops.simhash_docs(spark)


@_register("text_profile", textops.text_profile_oracle())
def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality/language analytics: token stats, stopword ratio,
    lexicon-based language prediction."""
    world.register_tables(spark, sf_dir)
    return textops.text_profile(spark)


@_register("doc_fingerprint", textops.fingerprint_oracle())
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial document fingerprint."""
    world.register_tables(spark, sf_dir)
    return textops.fingerprint(spark)


@_register("ann_cosine_topk", ann.cosine_topk_oracle())
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for 20 query vectors (ANN baseline)."""
    world.register_tables(spark, sf_dir)
    return ann.cosine_topk(spark)


@_register("ann_lsh_buckets", ann.lsh_buckets_oracle())
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (the ANN scale path)."""
    world.register_tables(spark, sf_dir)
    return ann.lsh_buckets(spark)


@_register("embedding_neardup", ann.cosine_neardup_oracle(0.35))
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within LSH buckets (threshold 0.35)."""
    world.register_tables(spark, sf_dir)
    return ann.cosine_neardup_pairs(spark, threshold=0.35)


# ---------------------------------------------------------------------------
# Distribution descriptors (M-dist)
# ---------------------------------------------------------------------------

from . import distribution  # noqa: E402


@_register(
    "mean_center_by_cat",
    distribution.mean_center_oracle_sql(world.POINTS_EVENTS_SQL, "cat"),
)
def q_mean_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MeanCenterProcess: (weighted) mean center per case group."""
    return distribution.mean_center(world.points_events(spark, sf_dir), "cat")


@_register(
    "standard_distance",
    distribution.sd_oracle_sql(world.POINTS_EVENTS_SQL),
)
def q_standard_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SDProcess: standard-distance circle."""
    return distribution.standard_distance(world.points_events(spark, sf_dir))


@_register(
    "std_dev_ellipse",
    distribution.sde_oracle_sql(world.POINTS_EVENTS_SQL),
)
def q_sde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SDEProcess: standard deviational ellipse."""
    return distribution.std_dev_ellipse(world.points_events(spark, sf_dir))


@_register(
    "directional_mean",
    distribution.directional_mean_oracle_sql(world.LINES_ORDERS_SQL),
)
def q_directional_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DirectionalMeanProcess over the synthetic segment layer."""
    world.register_layers(spark, sf_dir)
    return distribution.directional_mean(spark.table("lines_orders"))


@_register(
    "central_feature",
    distribution.central_feature_oracle_sql(world.POINTS_PART_SQL),
)
def q_central_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CentralFeatureProcess on the part layer (pair aggregation argmin)."""
    return distribution.central_feature(world.points_part(spark, sf_dir))


# ---------------------------------------------------------------------------
# Transformers (M3): buffer / clip / affine / dedup / collect / union-area
# ---------------------------------------------------------------------------

from . import transforms  # noqa: E402

_BUFFER_ORACLE = world.with_layers(
    """
SELECT pid, x AS cx, y AS cy,
       CAST(w % 10 + 2 AS DOUBLE) AS radius,
       CAST(w % 10 + 2 AS DOUBLE) AS buf_dist,
       ROUND(CAST(3.141592653589793 AS DOUBLE) * CAST(w % 10 + 2 AS DOUBLE)
             * CAST(w % 10 + 2 AS DOUBLE), 6) AS buf_area
FROM points_events
""",
    "points_events",
)


@_register("buffer_points_expr", _BUFFER_ORACLE)
def q_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BufferExpressionProcess: expression-distance point buffers."""
    return transforms.buffer_points(world.points_events(spark, sf_dir))


_CLIP_ORACLE = world.with_layers(
    """
SELECT pid, x, y FROM points_events
WHERE x >= 200.0 AND x <= 700.0 AND y >= 100.0 AND y <= 600.0
""",
    "points_events",
)


@_register("clip_points_rect", _CLIP_ORACLE)
def q_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClipWithGeometryProcess (rect fast path)."""
    pts = world.points_events(spark, sf_dir)
    return transforms.clip_points(pts, 200.0, 100.0, 700.0, 600.0).select(
        "pid", "x", "y"
    )


_AFFINE_ORACLE = world.with_layers(
    """
SELECT rid, cx * CAST(1.5 AS DOUBLE) + CAST(10.0 AS DOUBLE) AS cx,
       cy * CAST(1.5 AS DOUBLE) + CAST(-5.0 AS DOUBLE) AS cy,
       hw * CAST(1.5 AS DOUBLE) AS hw, hh * CAST(1.5 AS DOUBLE) AS hh
FROM rects_customer
""",
    "rects_customer",
)


@_register("affine_rects", _AFFINE_ORACLE)
def q_affine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset+Scale FeaturesProcess (parametric affine)."""
    return transforms.affine_rects(
        world.rects_customer(spark, sf_dir), dx=10.0, dy=-5.0, scale=1.5
    )


_AREA_ORACLE = world.with_layers(
    """
SELECT rid, (hw * 2) * (hh * 2) AS area, ((hw * 2) + (hh * 2)) * 2 AS perimeter
FROM rects_customer
""",
    "rects_customer",
)


@_register("calc_area_perimeter", _AREA_ORACLE)
def q_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CalculateAreaProcess: area + perimeter columns."""
    return transforms.calculate_area_perimeter(world.rects_customer(spark, sf_dir))


_DEDUP_GEOM_ORACLE = world.with_layers(
    """
SELECT ix, iy, CAST(MIN(pid) AS BIGINT) AS pid, CAST(COUNT(*) AS BIGINT) AS n_dups
FROM points_events GROUP BY ix, iy
""",
    "points_events",
)


@_register("delete_duplicates", _DEDUP_GEOM_ORACLE)
def q_delete_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeleteDuplicatesProcess on exact geometry."""
    return transforms.delete_duplicates(world.points_events(spark, sf_dir))


_COLLECT_ORACLE = world.with_layers(
    """
SELECT CAST(FLOOR(x / CAST(5.0 AS DOUBLE)) AS BIGINT) AS sx,
       CAST(FLOOR(y / CAST(5.0 AS DOUBLE)) AS BIGINT) AS sy,
       CAST(COUNT(*) AS BIGINT) AS xcount
FROM points_events GROUP BY 1, 2
""",
    "points_events",
)


@_register("collect_events", _COLLECT_ORACLE)
def q_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollectEventsProcess: coincident-point merge (snap tolerance 5)."""
    return transforms.collect_events(world.points_events(spark, sf_dir))


_UNION_AREA_ORACLE = world.with_layers(
    """
WITH pix AS (
  SELECT gx, gy, gx * CAST(2.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) AS x,
         gy * CAST(2.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) AS y
  FROM (SELECT CAST(generate_series % 500 AS BIGINT) AS gx,
               CAST(FLOOR(generate_series / 500) AS BIGINT) AS gy
        FROM generate_series(0, 249999))
),
cov AS (
  SELECT DISTINCT p.gx, p.gy FROM pix p JOIN rects_customer r
    ON p.x >= r.cx - r.hw AND p.x <= r.cx + r.hw
   AND p.y >= r.cy - r.hh AND p.y <= r.cy + r.hh
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pixels,
       ROUND(COUNT(*) * CAST(4.0 AS DOUBLE), 6) AS union_area
FROM cov
""",
    "rects_customer",
)


@_register("union_area_raster", _UNION_AREA_ORACLE)
def q_union_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UnionPolygonProcess area via pixel-grid rasterization."""
    return transforms.union_area_raster(
        spark, world.rects_customer(spark, sf_dir), grid=500
    )


# The even-odd ray cast over a rect's 4-corner ring reduces BIT-EXACTLY to
# half-open bbox tests: horizontal edges never satisfy (yi>y)!=(yj>y), and a
# vertical edge's x-intercept is (xj-xi)*t + xi = 0*t + xi = xi exactly in
# IEEE double, so the two flips XOR to x0 <= x < x1 (and y0 <= y < y1 from
# the edge-crossing condition). That closed form IS the ray cast for this
# layer, so the oracle below exercises geomlib.points_in_polygon's real
# semantics — including its exclusive top/right boundary, which differs from
# pip_count_rect's inclusive closed-form join.
_GENERIC_PIP_ORACLE = f"""
{world.oracle_cte('points_events', 'rects_customer')}
, cand AS (
  SELECT p.x, p.y, r.rid,
         r.cx - r.hw AS x0, r.cx + r.hw AS x1,
         r.cy - r.hh AS y0, r.cy + r.hh AS y1
  FROM points_events p
  JOIN rects_customer r
    ON p.x >= r.cx - r.hw AND p.x <= r.cx + r.hw
   AND p.y >= r.cy - r.hh AND p.y <= r.cy + r.hh
)
SELECT rid,
       CAST(SUM(CASE WHEN x >= x0 AND x < x1 AND y >= y0 AND y < y1
                     THEN 1 ELSE 0 END) AS BIGINT) AS cnt
FROM cand
GROUP BY rid
"""


@_register("generic_pip_raycast", _GENERIC_PIP_ORACLE)
def q_generic_pip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic vertex-polygon PIP (numpy ray-cast refine over bbox-candidate
    pairs); oracle = the ray cast's closed form on rect rings (see above)."""
    from . import geomlib

    pts = world.points_events(spark, sf_dir)
    polys = geomlib.rects_to_polygons(world.rects_customer(spark, sf_dir))
    return geomlib.generic_pip_count(pts, polys)


# ---------------------------------------------------------------------------
# Overlay + line operators (overlay.py)
# ---------------------------------------------------------------------------

from . import overlay  # noqa: E402


@_register("intersect_rects", overlay.intersect_rects_oracle())
def q_intersect_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IntersectProcess overlay A∩B on two rect layers (cell-ownership dedup)."""
    return overlay.intersect_rects(
        world.rects_customer(spark, sf_dir),
        world.load_layer(spark, sf_dir, "rects_orders"),
    )


@_register("sum_line_length", overlay.sum_line_length_oracle())
def q_sum_line_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SumLineLengthProcess: clipped segment length per polygon (Liang-Barsky)."""
    return overlay.sum_line_length(
        world.load_layer(spark, sf_dir, "lines_orders"),
        world.rects_customer(spark, sf_dir),
    )


@_register("line_intersections", overlay.line_intersections_oracle())
def q_line_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IntersectionPointsProcess: crossings of two segment layers."""
    return overlay.line_intersections(
        world.load_layer(spark, sf_dir, "lines_orders"),
        world.load_layer(spark, sf_dir, "lines_part"),
    )


@_register("snap_points_to_lines", overlay.snap_points_oracle(30.0))
def q_snap_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SnapPointsToLinesProcess: nearest segment within tolerance 30."""
    return overlay.snap_points_to_lines(
        world.points_part(spark, sf_dir),
        world.load_layer(spark, sf_dir, "lines_orders"),
        tolerance=30.0,
    )


@_register("points_along_lines", overlay.points_along_lines_oracle(40.0))
def q_points_along_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PointsAlongLinesProcess: stations every 40 units along segments."""
    return overlay.points_along_lines(
        world.load_layer(spark, sf_dir, "lines_orders"), spacing=40.0
    )


# ---------------------------------------------------------------------------
# Classifiers + k-means (classify.py)
# ---------------------------------------------------------------------------

from . import classify  # noqa: E402


@_register("classify_quantile", classify.classify_quantile_oracle(7))
def q_classify_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuantileClassify: 7 equal-count classes of events.val."""
    return classify.classify_quantile(
        world.points_events(spark, sf_dir), n_classes=7
    )


@_register("classify_equal_interval", classify.classify_equal_interval_oracle(8))
def q_classify_equal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EqualIntervalClassify: 8 fixed-width classes of events.w."""
    return classify.classify_equal_interval(
        world.points_events(spark, sf_dir), n_classes=8
    )


@_register("classify_std_dev", classify.classify_std_dev_oracle())
def q_classify_std_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardDeviationClassify: 5 classes at mean±{0.5,1.5}σ."""
    return classify.classify_std_dev(world.points_events(spark, sf_dir))


@_register("kmeans_xy", classify.kmeans_oracle())
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeansClusteringProcess: deterministic Lloyd (k=4, 3 iterations)."""
    return classify.kmeans_xy(world.points_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Additional global autocorrelation statistics
# ---------------------------------------------------------------------------


def _geary_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM moments CROSS JOIN pagg", autocorr.GEARY_STAGES
    )
    return world.with_layers(
        f"""
WITH {_AC_PTS_CTE},
{_AC_PAIRS_CTE},
nself AS (SELECT * FROM pairs WHERE pid_l <> pid_r),
{_AC_MOMENTS_CTE},
pagg AS (SELECT COUNT(*) AS n_pairs,
         CAST(SUM((vi - vj) * (vi - vj)) AS BIGINT) AS diff2,
         (SELECT CAST(SUM(deg * deg) AS BIGINT) FROM
          (SELECT pid_l, COUNT(*) AS deg FROM nself GROUP BY pid_l))
           AS sumdeg2
         FROM nself)
SELECT ROUND(geary_c, 6) AS geary_c, ROUND(c_var, 6) AS c_var,
       ROUND(geary_z, 6) AS geary_z, ROUND(geary_p, 6) AS geary_p
FROM {nested}
""",
        "points_events",
    )


@_register("global_gearys_c", _geary_oracle())
def q_global_geary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalGearysCProcess: binary band weights, band=10."""
    return autocorr.global_gearys_c(_ac_points(spark, sf_dir), _AC_BAND)


def _general_g_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM moments CROSS JOIN pagg", autocorr.GENERAL_G_STAGES
    )
    return world.with_layers(
        f"""
WITH {_AC_PTS_CTE},
{_AC_PAIRS_CTE},
nself AS (SELECT * FROM pairs WHERE pid_l <> pid_r),
{_AC_MOMENTS_CTE},
pagg AS (SELECT COUNT(*) AS n_pairs,
         CAST(SUM(vi * vj) AS BIGINT) AS p11,
         (SELECT CAST(SUM(deg * deg) AS BIGINT) FROM
          (SELECT pid_l, COUNT(*) AS deg FROM nself GROUP BY pid_l))
           AS sumdeg2
         FROM nself)
SELECT ROUND(g_obs * 1000000.0, 6) AS g_obs_e6,
       ROUND(g_exp * 1000000.0, 6) AS g_exp_e6,
       ROUND(g_z, 6) AS g_z, ROUND(g_p, 6) AS g_p
FROM {nested}
""",
        "points_events",
    )


@_register("global_general_g", _general_g_oracle())
def q_global_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalGStatisticsProcess (Getis-Ord General G), band=10."""
    return autocorr.global_g(_ac_points(spark, sf_dir), _AC_BAND)


def _join_count_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM pagg", autocorr.JOIN_COUNT_STAGES
    )
    return world.with_layers(
        f"""
WITH bpts AS (SELECT pid, x, y, CAST((w % 97) % 2 AS BIGINT) AS b
              FROM points_events),
ist AS (SELECT l.pid, l.b, COUNT(*) AS cnt, CAST(SUM(r.b) AS BIGINT) AS sum_v
        FROM bpts l JOIN bpts r
          ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 100.0
        GROUP BY l.pid, l.b),
pagg AS (SELECT COUNT(*) AS n, CAST(SUM(b) AS BIGINT) AS nb,
         CAST(CAST(SUM(cnt - 1) AS BIGINT) / 2 AS BIGINT) AS jj,
         CAST(CAST(SUM((cnt - 1) * (cnt - 2)) AS BIGINT) / 2 AS BIGINT) AS kk,
         CAST(SUM(b * (sum_v - b)) AS BIGINT) AS bb2,
         CAST(SUM((1 - b) * ((cnt - 1) - (sum_v - b))) AS BIGINT) AS ww2,
         CAST(SUM(b * ((cnt - 1) - (sum_v - b))
              + (1 - b) * (sum_v - b)) AS BIGINT) AS bw2
         FROM ist)
SELECT ROUND(bb_obs, 1) AS bb_obs, ROUND(ww_obs, 1) AS ww_obs,
       ROUND(bw_obs, 1) AS bw_obs, ROUND(bb_exp, 6) AS bb_exp,
       ROUND(ww_exp, 6) AS ww_exp, ROUND(bw_exp, 6) AS bw_exp,
       ROUND(bb_z, 6) AS bb_z, ROUND(bb_p, 6) AS bb_p
FROM {nested}
""",
        "points_events",
    )


@_register("join_count_stats", _join_count_oracle())
def q_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JoinCountStatisticsProcess: BB/WW/BW join counts, band=10."""
    return autocorr.join_count_stats(_ac_points(spark, sf_dir), _AC_BAND)


# ---------------------------------------------------------------------------
# Raster map algebra / focal / sampling + extra grid generators
# ---------------------------------------------------------------------------


@_register("raster_clip_extent", raster.raster_clip_extent_oracle())
def q_raster_clip_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterClipOperation: crop the value raster to an extent (center-in
    semantics; pure filter — tile-partition pruning at scale)."""
    return raster.raster_clip_extent(spark)


@_register("raster_reclass", raster.raster_reclass_oracle())
def q_raster_reclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterReclassProcess: 5-class range remap of the value raster."""
    return raster.raster_reclass(spark)


@_register("raster_ndvi", raster.raster_ndvi_oracle())
def q_raster_ndvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterNDVIProcess: (nir-red)/(nir+red) per pixel, block means."""
    return raster.raster_ndvi(spark)


@_register("focal_slope", raster.focal_slope_oracle())
def q_focal_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterSlopeProcess: Horn 3x3 stencil via halo-exchange shuffle."""
    return raster.focal_slope(spark)


@_register("extract_values_points", raster.extract_values_oracle())
def q_extract_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractValuesToPointsProcess: sample the raster at part points."""
    return raster.extract_values_to_points(
        spark, world.points_part(spark, sf_dir)
    )


@_register("raster_histogram", raster.raster_histogram_oracle())
def q_raster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HistogramGridCoverageProcess: 50-wide value-bucket frequencies."""
    return raster.raster_histogram(spark)


@_register(
    "triangular_grid_40",
    binning.triangular_grid_oracle(binning.WORLD_BBOX, 40.0),
)
def q_triangular_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TriangularGridProcess: up/down triangles on a 40-unit lattice."""
    return binning.triangular_grid(spark, binning.WORLD_BBOX, 40.0)


@_register(
    "circular_grid_25", binning.circular_grid_oracle(binning.WORLD_BBOX, 25.0)
)
def q_circular_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CircularGridProcess: circle cells on a 2r lattice."""
    return binning.circular_grid(spark, binning.WORLD_BBOX, 25.0)


# ---------------------------------------------------------------------------
# Regression (relationship.py)
# ---------------------------------------------------------------------------

from . import relationship  # noqa: E402


@_register("ols_lineitem", relationship.ols_oracle())
def q_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLSProcess: extendedprice ~ quantity over lineitem, exact moments."""
    return relationship.ols_simple(spark, sf_dir)


# ---------------------------------------------------------------------------
# Density / allocation / profile / generators
# ---------------------------------------------------------------------------

# Discrete Voronoi (ThiessenPolygonOperation.java:79 in raster form): every
# grid cell of a 10-unit lattice is allocated to its nearest part-point
# (EuclideanDistance/Allocation semantics, RasterEuclideanDistanceOperation
# .java:58). Distributed: nearest_join of the generated lattice against the
# seed layer; per-seed aggregation = cell count + exact scaled distance sum.
_VOR_GRID_SPARK = (
    "SELECT id AS gid, CAST(id % 100 AS DOUBLE) * 10.0 + 5.0 AS gx, "
    "CAST(CAST(id / 100 AS BIGINT) AS DOUBLE) * 10.0 + 5.0 AS gy "
    "FROM RANGE(10000)"
)
_VOR_GRID_DUCK = (
    "SELECT uid AS gid, CAST(uid % 100 AS DOUBLE) * 10.0 + 5.0 AS gx, "
    "CAST(CAST(FLOOR(uid / 100) AS BIGINT) AS DOUBLE) * 10.0 + 5.0 AS gy "
    "FROM (SELECT generate_series AS uid FROM generate_series(0, 9999))"
)

_VORONOI_ORACLE = world.with_layers(
    f"""
WITH grid AS ({_VOR_GRID_DUCK}),
alloc AS (
  SELECT gid, pid_r, d2 FROM (
    SELECT g.gid AS gid, p.pid AS pid_r,
           (g.gx - p.x) * (g.gx - p.x) + (g.gy - p.y) * (g.gy - p.y) AS d2,
           ROW_NUMBER() OVER (PARTITION BY g.gid ORDER BY
             (g.gx - p.x) * (g.gx - p.x) + (g.gy - p.y) * (g.gy - p.y) ASC,
             p.pid ASC) AS rn
    FROM grid g JOIN points_part p
      ON (g.gx - p.x) * (g.gx - p.x) + (g.gy - p.y) * (g.gy - p.y)
         <= 40000.0
  ) WHERE rn = 1
)
SELECT pid_r AS seed, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CAST(FLOOR(SQRT(d2) * 1000.0) AS BIGINT)) AS BIGINT)
         AS dist_sum_u
FROM alloc GROUP BY pid_r
""",
    "points_part",
)


@_register("discrete_voronoi", _VORONOI_ORACLE)
def q_discrete_voronoi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ThiessenPolygonProcess + EuclideanDistanceProcess in raster form:
    allocate each lattice cell to its nearest seed, radius cap 200."""
    world.register_tables(spark, sf_dir)
    grid = spark.sql(_VOR_GRID_SPARK)
    seeds = world.points_part(spark, sf_dir)
    # single-phase (first_radius=0): the seed layer is tiny relative to the
    # lattice, so the adaptive two-phase's extra jobs cost more than the
    # full-radius candidate set (~25 seeds per cell at gate density).
    alloc = joins.nearest_join(
        grid, seeds, radius=200.0, first_radius=0.0,
        left_cols=("gid", "gx", "gy"),
    )
    return alloc.groupBy(F.col("pid_r").alias("seed")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.expr("CAST(FLOOR(SQRT(d2) * 1000.0) AS BIGINT)"))
        .cast("long").alias("dist_sum_u"),
    )


# Point density surface (RasterPointDensityOperation.java:48): per lattice
# cell, count + weight-sum of events within radius 20 of the cell center —
# the aggregating band join re-used with a generated left side.
_PD_ORACLE = world.with_layers(
    f"""
WITH grid AS ({_VOR_GRID_DUCK})
SELECT g.gid AS gid, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(p.w) AS BIGINT) AS sum_w
FROM grid g JOIN points_events p
  ON (g.gx - p.x) * (g.gx - p.x) + (g.gy - p.y) * (g.gy - p.y) <= 400.0
GROUP BY g.gid
""",
    "points_events",
)


@_register("point_density_grid", _PD_ORACLE)
def q_point_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PointDensityProcess: per-cell neighborhood count/weight within r=20."""
    world.register_tables(spark, sf_dir)
    grid = spark.sql(_VOR_GRID_SPARK)
    ev = world.points_events(spark, sf_dir)
    st = joins.band_stats_join(
        grid, ev, radius=20.0, value_col="w",
        left_cols=("gid", "gx", "gy"),
    )
    return st.select(
        F.col("pid_l").alias("gid"), "cnt",
        F.col("sum_v").alias("sum_w"),
    )


# Raster profile (RasterProfileProcess): sample the value raster every 5
# units along each segment; per segment count/sum/max of sampled values.
_PROFILE_ORACLE = world.with_layers(
    f"""
WITH pix AS ({'SELECT CAST(uid % 500 AS BIGINT) AS ix, CAST(FLOOR(uid / 500) AS BIGINT) AS iy, ((uid % 500) * 7919 + CAST(FLOOR(uid / 500) AS BIGINT) * 104729) % 1000 AS v FROM (SELECT generate_series AS uid FROM generate_series(0, 249999))'}),
st AS (
  SELECT lid,
         CAST(FLOOR((x1 + (k * 5.0 / seg_len) * (x2 - x1)) / 2.0) AS BIGINT)
           AS ix,
         CAST(FLOOR((y1 + (k * 5.0 / seg_len) * (y2 - y1)) / 2.0) AS BIGINT)
           AS iy
  FROM (
    SELECT lid, x1, y1, x2, y2,
           SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS seg_len
    FROM lines_orders
  ), LATERAL UNNEST(generate_series(0,
       CAST(FLOOR(seg_len / 5.0) AS INT))) AS u(k)
)
SELECT st.lid AS lid, CAST(COUNT(*) AS BIGINT) AS n_samp,
       CAST(SUM(p.v) AS BIGINT) AS sum_v, CAST(MAX(p.v) AS BIGINT) AS max_v
FROM st JOIN pix p ON st.ix = p.ix AND st.iy = p.iy
GROUP BY st.lid
""",
    "lines_orders",
)


@_register("raster_profile", _PROFILE_ORACLE)
def q_raster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterProfileProcess: stations every 5 units -> pixel sample join."""
    world.register_tables(spark, sf_dir)
    # stations are derived directly from exact segment math rather than the
    # points_along_lines operator: its output rounds coordinates to 1e-6,
    # which would shift FLOOR at pixel edges relative to the oracle.
    segs = world.load_layer(spark, sf_dir, "lines_orders").selectExpr(
        "lid", "x1", "y1", "x2", "y2",
        "SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS seg_len",
    )
    segs = segs.withColumn(
        "k", F.expr("explode(sequence(0, CAST(FLOOR(seg_len / 5.0) AS INT)))")
    )
    samp = segs.selectExpr(
        "lid",
        "CAST(FLOOR((x1 + (k * 5.0 / seg_len) * (x2 - x1)) / 2.0) AS BIGINT)"
        " AS ix",
        "CAST(FLOOR((y1 + (k * 5.0 / seg_len) * (y2 - y1)) / 2.0) AS BIGINT)"
        " AS iy",
    )
    pixels = spark.sql(raster.ZONAL_PIXELS_SQL_SPARK).select("ix", "iy", "v")
    return (
        samp.join(pixels, on=["ix", "iy"], how="inner")
        .groupBy("lid")
        .agg(
            F.count(F.lit(1)).alias("n_samp"),
            F.sum("v").cast("long").alias("sum_v"),
            F.max("v").cast("long").alias("max_v"),
        )
    )


# Seeded synthetic point generation (RandomPointsOperation.java:49):
# deterministic scramble over spark.range — the distributed analogue of the
# reference's seeded RNG; identical closed form in DuckDB.
_RANDOM_N = 5000
_RANDOM_ORACLE = f"""
SELECT uid,
       ROUND(CAST((uid * 48271 + ((uid * uid) % 999979) * 7129) % 1000000
             AS DOUBLE) / 1000.0, 6) AS rx,
       ROUND(CAST(((uid + 13) * 69621 + (((uid + 5) * (uid + 5)) % 999961)
             * 3517) % 1000000 AS DOUBLE) / 1000.0, 6) AS ry
FROM (SELECT generate_series AS uid FROM generate_series(0, {_RANDOM_N - 1}))
"""


@_register("random_points", _RANDOM_ORACLE)
def q_random_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RandomPointsProcess: seeded deterministic uniform points."""
    df = spark.range(_RANDOM_N).withColumnRenamed("id", "uid")
    return df.selectExpr(
        "uid",
        "ROUND(CAST((uid * 48271 + ((uid * uid) % 999979) * 7129) % 1000000 "
        "AS DOUBLE) / 1000.0, 6) AS rx",
        "ROUND(CAST(((uid + 13) * 69621 + (((uid + 5) * (uid + 5)) % 999961) "
        "* 3517) % 1000000 AS DOUBLE) / 1000.0, 6) AS ry",
    )


# Multiple ring buffers (MultipleBufferFeatureCollection.java:53): three
# concentric distances per point; ring area = pi*(r_o^2 - r_i^2) (donut,
# outsideOnly=true). Explode of the distance list, narrow.
_RING_ORACLE = world.with_layers(
    f"""
SELECT pid, CAST(ring AS INT) AS ring,
       CAST(ring AS DOUBLE) * 5.0 AS r_outer,
       ROUND({world.dlit(3.141592653589793)}
             * ((ring * 5.0) * (ring * 5.0)
                - ((ring - 1) * 5.0) * ((ring - 1) * 5.0)), 6) AS ring_area
FROM points_part, LATERAL UNNEST(generate_series(1, 3)) AS u(ring)
""",
    "points_part",
)


@_register("ring_buffers", _RING_ORACLE)
def q_ring_buffers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultipleRingBufferProcess: 3 concentric donut rings per point."""
    pts = world.points_part(spark, sf_dir)
    df = pts.withColumn("ring", F.expr("explode(sequence(1, 3))"))
    return df.selectExpr(
        "pid", "CAST(ring AS INT) AS ring",
        "CAST(ring AS DOUBLE) * 5.0 AS r_outer",
        f"ROUND({world.dlit(3.141592653589793)} * ((ring * 5.0) * (ring * 5.0)"
        " - ((ring - 1) * 5.0) * ((ring - 1) * 5.0)), 6) AS ring_area",
    )


# ---------------------------------------------------------------------------
# Local Geary / Focal LQ / Lee's L / scan-circle clustering
# ---------------------------------------------------------------------------


def _local_geary_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM per_i CROSS JOIN moments", autocorr.LOCAL_GEARY_STAGES
    )
    return world.with_layers(
        f"""
WITH {_AC_PTS_CTE},
{_AC_PAIRS_CTE},
{_AC_MOMENTS_CTE},
per_i AS (SELECT pid_l, vi AS v, COUNT(*) AS cnt,
          CAST(SUM(vj) AS BIGINT) AS sum_v,
          CAST(SUM(vj * vj) AS BIGINT) AS sum_sq
          FROM pairs GROUP BY pid_l, vi HAVING COUNT(*) >= 2)
SELECT pid_l AS pid, ROUND(lgc_index, 6) AS lgc_index,
       ROUND(lgc_z, 6) AS lgc_z, ROUND(lgc_p, 6) AS lgc_p
FROM {nested}
""",
        "points_events",
    )


@_register("local_gearys_c", _local_geary_oracle())
def q_local_geary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalGearysCProcess (Anselin local Geary; documented normal approx)."""
    return autocorr.local_gearys_c(_ac_points(spark, sf_dir), _AC_BAND)


_FOCAL_LQ_ORACLE = world.with_layers(
    f"""
WITH pts AS (SELECT pid, x, y, w % 97 AS v, w FROM points_events),
ist AS (SELECT l.pid AS pid_l, COUNT(*) AS cnt,
        CAST(SUM(r.v) AS BIGINT) AS sum_v,
        CAST(SUM(r.w) AS BIGINT) AS sum_v2
        FROM pts l JOIN pts r
          ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 100.0
        GROUP BY l.pid),
tot AS (SELECT CAST(SUM(v) AS BIGINT) AS tx, CAST(SUM(w) AS BIGINT) AS ty
        FROM pts)
SELECT pid_l AS pid,
       ROUND((CAST(sum_v AS DOUBLE) / CAST(sum_v2 AS DOUBLE))
             / (CAST(tx AS DOUBLE) / CAST(ty AS DOUBLE)), 6) AS flq
FROM ist CROSS JOIN tot WHERE sum_v2 > 0
""",
    "points_events",
)


@_register("focal_lq", _FOCAL_LQ_ORACLE)
def q_focal_lq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FocalLQProcess: neighborhood location quotient of v=w%97 vs w."""
    return autocorr.focal_lq(_ac_points(spark, sf_dir), _AC_BAND, x="v", y="w")


def _lees_l_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM mom CROSS JOIN pagg", autocorr.LEES_L_STAGES
    )
    return world.with_layers(
        f"""
WITH pts AS (SELECT pid, x, y, w % 97 AS v, w FROM points_events),
ist AS (SELECT l.pid AS pid_l, COUNT(*) AS cnt,
        CAST(SUM(r.v) AS BIGINT) AS sum_v,
        CAST(SUM(r.w) AS BIGINT) AS sum_v2
        FROM pts l JOIN pts r
          ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 100.0
        GROUP BY l.pid),
pagg AS (SELECT CAST(SUM(sum_v * sum_v2) AS BIGINT) AS p_xy,
         CAST(SUM(cnt * sum_v) AS BIGINT) AS p_dx,
         CAST(SUM(cnt * sum_v2) AS BIGINT) AS p_dy,
         CAST(SUM(cnt * cnt) AS BIGINT) AS sumdeg2 FROM ist),
mom AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sx,
        CAST(SUM(w) AS BIGINT) AS sy, CAST(SUM(v * v) AS BIGINT) AS sxx,
        CAST(SUM(w * w) AS BIGINT) AS syy FROM pts)
SELECT ROUND(lees_l, 6) AS lees_l FROM {nested}
""",
        "points_events",
    )


@_register("global_lees_l", _lees_l_oracle())
def q_lees_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalLeesLProcess: bivariate spatial association of v=w%97 and w."""
    return autocorr.global_lees_l(
        _ac_points(spark, sf_dir), _AC_BAND, x="v", y="w"
    )


_SCAN_ORACLE = world.with_layers(
    f"""
WITH grid AS (
  SELECT uid AS gid, CAST(uid % 50 AS DOUBLE) * 20.0 + 10.0 AS gx,
         CAST(CAST(FLOOR(uid / 50) AS BIGINT) AS DOUBLE) * 20.0 + 10.0 AS gy
  FROM (SELECT generate_series AS uid FROM generate_series(0, 2499))
),
ist AS (SELECT g.gid AS gid, CAST(SUM(p.w) AS BIGINT) AS sum_v
        FROM grid g JOIN points_events p
          ON (g.gx - p.x) * (g.gx - p.x) + (g.gy - p.y) * (g.gy - p.y)
             <= 900.0
        GROUP BY g.gid),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM points_events)
SELECT gid, gx, gy, sum_v AS obs_w, ROUND(scan_z, 6) AS scan_z FROM (
  SELECT i.gid AS gid, g.gx AS gx, g.gy AS gy, i.sum_v,
         (CAST(i.sum_v AS DOUBLE)
          - CAST(t.tw AS DOUBLE) * {world.dlit(3.141592653589793 * 900.0 / 1_000_000.0)})
         / SQRT(CAST(t.tw AS DOUBLE)
                * {world.dlit(3.141592653589793 * 900.0 / 1_000_000.0)}) AS scan_z
  FROM ist i JOIN grid g ON i.gid = g.gid CROSS JOIN tot t
) WHERE scan_z > 3.0
""",
    "points_events",
)


@_register("cluster_scan", _SCAN_ORACLE)
def q_cluster_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClusterGAMProcess: overlapping scan circles, Poisson-z significance."""
    return autocorr.cluster_scan(
        world.points_events(spark, sf_dir), radius=30.0, weight="w",
        z_cut=3.0, grid_step=20.0,
    )


@_register("focal_hillshade", raster.focal_hillshade_oracle())
def q_focal_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterHillshadeProcess: trig-free algebraic hillshade, halo shuffle."""
    return raster.focal_hillshade(spark)


@_register("raster_resample_bicubic", raster.raster_resample_bicubic_oracle())
def q_raster_resample_bicubic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys bicubic (a=-0.5) 2x downsample of the 500x500 value raster:
    16 taps with exact x16384 integer weights (u in {1/4, 3/4} on the 2x
    lattice), inner-lattice outputs only — closes ResampleType.BICUBIC
    (GT/enumeration/ResampleType.java:26-43)."""
    return raster.raster_resample_bicubic(spark)


@_register("raster_resample_bilinear", raster.raster_resample_oracle())
def q_raster_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterResampleProcess (BILINEAR): 2x downsample, exact /16 weights."""
    return raster.raster_resample_bilinear(spark)


@_register("raster_cutfill", raster.raster_cutfill_oracle())
def q_raster_cutfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterCutFillProcess: per-block cut/fill volumes of two surfaces."""
    return raster.raster_cutfill(spark)


@_register("image_phash_neardup", raster.phash_neardup_oracle())
def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs via phash Hamming-LSH (exact for hamming<=3)."""
    return raster.phash_neardup(spark, sf_dir)


def _lees_s_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM mom CROSS JOIN pagg", autocorr.LEES_L_STAGES
    )
    return world.with_layers(
        f"""
WITH pts AS (SELECT pid, x, y, w % 97 AS v FROM points_events),
ist AS (SELECT l.pid AS pid_l, COUNT(*) AS cnt,
        CAST(SUM(r.v) AS BIGINT) AS sum_v
        FROM pts l JOIN pts r
          ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 100.0
        GROUP BY l.pid),
pagg AS (SELECT CAST(SUM(sum_v * sum_v) AS BIGINT) AS p_xy,
         CAST(SUM(cnt * sum_v) AS BIGINT) AS p_dx,
         CAST(SUM(cnt * sum_v) AS BIGINT) AS p_dy,
         CAST(SUM(cnt * cnt) AS BIGINT) AS sumdeg2 FROM ist),
mom AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sx,
        CAST(SUM(v) AS BIGINT) AS sy, CAST(SUM(v * v) AS BIGINT) AS sxx,
        CAST(SUM(v * v) AS BIGINT) AS syy FROM pts)
SELECT ROUND(lees_l, 6) AS lees_s FROM {nested}
""",
        "points_events",
    )


@_register("global_lees_s", _lees_s_oracle())
def q_lees_s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalLeesSProcess: univariate Lee's S of v=w%97."""
    return autocorr.global_lees_s(_ac_points(spark, sf_dir), _AC_BAND)


@_register("classify_jenks", classify.jenks_oracle("points_events", 5, "w"))
def q_classify_jenks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaturalBreaksClassify (Jenks): histogram -> bounded re-bin -> driver
    DP -> classify. Full oracle: the same DP unrolled as chained DuckDB
    CTEs with bit-identical float decisions (classify.jenks_oracle)."""
    return classify.classify_jenks(world.points_events(spark, sf_dir), 5)


_ROGERSON_ORACLE = world.with_layers(
    """
WITH pts AS (SELECT pid, x, y, w % 97 + 1 AS case_v, w % 89 + 1 AS pop_v
             FROM points_events),
tot AS (SELECT COUNT(*) AS m, CAST(SUM(case_v) AS BIGINT) AS sum_x,
        CAST(SUM(pop_v) AS BIGINT) AS sum_y FROM pts),
gof AS (SELECT CAST(SUM(CAST(FLOOR(1e12 *
        (CAST(case_v AS DOUBLE) / sum_x - CAST(pop_v AS DOUBLE) / sum_y)
        * (CAST(case_v AS DOUBLE) / sum_x - CAST(pop_v AS DOUBLE) / sum_y)
        / (CAST(pop_v AS DOUBLE) / sum_y)) AS BIGINT)) AS BIGINT) AS gof_u
        FROM pts CROSS JOIN tot),
pr AS (SELECT a.pid AS pid_l, b.pid AS pid_r,
       ROUND(SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6)
         AS dist,
       a.case_v AS xi, a.pop_v AS yi, b.case_v AS xj, b.pop_v AS yj
       FROM pts a JOIN pts b
         ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 625.0
        AND a.pid <> b.pid),
st AS (SELECT pid_l, pid_r,
       CASE WHEN dist <= 1.0 THEN 1.0 ELSE 1.0 / dist END AS aij,
       CAST(xi AS DOUBLE) / sum_x - CAST(yi AS DOUBLE) / sum_y AS ripi,
       CAST(xj AS DOUBLE) / sum_x - CAST(yj AS DOUBLE) / sum_y AS rjpj,
       SQRT((CAST(yi AS DOUBLE) / sum_y) * (CAST(yj AS DOUBLE) / sum_y))
         AS pipj_sqrt
       FROM pr CROSS JOIN tot),
pagg AS (SELECT
  CAST(SUM(CAST(FLOOR(1e12 * (aij / pipj_sqrt) * ripi * rjpj) AS BIGINT))
       AS BIGINT) AS sa_u,
  CAST(SUM(CASE WHEN pid_r < pid_l THEN
       CAST(FLOOR(1e12 * aij * pipj_sqrt) AS BIGINT) ELSE 0 END)
       AS BIGINT) AS aijs_u
  FROM st)
SELECT ROUND((gof_u + sa_u) / 1e12, 6) AS r_obs,
       ROUND(gof_u / 1e12, 6) AS r_gof,
       ROUND(sa_u / 1e12, 6) AS r_sa,
       ROUND((CAST(m AS DOUBLE) - 1.0 - 2.0 * (aijs_u / 1e12))
             / CAST(sum_x AS DOUBLE), 6) AS r_exp
FROM tot CROSS JOIN gof CROSS JOIN pagg
""",
    "points_events",
)


@_register("rogerson_r", _ROGERSON_ORACLE)
def q_rogerson_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalRogersonRProcess: Tango GOF+SA partition, band-truncated
    inverse-distance weights (deviations documented in the docstring)."""
    pts = world.points_events(spark, sf_dir).selectExpr(
        "pid", "x", "y", "w % 97 + 1 AS case_v", "w % 89 + 1 AS pop_v"
    )
    return autocorr.rogerson_r(pts, band=25.0)


_LOCAL_LEES_ORACLE = world.with_layers(
    """
WITH pts AS (SELECT pid, x, y, w % 97 AS v, w FROM points_events),
ist AS (SELECT l.pid AS pid_l, COUNT(*) AS cnt,
        CAST(SUM(r.v) AS BIGINT) AS sum_v,
        CAST(SUM(r.w) AS BIGINT) AS sum_v2
        FROM pts l JOIN pts r
          ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 100.0
        GROUP BY l.pid),
mom AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sx,
        CAST(SUM(w) AS BIGINT) AS sy, CAST(SUM(v * v) AS BIGINT) AS sxx,
        CAST(SUM(w * w) AS BIGINT) AS syy FROM pts)
SELECT pid_l AS pid,
       ROUND(CAST(n AS DOUBLE)
       * (CAST(sum_v AS DOUBLE) - cnt * (CAST(sx AS DOUBLE) / n))
       * (CAST(sum_v2 AS DOUBLE) - cnt * (CAST(sy AS DOUBLE) / n))
       / (SQRT(CAST(sxx AS DOUBLE) - n * (CAST(sx AS DOUBLE) / n)
          * (CAST(sx AS DOUBLE) / n))
          * SQRT(CAST(syy AS DOUBLE) - n * (CAST(sy AS DOUBLE) / n)
          * (CAST(sy AS DOUBLE) / n))), 6) AS lll_index
FROM ist CROSS JOIN mom
""",
    "points_events",
)


@_register("local_lees_l", _LOCAL_LEES_ORACLE)
def q_local_lees_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalLeesLProcess: per-feature bivariate smoothing product."""
    return autocorr.local_lees_l(
        _ac_points(spark, sf_dir), _AC_BAND, x="v", y="w"
    )


@_register("eliminate_slivers", overlay.eliminate_oracle(250.0))
def q_eliminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EliminateProcess: one sliver-merge pass (area < 250 -> largest
    intersecting neighbor; merged envelope per absorber)."""
    return overlay.eliminate_slivers(
        world.rects_customer(spark, sf_dir), min_area=250.0
    )


@_register("eliminate_converged", overlay.eliminate_converged_oracle(250.0, 2))
def q_eliminate_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EliminateProcess convergence loop (EliminateOperation.java:82): full
    sliver-merge passes chained until no absorbable sliver remains (2 fixed
    passes here — the synthetic layer converges in one, and beyond
    convergence a pass is the identity — so the DuckDB oracle is the same
    2 passes unrolled as CTE chains; the true fixpoint loop is
    overlay.eliminate_converged, pytest-verified)."""
    return overlay.eliminate_fixed(
        world.rects_customer(spark, sf_dir), min_area=250.0, n_pass=2
    )


@_register("wind_rose_8", overlay.wind_rose_oracle())
def q_wind_rose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WindRoseMapProcess: 8-sector direction histogram, trig-free."""
    return overlay.wind_rose(world.load_layer(spark, sf_dir, "lines_orders"))


# ---------------------------------------------------------------------------
# Geodesic (lat/lon) variants — geo.py; the geographic-CRS behavior of the
# reference (GeodeticBuilder in GT/operations/SpatialJoinOperation.java:
# 97-118), over the world's lon/lat reading with engine-portable
# polynomial trig (see geo.py module docstring).
# ---------------------------------------------------------------------------

from . import geo  # noqa: E402


@_register(
    "neighbor_count_haversine",
    geo.neighbor_count_oracle("points_events", "points_part", 300.0),
)
def q_neighbor_count_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic NearestNeighborCount: per event point, part points within
    300 great-circle km (degree-cell prefilter + exact haversine refine)."""
    l = geo.load_geo_layer(spark, sf_dir, "points_events")
    r = geo.load_geo_layer(spark, sf_dir, "points_part")
    return geo.haversine_neighbor_count(l, r, 300.0)


@_register(
    "nearest_join_haversine",
    geo.nearest_join_oracle("points_events", "points_part", 300.0),
)
def q_nearest_join_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic nearest-feature join within a 300 km great-circle cap."""
    l = geo.load_geo_layer(spark, sf_dir, "points_events")
    r = geo.load_geo_layer(spark, sf_dir, "points_part")
    return geo.haversine_nearest_join(l, r, 300.0)


@_register(
    "geodesic_buffer_points", geo.geodesic_buffer_oracle("points_part", 100.0)
)
def q_geodesic_buffer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic buffer rings (16-gon small circles, first-order direct
    solution) around the part points at 100 km."""
    return geo.geodesic_buffer(
        geo.load_geo_layer(spark, sf_dir, "points_part"), 100.0
    )


# ---------------------------------------------------------------------------
# General CRS reprojection: geographic WGS84 <-> UTM (reproject.py; parity
# target GT/transformation/ReprojectFeatureCollection.java:51). The gate
# queries run the SAME SQL text on both engines (engine-portable series).
# ---------------------------------------------------------------------------

from . import reproject  # noqa: E402


@_register(
    "utm_forward_points",
    reproject.utm_forward_sql(world.LAYER_SQL["points_part"]),
)
def q_utm_forward_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every part point (lon/lat reading) into its own UTM zone —
    ellipsoidal transverse Mercator, mm-rounded easting/northing. Pure
    per-row projection: no shuffle, whole-stage codegen."""
    world.register_tables(spark, sf_dir)
    return spark.sql(reproject.utm_forward_sql(world.LAYER_SQL["points_part"]))


@_register(
    "utm_roundtrip_points",
    reproject.utm_roundtrip_sql(world.LAYER_SQL["points_part"]),
)
def q_utm_roundtrip_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward UTM projection then the inverse: the round-trip contract —
    rt_ok is a |recovered - source| < 1e-7 deg (~1.1 cm) threshold check
    (10x the worst series error, so it cannot flip on a rounding boundary);
    pytest asserts every rt_ok, the gate asserts Spark==DuckDB on the whole
    frame."""
    world.register_tables(spark, sf_dir)
    return spark.sql(
        reproject.utm_roundtrip_sql(world.LAYER_SQL["points_part"])
    )


@_register(
    "albers_roundtrip_points",
    reproject.aea_roundtrip_sql(world.LAYER_SQL["points_part"]),
)
def q_albers_roundtrip_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Albers equal-area conic (spherical CONUS 5070 graticule) forward +
    inverse per point: metre-banded easting/northing + 1e-9-deg round-trip
    booleans; cone constants are Python literals, data-dependent trig is
    native (the Mercator banding rationale). Equal-area Jacobian pinned in
    tests/test_reproject.py."""
    world.register_tables(spark, sf_dir)
    return spark.sql(
        reproject.aea_roundtrip_sql(world.LAYER_SQL["points_part"])
    )


@_register(
    "lcc_roundtrip_points",
    reproject.lcc_roundtrip_sql(world.LAYER_SQL["points_part"]),
)
def q_lcc_roundtrip_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambert conformal conic (spherical CONUS 102004 graticule, Snyder
    §15) forward + inverse per point: metre-banded easting/northing +
    1e-9-deg round-trip booleans — the same banding/threshold contract as
    the Albers gate. Conformality pinned in tests/test_reproject.py."""
    world.register_tables(spark, sf_dir)
    return spark.sql(
        reproject.lcc_roundtrip_sql(world.LAYER_SQL["points_part"])
    )


@_register(
    "utm_to_lcc_points",
    reproject.utm_to_lcc_sql(world.LAYER_SQL["points_part"]),
)
def q_utm_to_lcc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-FAMILY reprojection: per-point UTM zone forward (ellipsoidal
    TM) -> TM inverse -> LCC forward — the registry's compose-through-
    WGS84 path as one shared SQL text; rt_ok bounds the geographic
    mid-stage at the UTM series tolerance (1e-7 deg)."""
    world.register_tables(spark, sf_dir)
    return spark.sql(
        reproject.utm_to_lcc_sql(world.LAYER_SQL["points_part"])
    )


@_register(
    "merc_roundtrip_points",
    reproject.merc_roundtrip_sql(world.LAYER_SQL["points_part"]),
)
def q_merc_roundtrip_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web Mercator (EPSG:3857) forward + inverse over the part points:
    mm-quantized x (exact multiplication parity), km-band y (absorbs
    sub-ulp libm LN differences), rt_ok round-trip threshold. The other
    half of the practical CRS pair set beside UTM."""
    world.register_tables(spark, sf_dir)
    return spark.sql(
        reproject.merc_roundtrip_sql(world.LAYER_SQL["points_part"])
    )


# ---------------------------------------------------------------------------
# Cartographic derivations: OD flow map + polar grid
# ---------------------------------------------------------------------------

_FLOW_ORACLE = world.with_layers(
    """
WITH flows AS (
  SELECT o.o_custkey AS ckey, l.l_suppkey AS skey,
         CAST(SUM(l.l_quantity) AS BIGINT) AS flow_qty,
         COUNT(*) AS n_items
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey, l.l_suppkey
)
SELECT f.ckey AS ckey, f.skey AS skey, f.flow_qty AS flow_qty,
       CAST(f.n_items AS BIGINT) AS n_items,
       ROUND(c.cx, 6) AS x1, ROUND(c.cy, 6) AS y1,
       ROUND(h.cx, 6) AS x2, ROUND(h.cy, 6) AS y2
FROM flows f
JOIN rects_customer c ON f.ckey = c.rid
JOIN hex_supplier h ON f.skey = h.hid
WHERE f.flow_qty >= 100
""",
    "rects_customer", "hex_supplier",
)


@_register("flow_map_od", _FLOW_ORACLE)
def q_flow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlowMapProcess: origin-destination flows (customer rect center ->
    supplier hex center) weighted by lineitem quantity — the one query
    exercising real TPC-H relational joins + spatial construction."""
    world.register_layers(spark, sf_dir)
    return spark.sql(
        """
WITH flows AS (
  SELECT o.o_custkey AS ckey, l.l_suppkey AS skey,
         CAST(SUM(l.l_quantity) AS BIGINT) AS flow_qty,
         COUNT(*) AS n_items
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey, l.l_suppkey
)
SELECT f.ckey AS ckey, f.skey AS skey, f.flow_qty AS flow_qty,
       CAST(f.n_items AS BIGINT) AS n_items,
       ROUND(c.cx, 6) AS x1, ROUND(c.cy, 6) AS y1,
       ROUND(h.cx, 6) AS x2, ROUND(h.cy, 6) AS y2
FROM flows f
JOIN rects_customer c ON f.ckey = c.rid
JOIN hex_supplier h ON f.skey = h.hid
WHERE f.flow_qty >= 100
"""
    )


_POLAR_N_RINGS = 5
_POLAR_N_SECTORS = 12
_POLAR_ORACLE = f"""
SELECT uid,
       CAST(uid % {_POLAR_N_SECTORS} AS BIGINT) AS sector,
       CAST(FLOOR(uid / {_POLAR_N_SECTORS}) AS BIGINT) AS ring,
       ROUND(CAST(FLOOR(uid / {_POLAR_N_SECTORS}) AS DOUBLE) * 50.0, 6)
         AS r_in,
       ROUND((CAST(FLOOR(uid / {_POLAR_N_SECTORS}) AS DOUBLE) + 1.0) * 50.0, 6)
         AS r_out,
       ROUND(CAST(uid % {_POLAR_N_SECTORS} AS DOUBLE)
             * (360.0 / {_POLAR_N_SECTORS}), 6) AS a0_deg
FROM (SELECT generate_series AS uid
      FROM generate_series(0, {_POLAR_N_RINGS * _POLAR_N_SECTORS - 1}))
"""


@_register("polar_grid", _POLAR_ORACLE)
def q_polar_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PolarGridsFromFeaturesProcess: ring x sector lattice (closed-form
    parameters; trig-free)."""
    n = _POLAR_N_RINGS * _POLAR_N_SECTORS
    return spark.range(n).selectExpr(
        "id AS uid",
        f"CAST(id % {_POLAR_N_SECTORS} AS BIGINT) AS sector",
        f"CAST(FLOOR(id / {_POLAR_N_SECTORS}) AS BIGINT) AS ring",
        f"ROUND(CAST(FLOOR(id / {_POLAR_N_SECTORS}) AS DOUBLE) * 50.0, 6)"
        " AS r_in",
        f"ROUND((CAST(FLOOR(id / {_POLAR_N_SECTORS}) AS DOUBLE) + 1.0) * 50.0,"
        " 6) AS r_out",
        f"ROUND(CAST(id % {_POLAR_N_SECTORS} AS DOUBLE)"
        f" * (360.0 / {_POLAR_N_SECTORS}), 6) AS a0_deg",
    )


# ---------------------------------------------------------------------------
# Overlay difference family (overlay_diff.py)
# ---------------------------------------------------------------------------

from . import overlay_diff  # noqa: E402


@_register("difference_rects", overlay_diff.difference_oracle())
def q_difference_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DifferenceProcess: A minus union(B) per feature (exact slab-sweep
    union area; empty differences dropped)."""
    return overlay_diff.difference_rects(
        world.rects_customer(spark, sf_dir),
        world.load_layer(spark, sf_dir, "rects_orders"),
    )


@_register("sym_difference_rects", overlay_diff.sym_difference_oracle())
def q_sym_difference_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymDifferenceProcess: Difference(A,B) union Difference(B,A)."""
    return overlay_diff.sym_difference_rects(
        world.rects_customer(spark, sf_dir),
        world.load_layer(spark, sf_dir, "rects_orders"),
    )


@_register("identity_rects", overlay_diff.identity_oracle())
def q_identity_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IdentityProcess: pairwise A∩B pieces + A remainders."""
    return overlay_diff.identity_rects(
        world.rects_customer(spark, sf_dir),
        world.load_layer(spark, sf_dir, "rects_orders"),
    )


@_register("update_rects", overlay_diff.update_oracle())
def q_update_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UpdateProcess: B features + A remainders."""
    return overlay_diff.update_rects(
        world.rects_customer(spark, sf_dir),
        world.load_layer(spark, sf_dir, "rects_orders"),
    )


@_register("clip_with_features", overlay_diff.clip_with_features_oracle())
def q_clip_with_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClipWithFeaturesProcess: A clipped to union(B) (clip area per
    surviving feature)."""
    return overlay_diff.clip_with_features(
        world.rects_customer(spark, sf_dir),
        world.load_layer(spark, sf_dir, "rects_orders"),
    )


# ---------------------------------------------------------------------------
# Weights-matrix conceptualizations (weights.py): InverseDistance, kNN,
# Queen contiguity, Row standardization, adaptive default band
# ---------------------------------------------------------------------------

from . import weights  # noqa: E402


def _idw_moran_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM moments CROSS JOIN pagg CROSS JOIN s1 CROSS JOIN s2x",
        weights.GENERAL_MORAN_STAGES,
    )
    zp = autocorr.zprob_both_sql("z_score")
    return world.with_layers(
        f"""
WITH {_AC_PTS_CTE},
dpairs AS (SELECT a.pid AS pid_l, b.pid AS pid_r, a.v AS vi, b.v AS vj,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
           FROM pts a JOIN pts b
             ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 100.0
            AND a.pid <> b.pid),
wp AS (SELECT *, {weights.IDW_WQ_SQL} AS wq FROM dpairs),
{_AC_MOMENTS_CTE},
pagg AS (SELECT CAST(SUM(wq) AS BIGINT) AS s0q,
         CAST(SUM(wq * vi * vj) AS BIGINT) AS p11q,
         CAST(SUM(wq * vi) AS BIGINT) AS plq,
         CAST(SUM(wq * vj) AS BIGINT) AS prq FROM wp),
s1 AS (SELECT CAST(SUM(4 * wq * wq) AS BIGINT) AS s1q FROM wp),
s2x AS (SELECT CAST(SUM(4 * rq * rq) AS BIGINT) AS s2xq FROM
        (SELECT pid_l, CAST(SUM(wq) AS BIGINT) AS rq FROM wp GROUP BY pid_l))
SELECT ROUND(moran_i, 6) AS moran_i, ROUND(expected_i, 6) AS expected_i,
       ROUND(z_var, 6) AS z_var, ROUND(z_score, 6) AS z_score,
       ROUND({zp}, 6) AS p_value
FROM {nested}
""",
        "points_events",
    )


@_register("global_morans_i_idw", _idw_moran_oracle())
def q_global_moran_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I, InverseDistance conceptualization (clamped 1/d,
    quantized integer weights), band=10."""
    pts = _ac_points(spark, sf_dir)
    return weights.general_moran(weights.idw_band_pairs(pts, _AC_BAND), pts)


def _local_moran_rowstd_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM per_i CROSS JOIN moments",
        weights.LOCAL_MORAN_ROWSTD_STAGES,
    )
    zp = autocorr.zprob_both_sql("lmi_z")
    return world.with_layers(
        f"""
WITH {_AC_PTS_CTE},
{_AC_PAIRS_CTE},
nself AS (SELECT * FROM pairs WHERE pid_l <> pid_r),
{_AC_MOMENTS_CTE},
per_i AS (SELECT pid_l AS pid, vi AS v, COUNT(*) AS deg,
          CAST(SUM(vj) AS BIGINT) AS nbr_sum FROM nself GROUP BY pid_l, vi)
SELECT pid, ROUND(lmi_index, 6) AS lmi_index, ROUND(lmi_z, 6) AS lmi_z,
       ROUND({zp}, 6) AS lmi_p, co_type
FROM {nested}
""",
        "points_events",
    )


@_register("local_morans_i_rowstd", _local_moran_rowstd_oracle())
def q_local_moran_rowstd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISA under Row standardization (the reference's default
    StandardizationMethod), band=10."""
    return weights.local_moran_rowstd(_ac_points(spark, sf_dir), _AC_BAND)


_KNN_G_K = 8
_KNN_G_RADIUS = 50.0


def _local_g_knn_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM per_i CROSS JOIN moments", autocorr.LOCAL_G_STAGES
    )
    r2 = world.dlit(_KNN_G_RADIUS * _KNN_G_RADIUS)
    return world.with_layers(
        f"""
WITH {_AC_PTS_CTE},
ranked AS (
  SELECT * FROM (
    SELECT a.pid AS pid_l, a.v AS vi, b.pid AS pid_r, b.v AS vj,
           ROW_NUMBER() OVER (PARTITION BY a.pid
             ORDER BY (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) ASC,
                      b.pid ASC) AS rn
    FROM pts a JOIN pts b
      ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {r2}
     AND a.pid <> b.pid
  ) WHERE rn <= {_KNN_G_K}
),
{_AC_MOMENTS_CTE},
per_i AS (SELECT pid_l AS pid, vi AS v,
          CAST(COUNT(*) + 1 AS BIGINT) AS deg_s,
          CAST(SUM(vj) + vi AS BIGINT) AS loc_sum
          FROM ranked GROUP BY pid_l, vi)
SELECT pid, ROUND(gi_z, 6) AS gi_z, ROUND(gi_p, 6) AS gi_p,
       ROUND(gi_mean, 6) AS gi_mean, ROUND(gi_var, 6) AS gi_var
FROM {nested}
""",
        "points_events",
    )


@_register("local_g_knn8", _local_g_knn_oracle())
def q_local_g_knn8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gi* under the kNN (k=8) conceptualization, selfNeighbors=true."""
    return weights.local_g_knn(
        _ac_points(spark, sf_dir), k=_KNN_G_K, radius=_KNN_G_RADIUS
    )


_QUEEN_V_SQL = "CAST(FLOOR(ABS(bal) * 100.0) AS BIGINT) % 97"


def _queen_moran_oracle() -> str:
    from .overlay_diff import mm_sql

    nested = binning.stages_to_subquery(
        "SELECT * FROM moments CROSS JOIN pagg CROSS JOIN s1 CROSS JOIN s2x",
        weights.GENERAL_MORAN_STAGES,
    )
    zp = autocorr.zprob_both_sql("z_score")
    return world.with_layers(
        f"""
WITH rm AS (SELECT rid, {_QUEEN_V_SQL} AS v,
            {mm_sql('cx - hw')} AS x0, {mm_sql('cx + hw')} AS x1,
            {mm_sql('cy - hh')} AS y0, {mm_sql('cy + hh')} AS y1
            FROM rects_customer),
wp AS (SELECT a.rid AS pid_l, b.rid AS pid_r, a.v AS vi, b.v AS vj,
       CAST({weights.Q} AS BIGINT) AS wq
       FROM rm a JOIN rm b
         ON a.x0 <= b.x1 AND b.x0 <= a.x1 AND a.y0 <= b.y1 AND b.y0 <= a.y1
        AND a.rid <> b.rid),
moments AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
            CAST(SUM(v * v) AS BIGINT) AS s2,
            CAST(SUM(v * v * v) AS BIGINT) AS s3,
            CAST(SUM(v * v * v * v) AS BIGINT) AS s4 FROM rm),
pagg AS (SELECT CAST(SUM(wq) AS BIGINT) AS s0q,
         CAST(SUM(wq * vi * vj) AS BIGINT) AS p11q,
         CAST(SUM(wq * vi) AS BIGINT) AS plq,
         CAST(SUM(wq * vj) AS BIGINT) AS prq FROM wp),
s1 AS (SELECT CAST(SUM(4 * wq * wq) AS BIGINT) AS s1q FROM wp),
s2x AS (SELECT CAST(SUM(4 * rq * rq) AS BIGINT) AS s2xq FROM
        (SELECT pid_l, CAST(SUM(wq) AS BIGINT) AS rq FROM wp GROUP BY pid_l))
SELECT ROUND(moran_i, 6) AS moran_i, ROUND(expected_i, 6) AS expected_i,
       ROUND(z_var, 6) AS z_var, ROUND(z_score, 6) AS z_score,
       ROUND({zp}, 6) AS p_value
FROM {nested}
""",
        "rects_customer",
    )


@_register("global_morans_i_queen", _queen_moran_oracle())
def q_global_moran_queen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I under Queen contiguity (EdgesNodes) on the rect
    layer, analysis field from acctbal."""
    rects = world.rects_customer(spark, sf_dir)
    pairs = weights.queen_pairs(rects, _QUEEN_V_SQL)
    pts = rects.select("rid", F.expr(_QUEEN_V_SQL).alias("v"))
    return weights.general_moran(pairs, pts)


def _adaptive_moran_oracle() -> str:
    nested = binning.stages_to_subquery(
        "SELECT * FROM moments CROSS JOIN pagg CROSS JOIN degs",
        autocorr.GLOBAL_MORAN_STAGES,
    )
    return world.with_layers(
        f"""
WITH pts AS (SELECT pid, x, y, CAST(FLOOR(val) AS BIGINT) % 97 AS v
             FROM points_part),
nnd AS (SELECT a.pid, MIN((a.x - b.x) * (a.x - b.x)
                        + (a.y - b.y) * (a.y - b.y)) AS d2
        FROM pts a JOIN pts b ON a.pid <> b.pid GROUP BY a.pid),
band AS (SELECT (SQRT(MAX(d2)) * 1.0001) * (SQRT(MAX(d2)) * 1.0001) AS b2
         FROM nnd),
nself AS (SELECT a.pid AS pid_l, b.pid AS pid_r, a.v AS vi, b.v AS vj
          FROM pts a JOIN pts b ON a.pid <> b.pid
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= (SELECT b2 FROM band)),
moments AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
            CAST(SUM(v * v) AS BIGINT) AS s2,
            CAST(SUM(v * v * v) AS BIGINT) AS s3,
            CAST(SUM(v * v * v * v) AS BIGINT) AS s4 FROM pts),
pagg AS (SELECT COUNT(*) AS n_pairs, CAST(SUM(vi * vj) AS BIGINT) AS p11,
         CAST(SUM(vi) AS BIGINT) AS pl, CAST(SUM(vj) AS BIGINT) AS pr FROM nself),
degs AS (SELECT CAST(SUM(deg * deg) AS BIGINT) AS sumdeg2 FROM
         (SELECT pid_l, COUNT(*) AS deg FROM nself GROUP BY pid_l))
SELECT ROUND(moran_i, 6) AS moran_i, ROUND(expected_i, 6) AS expected_i,
       ROUND(z_var, 6) AS z_var, ROUND(z_score, 6) AS z_score,
       ROUND(p_value, 6) AS p_value
FROM {nested}
""",
        "points_part",
    )


@_register("global_morans_i_adaptive", _adaptive_moran_oracle())
def q_global_moran_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I at the reference's adaptive default band
    (max nearest-neighbor distance × 1.0001, DistanceFactory.java:83-121)."""
    pts = world.points_part(spark, sf_dir).withColumn(
        "v", F.expr("CAST(FLOOR(val) AS BIGINT) % 97")
    )
    band = weights.adaptive_band(pts)
    return autocorr.global_morans_i(pts, band)


# ---------------------------------------------------------------------------
# Bucketed production variants of the LLM-pipeline pair queries
# ---------------------------------------------------------------------------


@_register("ngram_jaccard_lsh", textops.ngram_jaccard_lsh_oracle())
def q_ngram_jaccard_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard refine over MinHash-LSH band candidates (the
    composed production near-dup topology; no all-pairs join)."""
    world.register_tables(spark, sf_dir)
    return textops.ngram_jaccard_lsh(spark)


@_register("ann_topk_lsh", ann.ann_topk_lsh_oracle())
def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH approximate top-k cosine (bucket join + exact rank;
    the scale path whose exact baseline is ann_cosine_topk). Pinned to the
    oracle's N_PLANES: the dynamic planes_for(n) default stays for
    non-gated callers, but the gate pair must agree at EVERY sf (planes_for
    exceeds 8 past ~16k vectors, which would silently de-sync the oracle at
    sf>=1)."""
    world.register_tables(spark, sf_dir)
    return ann.ann_topk_lsh(spark, n_planes=ann.N_PLANES)


@_register("ann_topk_lsh_p12", ann.ann_topk_lsh_oracle(n_planes=12))
def q_ann_topk_lsh_p12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k at a 12-plane signature (4096 buckets) — the
    second width proving the plane count is a real parameter: candidate
    volume per probe shrinks 16x while the plan shape (bucket equi-join +
    per-query window) is unchanged."""
    world.register_tables(spark, sf_dir)
    return ann.ann_topk_lsh(spark, n_planes=12)


@_register("ann_topk_ivf", ann.ann_topk_ivf_oracle(stride=20, m=4))
def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k (the brief's second ANN scale path beside LSH):
    data-sampled centroids (vec_id % 20 == 1), TWO-LEVEL assignment (coarse
    LSH shortlist over the broadcast centroid table, exact argmax within —
    O(n log C), not O(n*C)), queries probe their 2 nearest lists, exact
    cosine re-rank. Stride and coarse plane count pinned here so the
    DuckDB oracle (same deterministic quantizer) agrees at every sf; the
    non-gated path auto-sizes both (``ivf_stride_for``,
    ``centroid_planes_for``). Recall vs brute ``cosine_topk`` and the
    scored-pair work bound are measured in pytest."""
    world.register_tables(spark, sf_dir)
    return ann.ann_topk_ivf(spark, stride=20, m=4)


@_register("pq_codes_packed", ann.pq_codes_packed_oracle())
def q_pq_codes_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codes in their stored form: one bigint packing all 8 4-bit codes
    (4 bytes of code payload per vector) — the column a 10^12-vector
    compressed index actually materializes; unpack is integer DIV/MOD."""
    world.register_tables(spark, sf_dir)
    return ann.pq_codes_packed(spark, cstride=ann.PQ_CSTRIDE_GATE)


@_register("doc_quality_gopher", textops.doc_quality_rules_oracle())
def q_doc_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality filter over documents (Rae et al. 2021 A1.1):
    length bounds, mean token length, repetition signals (distinct-token
    ratio, duplicate-bigram fraction via per-row array algebra — no
    explode, no shuffle) and a stopword floor, plus the keep decision.
    Thresholds sized to the synthetic corpus (keeps ~41% at sf0.01)."""
    world.register_tables(spark, sf_dir)
    return textops.doc_quality_rules(spark)


@_register("pq_codes", ann.pq_codes_oracle())
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding of the embedding column: per vector,
    the argmin codeword id in each of the 8 subspaces (4-bit codes; PQ_M
    bytes total vs DIM*4 = 32x compression — the 10^12-vector storage
    path). Codebooks are data-sampled (vec_id = c*31 + 2), so the whole
    encode is engine-shared SQL and fully oracle-gated. cstride pinned to
    PQ_CSTRIDE_GATE on both sides (the planes_for lesson); the non-gated
    default auto-sizes from the collection (``pq_cstride_for``)."""
    world.register_tables(spark, sf_dir)
    return ann.pq_codes(spark, cstride=ann.PQ_CSTRIDE_GATE)


@_register("pq_adc_topk", ann.pq_adc_topk_oracle())
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k over PQ codes (Jegou et al., TPAMI 2011): exact query
    sub-vectors scored against candidate CODEWORDS only — the candidate
    side reads its 8 byte-codes, never its float array; the 16-row
    codeword table is the broadcast LUT. Exact-L2 recall floor in pytest."""
    world.register_tables(spark, sf_dir)
    return ann.pq_adc_topk(spark, cstride=ann.PQ_CSTRIDE_GATE)


@_register(
    "ann_topk_ivfpq",
    ann.ann_topk_ivfpq_oracle(stride=20, m=4, cstride=ann.PQ_CSTRIDE_GATE),
)
def q_ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: two-level IVF probing (O(n log C) assignment) restricts
    candidates to the 2 nearest lists, ADC ranks them in the compressed
    domain — the full 10^12-vector pipeline (coarse index + byte codes),
    stride/m/cstride pinned to the oracle's values on both sides."""
    world.register_tables(spark, sf_dir)
    return ann.ann_topk_ivfpq(
        spark, stride=20, m=4, cstride=ann.PQ_CSTRIDE_GATE
    )


@_register(
    "ann_topk_ivfpq_residual",
    ann.ann_topk_ivfpq_residual_oracle(
        stride=20, m=4, cstride=ann.PQ_CSTRIDE_GATE
    ),
)
def q_ann_topk_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ (Jegou IVFADC): PQ codes built on r = v -
    centroid(list) so the global codebook spends its codewords on
    within-list variation; queries ADC their residual w.r.t. each probed
    list's centroid. Recall >= the non-residual path at the same stride
    (pytest); stride/m/cstride pinned to the oracle's values."""
    world.register_tables(spark, sf_dir)
    return ann.ann_topk_ivfpq_residual(
        spark, stride=20, m=4, cstride=ann.PQ_CSTRIDE_GATE
    )


from . import sessionize as _sessionize  # noqa: E402


@_register("sessionize_events", _sessionize.sessionize_sql())
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event sessionization (30-min gap): the gaps-and-islands
    plan — LAG + running SUM of break flags inside one user_id exchange,
    exact integer value sums. The batch twin of the stateful streaming
    operator (sessionize.stream_sessionize, replay pytest); engine-shared
    SQL text IS the oracle."""
    return _sessionize.sessionize(spark, sf_dir)


# ---------------------------------------------------------------------------
# Geometry transformer batch (transforms_geom.py)
# ---------------------------------------------------------------------------

from . import transforms_geom  # noqa: E402


@_register("densify_lines", transforms_geom.densify_oracle("lines_orders", 15.0))
def q_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DensifyProcess: vertices every <=15 units along each segment."""
    return transforms_geom.densify(
        world.load_layer(spark, sf_dir, "lines_orders"), tolerance=15.0
    )


@_register("flip_lines", transforms_geom.flip_lines_oracle("lines_orders"))
def q_flip_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlipLineProcess: reverse segment direction."""
    return transforms_geom.flip_lines(
        world.load_layer(spark, sf_dir, "lines_orders")
    )


@_register("extend_lines", transforms_geom.extend_lines_oracle("lines_orders", 10.0))
def q_extend_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtendLineProcess: push both endpoints outward by 10 units."""
    return transforms_geom.extend_lines(
        world.load_layer(spark, sf_dir, "lines_orders"), distance=10.0
    )


@_register("trim_lines", transforms_geom.trim_lines_oracle("lines_orders", 8.0))
def q_trim_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrimLineProcess: pull both endpoints inward by 8 units (collapsed
    segments dropped)."""
    return transforms_geom.trim_lines(
        world.load_layer(spark, sf_dir, "lines_orders"), distance=8.0
    )


@_register("split_line_by_distance", transforms_geom.split_line_oracle("lines_orders", 20.0))
def q_split_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SplitLineByDistanceProcess: 20-unit pieces per segment."""
    return transforms_geom.split_line_by_distance(
        world.load_layer(spark, sf_dir, "lines_orders"), piece_len=20.0
    )


@_register("vertices_to_points", transforms_geom.vertices_to_points_oracle("lines_orders"))
def q_vertices_to_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VerticesToPointsProcess: both endpoints of every segment."""
    return transforms_geom.vertices_to_points(
        world.load_layer(spark, sf_dir, "lines_orders")
    )


@_register("points_to_line", transforms_geom.points_to_line_oracle())
def q_points_to_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PointsToLineProcess: per-category ordered chains -> segments."""
    return transforms_geom.points_to_line(world.points_events(spark, sf_dir))


@_register("octagonal_envelope", transforms_geom.octagonal_envelope_oracle())
def q_octagonal_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FeatureToOctagonalEnvelopeProcess: per-category octagon support
    values (extremes of x, y, x+y, x-y)."""
    return transforms_geom.octagonal_envelope(world.points_events(spark, sf_dir))


@_register(
    "singlepart_to_multipart",
    transforms_geom.singlepart_to_multipart_oracle(),
)
def q_singlepart_to_multipart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SinglepartToMultipartProcess: group rects into multiparts by segment."""
    return transforms_geom.singlepart_to_multipart(
        world.rects_customer(spark, sf_dir)
    )


@_register("remove_parts", transforms_geom.remove_parts_oracle("rects_customer", 300.0))
def q_remove_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RemovePartsProcess: drop multipart parts with area < 300."""
    return transforms_geom.remove_parts(
        world.rects_customer(spark, sf_dir), min_area=300.0
    )


@_register(
    "remove_holes",
    transforms_geom.remove_holes_oracle("rects_customer", "rects_orders", 150.0),
)
def q_remove_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RemoveHolesProcess: fill holes (contained B-rects) with area < 150."""
    return transforms_geom.remove_holes(
        world.rects_customer(spark, sf_dir),
        world.load_layer(spark, sf_dir, "rects_orders"),
        min_area=150.0,
    )


@_register("smooth_chaikin", transforms_geom.smooth_chaikin_oracle())
def q_smooth_chaikin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SmoothProcess: one Chaikin corner-cut pass over per-category chains."""
    return transforms_geom.smooth_chaikin(world.points_events(spark, sf_dir))


@_register("feature_to_line", transforms_geom.feature_to_line_oracle())
def q_feature_to_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FeatureToLineProcess: rect boundaries -> 4 directed segments each."""
    return transforms_geom.feature_to_line(world.rects_customer(spark, sf_dir))


@_register("knn_circle_k6", transforms_geom.knn_circle_oracle("points_part", 6, 100.0))
def q_knn_circle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNearestNeighborCircleProcess: circle through the 6th neighbor."""
    return transforms_geom.knn_circle(
        world.points_part(spark, sf_dir), k=6, radius=100.0
    )


@_register("min_bounding_circle")
def q_min_bounding_circle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FeatureToMinimumBoundingCircleProcess per category (Welzl over hull;
    non-SQL kernel -> rows-only gate, brute-force-verified in pytest)."""
    return transforms_geom.min_bounding_circles(
        world.points_events(spark, sf_dir)
    )


@_register("min_rotated_rect")
def q_min_rotated_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FeatureToMinimumRectangleProcess per category (rotating calipers;
    non-SQL kernel -> rows-only gate, brute-force-verified in pytest)."""
    return transforms_geom.min_rotated_rects(world.points_events(spark, sf_dir))


_MRR_RECTS_ORACLE = f"""
{world.oracle_cte('rects_customer')}
SELECT rid,
       CAST(FLOOR(4.0 * hw * hh * 1000000.0 + 0.5) AS BIGINT) AS area_um2,
       TRUE AS mrr_ok
FROM rects_customer
"""


@_register("min_rotated_rect_rects", _MRR_RECTS_ORACLE)
def q_min_rotated_rect_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotating-calipers kernel against a CLOSED-FORM answer: each customer
    rect's 4 corners are rotated by a per-rid angle, the caliper recovers
    the minimum rotated rectangle — which for a rectangle is itself — and
    the query emits the closed-form area (um^2-quantized, exact in both
    engines) plus mrr_ok comparing caliper area/sides to 2hw x 2hh. The
    oracle predicts mrr_ok = TRUE for every rid, so a caliper regression
    turns the gate red; complements the rows-only per-category events
    variant whose optimum has no closed form."""
    rects = world.rects_customer(spark, sf_dir)
    corners = rects.selectExpr(
        "rid", "cx", "cy", "hw", "hh",
        "CAST(rid % 157 AS DOUBLE) * 0.02 AS th",
    ).selectExpr(
        "rid", "cx", "cy", "hw", "hh", "th",
        "stack(4, -1.0D, -1.0D, 1.0D, -1.0D, 1.0D, 1.0D, -1.0D, 1.0D) "
        "AS (ux, uy)",
    ).selectExpr(
        "CAST(rid AS STRING) AS cat",
        "cx + ux * hw * COS(th) - uy * hh * SIN(th) AS x",
        "cy + ux * hw * SIN(th) + uy * hh * COS(th) AS y",
    )
    mrr = transforms_geom.min_rotated_rects(corners, "cat")
    return mrr.join(
        rects.selectExpr("CAST(rid AS STRING) AS cat", "rid", "hw", "hh"),
        "cat",
    ).selectExpr(
        "rid",
        "CAST(FLOOR(4.0 * hw * hh * 1000000.0 + 0.5) AS BIGINT) AS area_um2",
        "(ABS(mrr_area - 4.0 * hw * hh) < 0.001 AND "
        "ABS(LEAST(mrr_w, mrr_h) - 2.0 * LEAST(hw, hh)) < 0.0001 AND "
        "ABS(GREATEST(mrr_w, mrr_h) - 2.0 * GREATEST(hw, hh)) < 0.0001) "
        "AS mrr_ok",
    )


# ---------------------------------------------------------------------------
# Focal surface completeness + density/interpolation tail (raster.py)
# ---------------------------------------------------------------------------


@_register("focal_aspect", raster.focal_aspect_oracle())
def q_focal_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterAspectOperation: 8-sector steepest-descent direction per
    block (trig-free sector form)."""
    world.register_layers(spark, sf_dir)
    return raster.focal_aspect(spark)


@_register("focal_tpi_tri", raster.focal_tpi_tri_oracle())
def q_focal_tpi_tri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPI + TRI + roughness per block (exact integer stencil sums)."""
    world.register_layers(spark, sf_dir)
    return raster.focal_tpi_tri(spark)


@_register("focal_curvature", raster.focal_curvature_oracle())
def q_focal_curvature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zevenbergen-Thorne curvature numerator per block (exact integers)."""
    world.register_layers(spark, sf_dir)
    return raster.focal_curvature(spark)


@_register("focal_flow_d8", raster.focal_flow_direction_oracle())
def q_focal_flow_d8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterFlowDirectionOperation: D8 steepest-drop codes per block."""
    world.register_layers(spark, sf_dir)
    return raster.focal_flow_direction(spark)


@_register(
    "kernel_density_gaussian",
    world.with_layers(
        raster.kernel_density_quantized_oracle(
            world.POINTS_EVENTS_SQL, "gaussian"
        ),
        "points_events",
    ),
)
def q_kernel_density_gaussian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian kernel density (quantized non-dyadic kernel path)."""
    return raster.kernel_density_quantized(
        world.points_events(spark, sf_dir), "gaussian"
    )


@_register(
    "kernel_density_tricube",
    world.with_layers(
        raster.kernel_density_quantized_oracle(
            world.POINTS_EVENTS_SQL, "tricube"
        ),
        "points_events",
    ),
)
def q_kernel_density_tricube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tricube kernel density (quantized non-dyadic kernel path)."""
    return raster.kernel_density_quantized(
        world.points_events(spark, sf_dir), "tricube"
    )


@_register("line_density", raster.line_density_oracle("lines_orders"))
def q_line_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterLineDensityOperation: clipped length inside per-cell radius
    circles / circle area."""
    return raster.line_density(world.load_layer(spark, sf_dir, "lines_orders"))


@_register("idw_grid", raster.idw_grid_oracle())
def q_idw_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterInterpolationIDWOperation: power-2 IDW surface on a cell
    lattice, radius-bounded."""
    return raster.idw_grid(world.points_part(spark, sf_dir))


# ---------------------------------------------------------------------------
# CSV point source (sources.py)
# ---------------------------------------------------------------------------

from . import sources  # noqa: E402


@_register("csv_points_source", sources.csv_points_oracle())
def q_csv_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextfileToPointOperation: CSV text -> point layer via spark.read.csv
    with an explicit schema (values bit-identical to the parquet layer —
    the CSV carries exact integer millicoordinates)."""
    world.register_tables(spark, sf_dir)
    return sources.csv_points_fixture(spark, sf_dir)


from . import shapefile  # noqa: E402


@_register("shp_roundtrip_points", shapefile.shp_roundtrip_points_oracle())
def q_shp_roundtrip_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ShapeExportOperation parity: the events point layer sharded to
    .shp/.shx/.dbf triples (one per partition, Arrow-batched writer), read
    back through the binaryFile + mapInPandas source. Coordinates are IEEE
    doubles in the .shp record, so the round-trip is bit-exact against the
    parquet-derived oracle."""
    world.register_tables(spark, sf_dir)
    return shapefile.shp_roundtrip_points(spark, sf_dir)


@_register("shp_roundtrip_rects", shapefile.shp_roundtrip_rects_oracle())
def q_shp_roundtrip_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon shapefile round-trip: customer rects as one-ring clockwise
    polygons; the reader returns the stored bbox corners (exact doubles)
    rather than re-deriving center/half-width, which would re-round."""
    world.register_tables(spark, sf_dir)
    return shapefile.shp_roundtrip_rects(spark, sf_dir)


from . import geotiff, quadkey  # noqa: E402


@_register("quadkey_rollup", quadkey.quadkey_rollup_oracle())
def q_quadkey_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical cell index (the H3/S2-style piece): Morton quadkeys at
    level 7 (128x128) with parent rollups to levels 6 and 5 computed from
    the previous level's CELLS (qk div 4, sum) — one scan of the points,
    then shuffles only over already-aggregated cell rows. Output
    (level, qk, cnt, sum_w) across the three levels."""
    world.register_tables(spark, sf_dir)
    return quadkey.quadkey_rollup_query(spark, sf_dir)


@_register("shp_roundtrip_donuts", shapefile.shp_roundtrip_donuts_oracle())
def q_shp_roundtrip_donuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-RING polygons (NumParts=2: clockwise outer rect + CCW
    half-size hole) through the variable-length polygon shapefile record
    layout and back, flattened to one row per vertex — bit-exact stored
    doubles vs the ring-generating oracle."""
    return shapefile.shp_roundtrip_donuts(spark, sf_dir)


@_register("shp_roundtrip_lines", shapefile.shp_roundtrip_lines_oracle())
def q_shp_roundtrip_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PolyLine (type 3) records with NumParts=2 and UNEQUAL part lengths
    through the shapefile sink and back, one row per vertex — bit-exact
    stored doubles vs the part-generating oracle (the reference fixture
    set's linestring.shp surface, SpatialStatisticsTestCase.java:16-41)."""
    return shapefile.shp_roundtrip_lines(spark, sf_dir)


@_register("tif_roundtrip_raster", geotiff.tif_roundtrip_oracle())
def q_tif_roundtrip_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoTIFF export/import parity (RasterExportOperation): the 500x500
    synthetic value raster sharded to 16 uncompressed 16-bit tiles (one
    applyInPandas task each, PixelIsPoint tiepoint + pixel scale), read
    back through binaryFile + Arrow parse. Pixel values and reconstructed
    world coordinates are bit-exact vs the grid-generating oracle."""
    return geotiff.tif_roundtrip_raster(spark, sf_dir)


@_register("tif_roundtrip_dem", geotiff.tif_roundtrip_dem_oracle())
def q_tif_roundtrip_dem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Float-DEM GeoTIFF parity (the reference's sfdem.tif case): the
    synthetic 500x500 float DEM sharded to float32 + Deflate tiles
    (SampleFormat=IEEEFP, Compression=8), read back through binaryFile +
    Arrow parse — bit-exact, since every elevation is an exact float32."""
    return geotiff.tif_roundtrip_dem(spark, sf_dir)


@_register(
    "local_sa_binning",
    autocorr.local_sa_binning_oracle(binning.WORLD_BBOX, 40, 40),
)
def q_local_sa_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalSABinningProcess: rect binning -> Gi* over the bin lattice
    (3x3 queen adjacency, selfNeighbors=true)."""
    return autocorr.local_sa_binning(
        world.points_events(spark, sf_dir), binning.WORLD_BBOX, 40, 40
    )


# ---------------------------------------------------------------------------
# Buffer variants + remaining closed-form transformers (transforms_buffer.py)
# + raster algebra tail + global-topology grouped kernels
# ---------------------------------------------------------------------------

from . import transforms_buffer  # noqa: E402


@_register("wedge_buffers", transforms_buffer.wedge_buffers_oracle())
def q_wedge_buffers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WedgeBufferProcess: 45-degree sector per point (azimuth from the
    weight field, trig-free)."""
    return transforms_buffer.wedge_buffers(world.points_events(spark, sf_dir))


@_register(
    "single_sided_buffers",
    transforms_buffer.single_sided_buffers_oracle("lines_orders", 6.0),
)
def q_single_sided_buffers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SingleSidedBufferProcess: left-offset quad per segment, width 6."""
    return transforms_buffer.single_sided_buffers(
        world.load_layer(spark, sf_dir, "lines_orders"), distance=6.0
    )


@_register("variable_buffers", transforms_buffer.variable_buffers_oracle())
def q_variable_buffers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariableBufferProcess: per-feature buffer distance from an attribute."""
    return transforms_buffer.variable_buffers(world.points_part(spark, sf_dir))


@_register(
    "split_polygon_by_count",
    transforms_buffer.split_polygon_by_count_oracle("rects_customer", 4),
)
def q_split_polygon_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SplitPolygonByCountProcess: 4 equal-area strips per rect."""
    return transforms_buffer.split_polygon_by_count(
        world.rects_customer(spark, sf_dir), k=4
    )


@_register("max_inscribed_circle", transforms_buffer.max_inscribed_circle_oracle())
def q_max_inscribed_circle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FeatureToMaximumInscribedCircle: closed form for axis-aligned rects."""
    return transforms_buffer.max_inscribed_circle(
        world.rects_customer(spark, sf_dir)
    )


@_register("force_dimension_3d", transforms_buffer.force_dimension_oracle())
def q_force_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ForceDimensionProcess: 2D -> 3D coercion (z from the value field)."""
    return transforms_buffer.force_dimension(world.points_part(spark, sf_dir))


@_register("raster_highlow", raster.raster_highlow_oracle())
def q_raster_highlow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterHighLowPointsProcess: global max/min pixels, deterministic
    tie-break."""
    world.register_layers(spark, sf_dir)
    return raster.raster_highlow(spark)


@_register("raster_local_algebra", raster.raster_local_algebra_oracle())
def q_raster_local_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local map-algebra tail: Con + SetNull + Math(sqrt) + Fuzzy linear
    membership in one pass, per-block exact sums."""
    world.register_layers(spark, sf_dir)
    return raster.raster_local_algebra(spark)


@_register("delaunay_groups")
def q_delaunay_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DelaunayTriangulationProcess per category (Bowyer-Watson grouped
    kernel; rows-only gate — triangulation area == hull area and Euler
    count verified in pytest; the hash-gated topology twin is
    delaunay_euler below)."""
    return transforms_geom.delaunay_groups(world.points_part(spark, sf_dir)
                                           .withColumn("cat", F.expr("CAST(pid % 5 AS STRING)")))


@_register("delaunay_euler", transforms_geom.delaunay_euler_oracle())
def q_delaunay_euler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated Delaunay topology twin: per category (n_points,
    n_triangles) from the Bowyer-Watson kernel, matched bit-exactly
    against 2n - 2 - h where h comes from an INDEPENDENT engine-shared
    SQL convex hull (angular-gap test, exact integer cross/dot) — Euler's
    relation pins the triangulation's topology, not just row counts."""
    d = transforms_geom.delaunay_groups(
        world.points_part(spark, sf_dir)
        .withColumn("cat", F.expr("CAST(pid % 5 AS STRING)"))
    )
    return d.select("cat", "n_points", "n_triangles")


@_register("concave_hull_groups")
def q_concave_hull_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConcaveHullProcess per category (alpha-shape over the Delaunay
    triangulation; rows-only gate, invariants in pytest)."""
    return transforms_geom.concave_hull_groups(
        world.points_part(spark, sf_dir)
        .withColumn("cat", F.expr("CAST(pid % 5 AS STRING)")),
        alpha=40.0,
    )


_LSO_V_SQL = "CAST(FLOOR(ABS(bal) * 10.0) AS BIGINT) % 97"


def _local_sa_overlay_oracle() -> str:
    from .overlay_diff import mm_sql

    nested = binning.stages_to_subquery(
        "SELECT * FROM per_i CROSS JOIN moments", autocorr.LOCAL_G_STAGES
    )
    return world.with_layers(
        f"""
WITH rm AS (SELECT rid, {_LSO_V_SQL} AS v,
            {mm_sql('cx - hw')} AS x0, {mm_sql('cx + hw')} AS x1,
            {mm_sql('cy - hh')} AS y0, {mm_sql('cy + hh')} AS y1
            FROM rects_customer),
wp AS (SELECT a.rid AS pid_l, a.v AS vi, b.v AS vj
       FROM rm a JOIN rm b
         ON a.x0 <= b.x1 AND b.x0 <= a.x1 AND a.y0 <= b.y1 AND b.y0 <= a.y1
        AND a.rid <> b.rid),
moments AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
            CAST(SUM(v * v) AS BIGINT) AS s2 FROM rm),
per_i AS (SELECT pid_l AS rid, vi AS v,
          CAST(COUNT(*) + 1 AS BIGINT) AS deg_s,
          CAST(SUM(vj) + vi AS BIGINT) AS loc_sum
          FROM wp GROUP BY pid_l, vi)
SELECT rid, ROUND(gi_z, 6) AS gi_z, ROUND(gi_p, 6) AS gi_p
FROM {nested}
""",
        "rects_customer",
    )


@_register("local_sa_overlay", _local_sa_overlay_oracle())
def q_local_sa_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalSAOverlayProcess: Gi* over the overlay layer under Queen
    contiguity (selfNeighbors=true)."""
    return weights.local_g_queen(
        world.rects_customer(spark, sf_dir), _LSO_V_SQL
    )


# ---------------------------------------------------------------------------
# Round-2 batch: cluster detection (Besag-Newell / GAM), vector Thiessen,
# geometry repair, raster zone vectorization
# ---------------------------------------------------------------------------
from . import cluster  # noqa: E402


@_register("besag_newell", cluster.besag_newell_oracle())
def q_besag_newell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClusterBesagNewellOperation: per case point, the circle through its
    k nearest case neighbours; Poisson tail test on population mass
    (GT/pattern/ClusterBesagNewellOperation.java:64-175)."""
    return cluster.besag_newell(
        world.points_events(spark, sf_dir), world.points_part(spark, sf_dir)
    ).orderBy("pid")


@_register("gam_scan", cluster.gam_oracle())
def q_gam_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClusterGAMOperation: overlapping circle lattice per radius, Poisson
    fitness filter (GT/pattern/ClusterGAMOperation.java:91-201)."""
    return cluster.gam(
        world.points_events(spark, sf_dir), world.points_part(spark, sf_dir)
    )


@_register("raster_to_polygon", raster.raster_to_polygon_oracle())
def q_raster_to_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterToPolygonOperation: contiguous equal-value zone vectorization
    by boundary-edge extraction (one shifted-key equi-join, linear in
    pixels)."""
    return raster.raster_to_polygon(spark)


@_register("thiessen_polygons")
def q_thiessen_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ThiessenPolygonProcess per category (half-plane-clipped exact
    Voronoi cells; rows-only gate — cells tile the expanded bbox, verified
    in pytest; the raster-form discrete_voronoi is the global-scale
    variant)."""
    return transforms_geom.thiessen_groups(
        world.points_part(spark, sf_dir)
        .where("pid % 10 = 0")
        .withColumn("cat", F.expr("CAST(pid % 3 AS STRING)"))
    )


_THIESSEN_CONS_ORACLE = (
    world.oracle_cte("points_part")
    + """
SELECT CAST(pid % 3 AS VARCHAR(8)) AS cat, CAST(COUNT(*) AS BIGINT) AS n_cells,
       TRUE AS area_ok, TRUE AS verts_ok
FROM points_part WHERE pid % 10 = 0 GROUP BY 1
"""
)


@_register("thiessen_conservation", _THIESSEN_CONS_ORACLE)
def q_thiessen_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated Thiessen twin: per category, exact cell count plus the
    two conservation invariants folded to booleans with 100x margin —
    the cells TILE the expanded bbox (sum(cell_area) == bbox_area within
    1e-3; per-cell rounding error is <= 1e-5) and every cell is a real
    polygon (>= 3 vertices). A dropped/duplicated/misclipped cell breaks
    count or area; the oracle is the closed form (count = sites, TRUE,
    TRUE)."""
    t = transforms_geom.thiessen_groups(
        world.points_part(spark, sf_dir)
        .where("pid % 10 = 0")
        .withColumn("cat", F.expr("CAST(pid % 3 AS STRING)"))
    )
    return t.groupBy("cat").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (F.abs(F.sum("cell_area") - F.min("bbox_area")) < 1e-3).alias(
            "area_ok"
        ),
        (F.min("n_verts") >= 3).alias("verts_ok"),
    )


@_register("repair_geometry", transforms_geom.repair_rings_oracle())
def q_repair_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RepairGeometryProcess over deterministically-dirtied rings (dup
    vertices, CW orientation, degenerate collapse); closed-form oracle in
    integer millicoordinates."""
    out = transforms_geom.repair_rings(world.rects_customer(spark, sf_dir))
    return out.selectExpr(
        "rid", "n_verts", "valid",
        "CAST(FLOOR(area * 1000000.0 + 0.5) AS BIGINT) AS area_um2",
        "CAST(CASE WHEN fx IS NULL THEN NULL"
        " ELSE FLOOR(fx * 1000.0 + 0.5) END AS BIGINT) AS fx_mm",
        "CAST(CASE WHEN fy IS NULL THEN NULL"
        " ELSE FLOOR(fy * 1000.0 + 0.5) END AS BIGINT) AS fy_mm",
    )


@_register("polygonize_rects", transforms_geom.polygonize_oracle())
def q_polygonize_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FeatureToPolygonProcess: assemble rings from an anonymous segment
    soup — min-label propagation over shared endpoints (2 keyed-agg rounds)
    then per-component Arrow ring assembly; closed-form oracle because the
    input is the per-rid-inset rect boundaries."""
    segs = transforms_geom.inset_boundary_segments(
        world.rects_customer(spark, sf_dir)
    )
    out = transforms_geom.polygonize(segs)
    return out.where("closed").selectExpr(
        "comp", "n_segs", "n_verts",
        "CAST(FLOOR(area * 1000000.0 + 0.5) AS BIGINT) AS area_um2",
        "closed",
    )


def _dp_argmax_lateral() -> str:
    """LATERAL argmax body shared by the recursive step and the split
    counter: the farthest interior vertex of interval (sp.s, sp.e) by
    perpendicular distance to the chord LINE — the exact arithmetic of
    geomlib.douglas_peucker (same IEEE op order, first-index tie-break
    via ORDER BY d DESC, idx ASC), so decisions match numpy bit-for-bit."""
    num = ("(be.xe - bs.xs0) * (be.xe - bs.xs0) "
           "+ (be.ye - bs.ys0) * (be.ye - bs.ys0)")
    return f"""
LATERAL (
  SELECT p.idx AS k,
         CASE WHEN SQRT({num}) = 0.0
              THEN SQRT((p.x - bs.xs0) * (p.x - bs.xs0)
                        + (p.y - bs.ys0) * (p.y - bs.ys0))
              ELSE ABS((be.ye - bs.ys0) * p.x - (be.xe - bs.xs0) * p.y
                       + be.xe * bs.ys0 - be.ye * bs.xs0) / SQRT({num})
         END AS d
  FROM dp_pts p,
       (SELECT x AS xs0, y AS ys0 FROM dp_pts
        WHERE cat = sp.cat AND idx = sp.s) bs,
       (SELECT x AS xe, y AS ye FROM dp_pts
        WHERE cat = sp.cat AND idx = sp.e) be
  WHERE p.cat = sp.cat AND p.idx > sp.s AND p.idx < sp.e
  ORDER BY d DESC, p.idx ASC LIMIT 1
)"""


_SIMPLIFY_DP_ORACLE = f"""
WITH RECURSIVE points_events AS ({{events}}),
dp_pts AS (
  SELECT CAST(pid % 8 AS VARCHAR) AS cat,
         ROW_NUMBER() OVER (PARTITION BY pid % 8 ORDER BY pid) - 1 AS idx,
         x, y
  FROM points_events
),
dp_ends AS (
  SELECT cat, MIN(idx) AS s, MAX(idx) AS e FROM dp_pts GROUP BY cat
),
seg(cat, s, e) AS (
  SELECT cat, s, e FROM dp_ends WHERE e > s + 1
  UNION ALL
  SELECT u.cat, u.ns, u.ne FROM (
    SELECT sp.cat,
           CASE WHEN side.v = 0 THEN sp.s ELSE b.k END AS ns,
           CASE WHEN side.v = 0 THEN b.k ELSE sp.e END AS ne
    FROM seg sp, {{lateral}} b, (VALUES (0), (1)) side(v)
    WHERE b.d > 15.0
  ) u
  WHERE u.ne > u.ns + 1
),
dp_splits AS (
  SELECT sp.cat, b.k FROM seg sp, {{lateral}} b WHERE b.d > 15.0
),
dp_counts AS (SELECT cat, COUNT(*) AS n_in FROM dp_pts GROUP BY cat)
SELECT c.cat,
       CAST(c.n_in AS BIGINT) AS n_in,
       CAST(CASE WHEN c.n_in < 3 THEN c.n_in
                 ELSE 2 + COALESCE(s.n, 0) END AS BIGINT) AS n_kept
FROM dp_counts c
LEFT JOIN (SELECT cat, COUNT(*) AS n FROM dp_splits GROUP BY cat) s
       USING (cat)
"""


@_register(
    "simplify_dp",
    _SIMPLIFY_DP_ORACLE.format(
        events=world.LAYER_SQL["points_events"], lateral=_dp_argmax_lateral()
    ),
)
def q_simplify_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimplifyProcess (Douglas-Peucker, GT/transformation/
    SimplifyFeatureCollection.java): per-category polyline (events ordered
    by pid) simplified at tolerance 15. Oracle: the DP recursion as a
    DuckDB recursive CTE — intervals split at the LATERAL-argmax farthest
    vertex while its chord distance exceeds tol; n_kept = 2 + #splits.
    The kernel uses only IEEE correctly-rounded ops (sqrt form, not
    hypot) so both engines take identical split decisions."""
    import pandas as pd
    from pyspark.sql import types as T

    from opengxt_spark import geomlib, planner

    pts = planner.ensure_parallelism(
        world.points_events(spark, sf_dir)
        .withColumn("cat", F.expr("CAST(pid % 8 AS STRING)"))
        .select("cat", "pid", "x", "y")
    )

    schema = T.StructType([
        T.StructField("cat", T.StringType()),
        T.StructField("n_in", T.LongType()),
        T.StructField("n_kept", T.LongType()),
    ])

    def per_cat(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("pid")
        kx, ky = geomlib.douglas_peucker(
            pdf["x"].to_numpy(), pdf["y"].to_numpy(), 15.0
        )
        return pd.DataFrame(
            {"cat": [pdf["cat"].iloc[0]], "n_in": [len(pdf)],
             "n_kept": [len(kx)]}
        )

    return pts.groupBy("cat").applyInPandas(per_cat, schema=schema)


def _median_center_oracle(iterations: int = 20) -> str:
    """Weiszfeld unrolled as ``iterations`` chained CTEs (the
    eliminate_converged fixpoint-oracle pattern): i0 = centroid, each
    i(k) = inverse-distance-weighted mean against i(k-1). Same IEEE
    arithmetic as distribution.median_center; only the SUM combine order
    differs (~1e-14 relative), far inside the 4-decimal quantization."""
    steps = ["i0 AS (SELECT AVG(x) AS mx, AVG(y) AS my FROM points_events)"]
    for k in range(1, iterations + 1):
        steps.append(
            f"i{k} AS (SELECT SUM(x * invd) / SUM(invd) AS mx, "
            f"SUM(y * invd) / SUM(invd) AS my FROM ("
            f"SELECT x, y, 1.0 / SQRT((x - mx) * (x - mx) "
            f"+ (y - my) * (y - my) + 1e-12) AS invd "
            f"FROM points_events, i{k - 1}) __d{k})"
        )
    return (
        f"{world.oracle_cte('points_events')},\n"
        + ",\n".join(steps)
        + f"\nSELECT ROUND(mx, 4) AS mx, ROUND(my, 4) AS my FROM i{iterations}"
    )


@_register("median_center", _median_center_oracle())
def q_median_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MedianCenterProcess (Weiszfeld, GT/distribution/MedianCenter.java:36):
    20 driver-looped 1-row aggregates over the cached layer. Oracle: the
    same 20 iterations unrolled as chained DuckDB CTEs — identical IEEE
    arithmetic per step, so the 4-decimal-rounded center matches;
    convergence invariant in tests/test_autocorr.py."""
    mx, my = distribution.median_center(world.points_events(spark, sf_dir))
    return spark.createDataFrame(
        [(round(mx, 4), round(my, 4))], "mx double, my double"
    )


_RPF_H = ("((rid * 131071 + i * 7919 + 13) * 48271 "
          "+ ((rid + i) * (rid + i)) % 999983 * 104729) % 1000000000")
_RPF_HY = ("((rid * 524287 + i * 104729 + 7) * 69621 "
           "+ ((rid + 2 * i) * (rid + 2 * i)) % 999979 * 7129) % 1000000000")


def _rpf_body(seq_sql: str) -> str:
    """Shared SQL body for RandomPointsPerFeatures (n = 1 + rid % 5 seeded
    points inside each rect, exact integer-mm arithmetic)."""
    from .overlay_diff import mm_sql

    x0, y0 = mm_sql("cx - hw"), mm_sql("cy - hh")
    w, h = f"2 * {mm_sql('hw')}", f"2 * {mm_sql('hh')}"
    return f"""
SELECT rid, CAST(i AS BIGINT) AS i,
       ROUND(CAST({x0} + {_RPF_H} % ({w} + 1) AS DOUBLE) / 1000.0, 6) AS rx,
       ROUND(CAST({y0} + {_RPF_HY} % ({h} + 1) AS DOUBLE) / 1000.0, 6) AS ry
FROM (SELECT rid, cx, cy, hw, hh FROM rects_customer){seq_sql}
"""


@_register(
    "random_points_per_feature",
    world.with_layers(
        _rpf_body(", LATERAL UNNEST(generate_series(0, rid % 5)) AS u(i)"),
        "rects_customer",
    ),
)
def q_random_points_per_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RandomPointsPerFeaturesProcess (GT/operations/RandomPointsOperation
    .java:103 per-feature branch): seeded deterministic points inside each
    polygon, count driven by an attribute (1 + rid % 5)."""
    world.register_layers(spark, sf_dir)
    return spark.sql(
        _rpf_body(
            " JOIN (SELECT explode(sequence(0, 4)) AS i) "
            "ON i <= rid % 5"
        )
    )


@_register("raster_surface_area", raster.raster_surface_area_oracle())
def q_raster_surface_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterSurfaceAreaProcess: slope-corrected 3D area per 25x25 block,
    exact integer milli-unit sums (Horn gradients, trig-free)."""
    return raster.raster_surface_area(spark)


_LOS_OBS_SQL = "SELECT pid AS oid, x, y FROM points_part WHERE pid % 500 = 0"


@_register(
    "radial_los",
    world.with_layers(raster.radial_los_oracle(_LOS_OBS_SQL), "points_part"),
)
def q_radial_los(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterRadialLOSProcess: 8 rays per observer, running-max tangent
    visibility recurrence (window, no trig)."""
    world.register_layers(spark, sf_dir)
    obs = spark.sql(_LOS_OBS_SQL)
    return raster.radial_los(spark, obs)


@_register("tin_interpolation")
def q_tin_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TINInterpolationProcess per category: Delaunay TIN of control points
    (pid % 7 = 0, v = integer value), linear barycentric interpolation at
    the remaining points (rows-only; linear-field exactness in pytest)."""
    pts = world.points_part(spark, sf_dir).selectExpr(
        "CAST(pid % 4 AS STRING) AS cat", "pid", "x", "y",
        "CASE WHEN pid % 7 = 0 THEN 1 ELSE 0 END AS is_ctl",
        "CAST(CAST(FLOOR(val) AS BIGINT) % 1000 AS DOUBLE) AS v",
    )
    return transforms_geom.tin_interpolation_groups(pts)


_RING_RADII = (10.0, 20.0, 30.0)


def _ring_map_oracle() -> str:
    dlit = world.dlit
    r3 = dlit(_RING_RADII[2] ** 2)
    r1, r2 = dlit(_RING_RADII[0] ** 2), dlit(_RING_RADII[1] ** 2)
    return world.with_layers(
        f"""
SELECT rid, ring, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(w) AS BIGINT) AS sum_w
FROM (
  SELECT rid, w,
         CASE WHEN d2 <= {r1} THEN 1 WHEN d2 <= {r2} THEN 2 ELSE 3 END AS ring
  FROM (
    SELECT r.rid, e.w,
           (r.cx - e.x) * (r.cx - e.x) + (r.cy - e.y) * (r.cy - e.y) AS d2
    FROM (SELECT rid, cx, cy FROM rects_customer) r
    JOIN (SELECT pid, x, y, w FROM points_events) e
      ON (r.cx - e.x) * (r.cx - e.x) + (r.cy - e.y) * (r.cy - e.y) <= {r3}
  )
)
GROUP BY rid, ring
""",
        "rects_customer", "points_events",
    )


@_register("ring_map_cells", transforms_geom.ring_map_dressing_sql())
def q_ring_map_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RingMap cartographic dressing (RingMapsOperation.java:100-213): the
    24 annulus-sector chart cells as vertex rows — SEGS=10 arc steps with
    a 1-step gap, rings stacked outward from the bbox-diagonal radius,
    sectors greedily matched to the nearest rect-category feature, each
    cell carrying ring_num and that ring's value field. The matching is
    the reference's own sequential driver loop over the (chart-sized,
    asserted <= 64) feature pool — bounded collect like Jenks — while the
    DuckDB oracle runs the same greedy unrolled as 8 pure-SQL CTE stages;
    identical IEEE arithmetic keeps the decisions bit-equal."""
    world.register_tables(spark, sf_dir)
    return transforms_geom.ring_map_dressing(spark)


@_register("ring_map_anchors", transforms_geom.ring_map_anchors_sql())
def q_ring_map_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RingMap anchor-line layer (RingMapsOperation.java:139-152): per
    sector, the chart-side endpoint (mid-angle at the inner radius) and
    the matched feature centroid — the leader lines tying chart cells to
    their features."""
    world.register_tables(spark, sf_dir)
    return transforms_geom.ring_map_anchors(spark)


@_register("circle_map_circles", transforms_geom.circle_map_sql())
def q_circle_map_circles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CircleMap dressing (CircleMapOperation.java:88-213): features placed
    clockwise on perimeter slots (greedy nearest-free-slot in cat order —
    the reference's STRtree nearest-with-processed-filter loop), each
    drawn as a 32-gon circle whose radius scales with the value field
    between half-chord maxRadius and its 10% floor. Matching runs
    driver-side on the bounded feature pool (as the reference does);
    the oracle unrolls the same greedy as pure SQL."""
    world.register_tables(spark, sf_dir)
    return transforms_geom.circle_map(spark)


@_register("circle_map_anchors", transforms_geom.circle_map_sql(anchors=True))
def q_circle_map_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CircleMap anchor lines (java:153-155): feature centroid to the
    nearest point of its value-scaled circle (on the ideal circle along
    the center line — the reference uses the 32-gon's nearest vertex/edge;
    documented deviation, same leader-line contract)."""
    world.register_tables(spark, sf_dir)
    return transforms_geom.circle_map(spark, anchors=True)


@_register("ring_map", _ring_map_oracle())
def q_ring_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RingMapProcess (GT/RingMapProcess.java: concentric ring charts per
    feature): per rect centroid, event count + weight sum in 3 annuli
    (10/20/30) — one cell-banded join at the outer radius, CASE ring
    assignment, partial-agg group."""
    rects = world.rects_customer(spark, sf_dir).selectExpr(
        "rid", "cx", "cy"
    )
    ev = world.points_events(spark, sf_dir)
    pairs = joins.distance_band_join(
        rects, ev, radius=_RING_RADII[2],
        left_cols=("rid", "cx", "cy"),
        right_extra={"w": "w"},
    )
    dlit = world.dlit
    r1, r2 = dlit(_RING_RADII[0] ** 2), dlit(_RING_RADII[1] ** 2)
    return (
        pairs.selectExpr(
            "pid_l AS rid", "w",
            f"CASE WHEN d2 <= {r1} THEN 1 WHEN d2 <= {r2} THEN 2 "
            "ELSE 3 END AS ring",
        )
        .groupBy("rid", "ring")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("w").cast("long").alias("sum_w"),
        )
    )


_HUB_N = 64


def _hub_lines_by_id_oracle() -> str:
    return world.with_layers(
        f"""
SELECT e.pid AS pid_l, h.pid AS pid_r,
       ROUND(e.x, 6) AS x1, ROUND(e.y, 6) AS y1,
       ROUND(h.x, 6) AS x2, ROUND(h.y, 6) AS y2,
       ROUND(SQRT((e.x - h.x) * (e.x - h.x) + (e.y - h.y) * (e.y - h.y)), 6)
         AS hub_dist
FROM points_events e
JOIN points_part h ON h.pid = e.pid % {_HUB_N}
""",
        "points_events", "points_part",
    )


@_register("hub_lines_by_id", _hub_lines_by_id_oracle())
def q_hub_lines_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HubLinesByIDProcess (GT/transformation/HubLinesByIDOperation.java):
    spoke -> hub segment by shared id attribute (hub id = pid % 64), a
    plain broadcast equi-join + segment construction."""
    ev = world.points_events(spark, sf_dir).selectExpr(
        "pid AS pid_l", "x AS ex", "y AS ey", f"pid % {_HUB_N} AS hub"
    )
    hubs = world.points_part(spark, sf_dir).where(
        f"pid < {_HUB_N}"
    ).selectExpr("pid AS pid_r", "x AS hx", "y AS hy")
    return (
        ev.join(F.broadcast(hubs), ev.hub == hubs.pid_r)
        .selectExpr(
            "pid_l", "pid_r",
            "ROUND(ex, 6) AS x1", "ROUND(ey, 6) AS y1",
            "ROUND(hx, 6) AS x2", "ROUND(hy, 6) AS y2",
            "ROUND(SQRT((ex - hx) * (ex - hx) + (ey - hy) * (ey - hy)), 6)"
            " AS hub_dist",
        )
    )


@_register(
    "polygons_along_lines", overlay.polygons_along_lines_oracle(40.0, 6.0)
)
def q_polygons_along_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PolygonsAlongLinesProcess: CCW rectangular strips every 40 units,
    width 6, along each order segment."""
    return overlay.polygons_along_lines(
        world.load_layer(spark, sf_dir, "lines_orders"), 40.0, 6.0
    )


_LOCAL_LEES_S_ORACLE = world.with_layers(
    """
WITH pts AS (SELECT pid, x, y, w % 97 AS v FROM points_events),
ist AS (SELECT l.pid AS pid_l, COUNT(*) AS cnt,
        CAST(SUM(r.v) AS BIGINT) AS sum_v
        FROM pts l JOIN pts r
          ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 100.0
        GROUP BY l.pid),
mom AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sx,
        CAST(SUM(v * v) AS BIGINT) AS sxx FROM pts),
w2 AS (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS wij2sum FROM ist)
SELECT pid_l AS pid,
       ROUND((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       / CAST(wij2sum AS DOUBLE))
       * ((CAST(sum_v AS DOUBLE) - cnt * (CAST(sx AS DOUBLE) / n))
       * (CAST(sum_v AS DOUBLE) - cnt * (CAST(sx AS DOUBLE) / n)))
       / (CAST(sxx AS DOUBLE) - n * (CAST(sx AS DOUBLE) / n)
       * (CAST(sx AS DOUBLE) / n)), 6) AS lls_index
FROM ist CROSS JOIN mom CROSS JOIN w2
""",
    "points_events",
)


@_register("local_lees_s", _LOCAL_LEES_S_ORACLE)
def q_local_lees_s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalLeesSProcess: per-feature univariate smoothing concentration
    (index only — the reference's z is hardcoded 0.0 "TODO correct")."""
    return autocorr.local_lees_s(_ac_points(spark, sf_dir), _AC_BAND)


_LRR_BAND = 25.0


def _local_rogerson_oracle() -> str:
    return world.with_layers(
        f"""
WITH pts AS (SELECT pid, x, y, w % 97 + 1 AS case_v, w % 89 + 1 AS pop_v
             FROM points_events),
tot AS (SELECT CAST(SUM(case_v) AS BIGINT) AS sum_x,
        CAST(SUM(pop_v) AS BIGINT) AS sum_y FROM pts),
pr AS (
  SELECT a.pid AS pid_l, b.pid AS pid_r,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
         b.case_v AS xj, b.pop_v AS yj
  FROM pts a JOIN pts b
    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       <= {world.dlit(_LRR_BAND * _LRR_BAND)}
   AND a.pid <> b.pid
),
nb AS (
  SELECT pid_l, CAST(SUM(
    CAST(FLOOR(1e12 * (CASE WHEN d2 <= 1.0 THEN 1.0 ELSE 1.0 / SQRT(d2) END)
    * (CAST(xj AS DOUBLE) / sum_x - CAST(yj AS DOUBLE) / sum_y)
    / SQRT(CAST(yj AS DOUBLE) / sum_y)) AS BIGINT)) AS BIGINT) AS nb_u
  FROM pr CROSS JOIN tot GROUP BY pid_l
),
base AS (
  SELECT pid,
         (CAST(case_v AS DOUBLE) / sum_x - CAST(pop_v AS DOUBLE) / sum_y)
           AS ripi,
         SQRT(CAST(pop_v AS DOUBLE) / sum_y) AS sqp,
         CAST(pop_v AS DOUBLE) / sum_y AS pi_,
         CAST(sum_x AS BIGINT) AS sum_x
  FROM pts CROSS JOIN tot
),
b2 AS (
  SELECT pid, ripi, sqp, pi_, sum_x,
         CAST(FLOOR(1e12 * (ripi / sqp)) AS BIGINT) AS self_u
  FROM base
)
SELECT b2.pid,
       ROUND((ripi / sqp) * ((self_u + COALESCE(nb.nb_u, 0)) / 1e12), 6)
         AS lrr_index,
       ROUND(((ripi / sqp) * ((self_u + COALESCE(nb.nb_u, 0)) / 1e12))
       / ((1.0 - pi_) / CAST(sum_x AS DOUBLE)), 6) AS lrr_z
FROM b2 LEFT JOIN nb ON nb.pid_l = b2.pid
""",
        "points_events",
    )


@_register("local_rogerson_r", _local_rogerson_oracle())
def q_local_rogerson_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalRogersonRProcess: per-feature Tango contribution with
    a_ii = 1, a_ij = min(1, 1/d); z = R_i / E(R_i). Same band-truncation
    and 1e-12 quantization contract as the global operator."""
    pts = world.points_events(spark, sf_dir).selectExpr(
        "pid", "x", "y", "w % 97 + 1 AS case_v", "w % 89 + 1 AS pop_v"
    )
    return autocorr.local_rogerson_r(pts, band=_LRR_BAND)


@_register("raster_describe", raster.raster_describe_oracle())
def q_raster_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterDescribeProcess: one-row raster description (extent, cell
    size, min/max/mean/sd from exact integer sums)."""
    return raster.raster_describe(spark)


@_register("max_inscribed_rect")
def q_max_inscribed_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FeatureToMaximumInscribedRectangleProcess per category (40x40
    raster sweep over the group hull; rows-only — containment/area
    invariants in pytest; hash-gated closed-form twin below)."""
    return transforms_geom.max_inscribed_rects(
        world.points_part(spark, sf_dir)
        .withColumn("cat", F.expr("CAST(pid % 6 AS STRING)"))
    )


# On an AXIS-ALIGNED RECTANGULAR hull the 40x40 sweep's optimum is
# closed-form: the full bbox inset by exactly one cell (w/40, h/40) on
# the min edges (the reference's one-cell reconstruction inset,
# MaximumInscribedRectangle.java:144-262) — same gating trick as
# min_rotated_rect_rects. True values have <= 4 decimals, so ROUND(.., 6)
# sits >= 5e-7 from any boundary while the float-path error is ~1e-13.
_MIR_RECTS_ORACLE = (
    world.oracle_cte("rects_customer")
    + """
SELECT CAST(rid AS VARCHAR(16)) AS cat,
       ROUND((cx - hw) + ((cx + hw) - (cx - hw)) / 40.0, 6) AS minx,
       ROUND((cy - hh) + ((cy + hh) - (cy - hh)) / 40.0, 6) AS miny,
       ROUND(cx + hw, 6) AS maxx,
       ROUND(cy + hh, 6) AS maxy,
       ROUND(((cx + hw) - ((cx - hw) + ((cx + hw) - (cx - hw)) / 40.0))
           * ((cy + hh) - ((cy - hh) + ((cy + hh) - (cy - hh)) / 40.0)), 6)
         AS rect_area
FROM rects_customer
"""
)


# Alpha-shape twin: 4 rect corners + one OFF-CENTER interior point (the
# offset breaks the fan symmetry; the corners' mutual cocircularity is
# tie-safe — either in-circle resolution yields 4 triangles, 4 boundary
# edges, and the full rect area). With alpha far above every circumradius
# the alpha shape IS the convex hull: closed form per rid.
_CONCAVE_RECTS_ORACLE = (
    world.oracle_cte("rects_customer")
    + """
SELECT CAST(rid AS VARCHAR(16)) AS cat,
       ROUND(4.0 * hw * hh, 6) AS hull_area,
       CAST(4 AS BIGINT) AS n_kept_tris,
       CAST(4 AS BIGINT) AS n_boundary_edges
FROM rects_customer
"""
)


@_register("concave_hull_rects", _CONCAVE_RECTS_ORACLE)
def q_concave_hull_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated alpha-shape twin: each customer rect's 4 corners + an
    off-center interior point triangulate to exactly 4 triangles; with
    alpha >> every circumradius the alpha shape is the hull — area
    4*hw*hh, 4 kept triangles, 4 boundary edges, closed form per rid."""
    pts = world.rects_customer(spark, sf_dir).selectExpr(
        "CAST(rid AS STRING) AS cat",
        "explode(array(array(cx - hw, cy - hh), array(cx + hw, cy - hh), "
        "array(cx + hw, cy + hh), array(cx - hw, cy + hh), "
        "array(cx + 0.1 * hw, cy))) AS pt",
    ).selectExpr("cat", "pt[0] AS x", "pt[1] AS y")
    return transforms_geom.concave_hull_groups(pts, alpha=100.0)


@_register("max_inscribed_rect_rects", _MIR_RECTS_ORACLE)
def q_max_inscribed_rect_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated twin: the 40x40 inscribed-rect sweep over each customer
    rect's 4 corners (hull == the rect) must return the bbox inset by one
    sweep cell on the min edges — closed-form per rid, bit-identical
    oracle."""
    corners = world.rects_customer(spark, sf_dir).selectExpr(
        "CAST(rid AS STRING) AS cat",
        "explode(array(array(cx - hw, cy - hh), array(cx + hw, cy - hh), "
        "array(cx + hw, cy + hh), array(cx - hw, cy + hh))) AS pt",
    ).selectExpr("cat", "pt[0] AS x", "pt[1] AS y")
    return transforms_geom.max_inscribed_rects(corners)


@_register("tps_interpolation")
def q_tps_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPSProcess per category: thin-plate spline (r^2 ln r + affine) fit
    on control points (pid % 7 = 0), evaluated at the rest (rows-only;
    affine-exactness + control reproduction in pytest)."""
    pts = world.points_part(spark, sf_dir).selectExpr(
        "CAST(pid % 4 AS STRING) AS cat", "pid", "x", "y",
        "CASE WHEN pid % 7 = 0 THEN 1 ELSE 0 END AS is_ctl",
        "CAST(CAST(FLOOR(val) AS BIGINT) % 1000 AS DOUBLE) AS v",
    )
    return transforms_geom.tps_interpolation_groups(pts)


_MBC_RECTS_ORACLE = f"""
{world.oracle_cte('rects_customer')}
SELECT rid,
       CAST(FLOOR(SQRT(hw * hw + hh * hh) * 1000000.0 + 0.5) AS BIGINT)
           AS r_um,
       TRUE AS mbc_ok
FROM rects_customer
"""


@_register("min_bounding_circle_rects", _MBC_RECTS_ORACLE)
def q_min_bounding_circle_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welzl kernel against a CLOSED-FORM answer: each customer rect's 4
    corners rotated by a per-rid angle about (cx, cy) — the minimum
    enclosing circle of a rectangle is its circumscribed circle, center
    (cx, cy), radius sqrt(hw^2 + hh^2), invariant under rotation. Both
    engines compute the um-quantized radius from the same layer doubles
    (IEEE sqrt is correctly rounded -> bit-identical), and mbc_ok compares
    the kernel's center/radius to the closed form; the oracle predicts
    TRUE for every rid. Complements the rows-only per-category events
    variant (`min_bounding_circle`) whose optimum has no closed form.
    Reference: GT/transformation/MinimumBoundingCircleFC.java."""
    rects = world.rects_customer(spark, sf_dir)
    corners = rects.selectExpr(
        "rid", "cx", "cy", "hw", "hh",
        "CAST(rid % 157 AS DOUBLE) * 0.02 AS th",
    ).selectExpr(
        "rid", "cx", "cy", "hw", "hh", "th",
        "stack(4, -1.0D, -1.0D, 1.0D, -1.0D, 1.0D, 1.0D, -1.0D, 1.0D) "
        "AS (ux, uy)",
    ).selectExpr(
        "CAST(rid AS STRING) AS cat",
        "cx + ux * hw * COS(th) - uy * hh * SIN(th) AS x",
        "cy + ux * hw * SIN(th) + uy * hh * COS(th) AS y",
    )
    mbc = transforms_geom.min_bounding_circles(corners, "cat")
    return mbc.join(
        rects.selectExpr("CAST(rid AS STRING) AS cat", "rid", "cx", "cy",
                         "hw", "hh"),
        "cat",
    ).selectExpr(
        "rid",
        "CAST(FLOOR(SQRT(hw * hw + hh * hh) * 1000000.0 + 0.5) AS BIGINT) "
        "AS r_um",
        "(ABS(mbc_r - SQRT(hw * hw + hh * hh)) < 0.0001 AND "
        "ABS(mbc_x - cx) < 0.0001 AND ABS(mbc_y - cy) < 0.0001) AS mbc_ok",
    )


# Affine-exact interpolation companions: a TIN (linear barycentric) and a
# TPS (r^2 ln r + affine) both reproduce an affine field v = a + b*x + c*y
# EXACTLY when the controls carry affine values — so seeding a synthetic
# control grid that strictly contains the world turns both rows-only
# kernels into hash-gated queries with a closed-form oracle. The affine
# closed form is evaluated from the same layer doubles on both engines
# (IEEE arithmetic -> bit-identical), and the ok flag pins the kernel
# output to it at 1e-3 (kernel reproduction error is ~1e-9, pytest).
_AFFINE_V = "(2.0 + 0.25 * x - 0.125 * y)"
_AFFINE_ORACLE = f"""
{world.oracle_cte('points_part')}
SELECT pid,
       CAST(FLOOR({_AFFINE_V} * 1000000.0 + 0.5) AS BIGINT) AS v_um,
       TRUE AS iv_ok
FROM points_part
"""


def _affine_interp_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query points (part layer, is_ctl=0) + per-category control grid
    (5x5 over [-10, 1010]^2, is_ctl=1) carrying the affine field; interior
    grid points get a small deterministic jitter to break the regular
    grid's co-circular Delaunay degeneracies while the boundary stays
    exact (the hull must contain every part point)."""
    qry = world.points_part(spark, sf_dir).selectExpr(
        "CAST(pid % 2 AS STRING) AS cat", "pid", "x", "y",
        "0 AS is_ctl", "CAST(0.0 AS DOUBLE) AS v",
    )
    ctl = spark.range(50).selectExpr(
        "CAST(id % 2 AS STRING) AS cat",
        "-(id + 1) AS pid",
        "CAST(id DIV 2 AS BIGINT) AS g",
    ).selectExpr(
        "cat", "pid",
        "-10.0 + CAST(g DIV 5 AS DOUBLE) * 255.0 + "
        "CASE WHEN g DIV 5 IN (0, 4) OR g % 5 IN (0, 4) THEN 0.0 "
        "ELSE CAST(g % 7 AS DOUBLE) * 0.013 END AS x",
        "-10.0 + CAST(g % 5 AS DOUBLE) * 255.0 + "
        "CASE WHEN g DIV 5 IN (0, 4) OR g % 5 IN (0, 4) THEN 0.0 "
        "ELSE CAST(g % 5 AS DOUBLE) * 0.011 END AS y",
    ).selectExpr(
        "cat", "pid", "x", "y", "1 AS is_ctl",
        f"CAST({_AFFINE_V} AS DOUBLE) AS v",
    )
    return qry.unionByName(ctl)


def _affine_interp_gate(interp: DataFrame, spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    pts = world.points_part(spark, sf_dir).select("pid", "x", "y")
    return interp.select("pid", "iv").join(pts, "pid").selectExpr(
        "pid",
        f"CAST(FLOOR({_AFFINE_V} * 1000000.0 + 0.5) AS BIGINT) AS v_um",
        f"ABS(iv - {_AFFINE_V}) < 0.001 AS iv_ok",
    )


@_register("tin_affine_grid", _AFFINE_ORACLE)
def q_tin_affine_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TINInterpolationProcess against a CLOSED-FORM answer: barycentric
    interpolation over the Delaunay TIN of affine-valued controls is
    affine-exact per triangle, so every part point interpolates to
    v = 2 + 0.25x - 0.125y (um-quantized oracle; iv_ok pins the kernel at
    1e-3). Complements the rows-only integer-field `tin_interpolation`.
    Reference: GT/gridcoverage/TINInterpolationProcess."""
    return _affine_interp_gate(
        transforms_geom.tin_interpolation_groups(
            _affine_interp_input(spark, sf_dir)),
        spark, sf_dir)


@_register("tps_affine_grid", _AFFINE_ORACLE)
def q_tps_affine_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPSProcess against a CLOSED-FORM answer: the thin-plate spline's
    radial weights vanish for affine control values (pytest pins
    |w| < 1e-10), leaving the exact affine part — every part point
    interpolates to v = 2 + 0.25x - 0.125y. Same oracle/ok contract as
    `tin_affine_grid`; complements the rows-only `tps_interpolation`.
    Reference: GT/gridcoverage/RasterInterpolationTPSOperation."""
    return _affine_interp_gate(
        transforms_geom.tps_interpolation_groups(
            _affine_interp_input(spark, sf_dir)),
        spark, sf_dir)


# ---------------------------------------------------------------------------
# Gate ordering: the external driver samples a CAPPED PREFIX of this
# registry (50 queries in round 1), so registration order decides which
# operators get hard driver-oracle verification. The priority list below
# front-loads one representative per SURVEY §2 operator FAMILY (sources,
# calculators, transformers, joins, overlay, binning, global/local stats,
# distribution, raster, classify, cluster, LLM-pipeline ops) — queries
# already green in CORRECTNESS_r01 rotate out in favour of families the
# round-1 sample never reached. Everything stays registered; only the
# order changes.
# ---------------------------------------------------------------------------

# Round-4 rotation: rounds 1-3 drove 126 distinct queries through the hard
# gate (CORRECTNESS_r01 + _r02 + _r03); this prefix holds ONLY the 53
# registered queries the driver has never hash-verified — the round-4
# operators first (CRS reprojection, float-DEM GeoTIFF, multi-ring
# shapefiles, auto-salted PIP, near-dup clusters, Jenks, the new
# closed-form kernel companions), then the round-3 tail the 49-query
# sample never reached, then the rows-only kernels (weaker rows check).
# After this round every registered query has at least one driver
# verification; the repo's own full gate (tools/check_oracle.py, published
# as CORRECTNESS_full_r4.json) covers all registered queries every round.
_GATE_PRIORITY = [
    # newest in round 4 (oracle-backed): training-pipeline + spatial x image
    "pq_codes", "pq_adc_topk", "ann_topk_ivfpq", "doc_quality_gopher", "pq_codes_packed",
    "ring_map_cells", "ring_map_anchors", "circle_map_circles",
    "circle_map_anchors", "sessionize_events",
    "wds_roundtrip_meta", "wds_roundtrip_pixels", "image_augment_chain",
    "image_train_split", "image_diversity", "image_shard_plan",
    "image_quadkey_rollup", "images_in_zones", "image_dedup_canonical",
    "split_zone_balance", "split_leakage_audit", "caption_collision_audit",
    # new in round 4 (oracle-backed)
    "utm_forward_points", "utm_roundtrip_points", "merc_roundtrip_points",
    "albers_roundtrip_points",
    "tif_roundtrip_dem", "shp_roundtrip_donuts", "pip_count_skew_salted",
    "neardup_clusters", "classify_jenks", "median_center", "simplify_dp",
    "min_rotated_rect_rects", "eliminate_slivers", "kernel_density_tricube",
    "local_sa_overlay", "min_bounding_circle_rects", "tin_affine_grid",
    "tps_affine_grid", "image_resize_const", "image_resize_identity",
    "frame_sample_stride2", "image_flip_h", "image_flip_v", "image_rot90",
    "image_center_crop", "image_channel_stats", "image_patchify",
    "image_grayscale", "image_histogram", "image_pad_square",
    "image_exact_dedup", "image_ar_buckets", "image_brightness_filter",
    "video_temporal_diff", "caption_token_stats", "image_nn_resize",
    # round-3 tail the 49-query sample never reached (oracle-backed)
    "triangular_grid_40", "circular_grid_25", "classify_equal_interval",
    "classify_std_dev", "hub_lines_by_id", "raster_ndvi",
    "extract_values_points", "discrete_voronoi", "point_density_grid",
    "raster_profile", "random_points", "raster_cutfill", "wind_rose_8",
    "flow_map_od", "knn_circle_k6", "focal_curvature", "focal_flow_d8",
    "single_sided_buffers", "variable_buffers", "split_polygon_by_count",
    "force_dimension_3d", "raster_highlow", "raster_local_algebra",
    "random_points_per_feature", "radial_los", "ring_map",
    "polygons_along_lines",
    # rows-only kernels (driver records a rows check; pytest invariants)
    "rasterize_tiles_lossy", "min_bounding_circle", "min_rotated_rect",
    "delaunay_groups", "concave_hull_groups", "thiessen_polygons",
    "tin_interpolation", "max_inscribed_rect", "tps_interpolation",
]


def _reorder_gate() -> None:
    assert all(n in QUERIES for n in _GATE_PRIORITY), [
        n for n in _GATE_PRIORITY if n not in QUERIES
    ]
    rest = [n for n in QUERIES if n not in _GATE_PRIORITY]
    ordered = _GATE_PRIORITY + rest
    q = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(q)
    o = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o)


_reorder_gate()
