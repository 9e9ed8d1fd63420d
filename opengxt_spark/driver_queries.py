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

from . import joins, world

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

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


_KNN_ORACLE = f"""
{world.oracle_cte('points_events', 'points_part')}
SELECT pid_l, pid_r, dist, knn_rank FROM (
  SELECT l.pid AS pid_l, r.pid AS pid_r,
         ROUND(SQRT((l.x - r.x) * (l.x - r.x)
                  + (l.y - r.y) * (l.y - r.y)), 6) AS dist,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY l.pid
           ORDER BY (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) ASC,
                    r.pid ASC
         ) AS INTEGER) AS knn_rank
  FROM points_events l
  JOIN points_part r
    ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 2500.0
) WHERE knn_rank <= 4
"""


@_register("knn_join_k4_r50", _KNN_ORACLE)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN map join, k=4 within radius 50 (KNearestNeighborMapOperation)."""
    l = world.points_events(spark, sf_dir)
    r = world.points_part(spark, sf_dir)
    out = joins.knn_join(l, r, k=4, radius=50.0, exclude_self=False)
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
