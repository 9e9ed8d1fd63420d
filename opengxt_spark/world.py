"""Synthetic spatial world derived deterministically from the driver's tables.

The driver supplies TPC-H-ish parquet (region nation customer supplier part
orders lineitem events documents embeddings) but no geometry. We place every
row on a [0, 1000) x [0, 1000) plane with pure-arithmetic formulas. The SAME
SQL fragment text runs in Spark SQL (`F.expr`) and in the DuckDB oracle, so
spatial columns match bit-for-bit across engines — the foundation of the
driver's value-hash correctness gate.

Layers (mirroring the reference's test fixtures, FIXTURES.md):
- ``points_events``  — point layer from `events`   (largest; drives joins/stats)
- ``points_part``    — second point layer from `part` (kNN/near targets)
- ``rects_customer`` — axis-aligned rectangle polygons from `customer`
- ``hex_supplier``   — flat-top hexagon polygons from `supplier`

Rectangles/hexagons are *parametric* polygons with closed-form containment, so
point-in-polygon never leaves the JVM. The generic-polygon path (numpy
ray-casting over vertex arrays) lives in ``geomlib.py``.

Reference parity: OpenGXT models layers as SimpleFeatureCollections with one
geometry column (SURVEY.md §1.1); our layers are DataFrames with (x, y) or
(cx, cy, params) columns — same information, columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORLD_SIZE = 1000.0  # plane is [0, WORLD_SIZE)^2
SQRT3 = 1.7320508075688772
HALF_SQRT3 = 0.8660254037844386

# Knuth multiplicative-hash constants; id * K stays < 2^63 for ids < ~3.4e9.
_KX = 2654435761
_KY = 1597334677


def dlit(v: float) -> str:
    """Float literal for shared SQL fragments. DuckDB parses bare ``25.0`` as
    DECIMAL and does exact decimal arithmetic, silently diverging from
    Spark's IEEE doubles; an explicit cast pins both engines to the same
    double (decimal->double conversion is correctly rounded)."""
    return f"CAST({v!r} AS DOUBLE)"


def with_layers(sql: str, *layers: str) -> str:
    """Prepend layer CTEs to a query, merging with an existing WITH clause."""
    body = sql.lstrip()
    if body[:4].upper() == "WITH":
        return oracle_cte(*layers) + ",\n" + body[4:]
    return oracle_cte(*layers) + "\n" + body


def pxi_sql(id_col: str) -> str:
    """Integer millicoordinate in [0, 1e6): exact-sum workhorse (ix = 1000x).

    The quadratic scramble term breaks the rank-1 lattice structure a pure
    multiplicative hash would produce (a Weyl lattice has a large minimum
    pair distance, which starves distance-band statistics at small n)."""
    return (
        f"((({id_col}) * {_KX} + ((({id_col}) * ({id_col})) % 1000003) * 7919) "
        "% 1000000)"
    )


def pyi_sql(id_col: str) -> str:
    return (
        f"(((({id_col}) + 7) * {_KY} "
        f"+ (((({id_col}) + 3) * (({id_col}) + 3)) % 999983) * 104729) "
        "% 1000000)"
    )


def px_sql(id_col: str) -> str:
    """x coordinate in [0, 1000): identical text for Spark SQL and DuckDB."""
    return f"(CAST({pxi_sql(id_col)} AS DOUBLE) / 1000.0)"


def py_sql(id_col: str) -> str:
    """y coordinate in [0, 1000)."""
    return f"(CAST({pyi_sql(id_col)} AS DOUBLE) / 1000.0)"


def int_weight_sql(value_col: str) -> str:
    """Integer weight from a double column — FLOOR first because Spark CAST
    truncates while DuckDB CAST rounds; FLOOR+CAST is identical in both."""
    return f"CAST(FLOOR(ABS({value_col}) * 100.0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Layer SQL (shared verbatim between Spark temp views and DuckDB oracle CTEs)
# ---------------------------------------------------------------------------

POINTS_EVENTS_SQL = (
    "SELECT event_id AS pid, "
    f"{px_sql('event_id')} AS x, "
    f"{py_sql('event_id')} AS y, "
    f"CAST({pxi_sql('event_id')} AS BIGINT) AS ix, "
    f"CAST({pyi_sql('event_id')} AS BIGINT) AS iy, "
    f"{int_weight_sql('value')} AS w, "
    "value AS val, event_type AS cat "
    "FROM events"
)

# Random segment layer (for directional mean / hub lines / clipping): one
# SHORT segment per order — start from a scramble, end within ±60 units.
# Short segments keep bbox cell covers O(1) (a world-spanning segment would
# degrade every cell join it appears in) and keep line-line intersection
# counts at gate-friendly sizes.
LINES_ORDERS_SQL = (
    "SELECT o_orderkey AS lid, "
    f"{px_sql('o_orderkey * 13 + 101')} AS x1, "
    f"{py_sql('o_orderkey * 13 + 101')} AS y1, "
    f"({px_sql('o_orderkey * 13 + 101')} "
    f" + CAST({pxi_sql('o_orderkey * 17 + 303')} % 120000 AS DOUBLE) / 1000.0 "
    " - 60.0) AS x2, "
    f"({py_sql('o_orderkey * 13 + 101')} "
    f" + CAST({pyi_sql('o_orderkey * 17 + 303')} % 120000 AS DOUBLE) / 1000.0 "
    " - 60.0) AS y2 "
    "FROM orders"
)

POINTS_PART_SQL = (
    "SELECT p_partkey AS pid, "
    f"{px_sql('p_partkey * 3 + 500001')} AS x, "
    f"{py_sql('p_partkey * 5 + 700003')} AS y, "
    f"CAST({pxi_sql('p_partkey * 3 + 500001')} AS BIGINT) AS ix, "
    f"CAST({pyi_sql('p_partkey * 5 + 700003')} AS BIGINT) AS iy, "
    "p_retailprice AS val "
    "FROM part"
)

RECTS_CUSTOMER_SQL = (
    "SELECT c_custkey AS rid, "
    f"{px_sql('c_custkey')} AS cx, "
    f"{py_sql('c_custkey')} AS cy, "
    "CAST(5 + (c_custkey % 11) AS DOUBLE) AS hw, "
    "CAST(5 + (c_custkey % 7) AS DOUBLE) AS hh, "
    "c_mktsegment AS seg, c_acctbal AS bal "
    "FROM customer"
)

HEX_SUPPLIER_SQL = (
    "SELECT s_suppkey AS hid, "
    f"{px_sql('s_suppkey * 11 + 900007')} AS cx, "
    f"{py_sql('s_suppkey * 13 + 110011')} AS cy, "
    "CAST(20 + (s_suppkey % 5) * 10 AS DOUBLE) AS r, "
    "s_acctbal AS bal "
    "FROM supplier"
)

# Second rectangle layer (for overlay operators) and second segment layer
# (for line-line intersections).
RECTS_ORDERS_SQL = (
    "SELECT o_orderkey AS rid, "
    f"{px_sql('o_orderkey * 19 + 404009')} AS cx, "
    f"{py_sql('o_orderkey * 23 + 505011')} AS cy, "
    "CAST(4 + (o_orderkey % 9) AS DOUBLE) AS hw, "
    "CAST(4 + (o_orderkey % 13) AS DOUBLE) AS hh, "
    "o_orderpriority AS pri "
    "FROM orders"
)

LINES_PART_SQL = (
    "SELECT p_partkey AS lid, "
    f"{px_sql('p_partkey * 29 + 606013')} AS x1, "
    f"{py_sql('p_partkey * 29 + 606013')} AS y1, "
    f"({px_sql('p_partkey * 29 + 606013')} "
    f" + CAST({pxi_sql('p_partkey * 31 + 707017')} % 120000 AS DOUBLE) / 1000.0 "
    " - 60.0) AS x2, "
    f"({py_sql('p_partkey * 29 + 606013')} "
    f" + CAST({pyi_sql('p_partkey * 31 + 707017')} % 120000 AS DOUBLE) / 1000.0 "
    " - 60.0) AS y2 "
    "FROM part"
)

LAYER_SQL = {
    "points_events": POINTS_EVENTS_SQL,
    "points_part": POINTS_PART_SQL,
    "rects_customer": RECTS_CUSTOMER_SQL,
    "hex_supplier": HEX_SUPPLIER_SQL,
    "lines_orders": LINES_ORDERS_SQL,
    "rects_orders": RECTS_ORDERS_SQL,
    "lines_part": LINES_PART_SQL,
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def rect_contains_sql(x: str, y: str) -> str:
    """Closed-form containment of (x, y) in rect (cx, cy, hw, hh).

    Reference: point-in-polygon refine in
    GT/operations/PointsInPolygonOperation.java:87 — here a pure SQL predicate
    so Catalyst keeps it inside whole-stage codegen.
    """
    return (
        f"({x} >= cx - hw AND {x} <= cx + hw AND "
        f"{y} >= cy - hh AND {y} <= cy + hh)"
    )


def hex_contains_sql(x: str, y: str) -> str:
    """Closed-form containment in a flat-top hexagon (cx, cy, circumradius r)."""
    return (
        f"(ABS({x} - cx) <= r AND ABS({y} - cy) <= {HALF_SQRT3} * r AND "
        f"{HALF_SQRT3} * ABS({x} - cx) + 0.5 * ABS({y} - cy) <= {HALF_SQRT3} * r)"
    )


def oracle_cte(*layers: str) -> str:
    """WITH-clause text for the DuckDB oracle, e.g. ``oracle_cte('points_events')``."""
    parts = [f"{name} AS ({LAYER_SQL[name]})" for name in layers]
    return "WITH " + ",\n".join(parts)


# ---------------------------------------------------------------------------
# Spark-side loaders
# ---------------------------------------------------------------------------


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver parquet tables as temp views (idempotent)."""
    from . import planner

    planner.set_source_epoch(sf_dir)
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def register_layers(spark: SparkSession, sf_dir: str) -> None:
    """Register base tables AND the synthetic layers as temp views, so gate
    queries can run one shared SQL text on both Spark and DuckDB."""
    register_tables(spark, sf_dir)
    for name, sql in LAYER_SQL.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")


def load_layer(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a synthetic spatial layer by running the shared SQL in Spark."""
    register_tables(spark, sf_dir)
    return spark.sql(LAYER_SQL[name])


def points_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_layer(spark, sf_dir, "points_events")


def points_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_layer(spark, sf_dir, "points_part")


def rects_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_layer(spark, sf_dir, "rects_customer")


def hex_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_layer(spark, sf_dir, "hex_supplier")


def rect_corners(df: DataFrame) -> DataFrame:
    """Materialize rect extent columns (xmin/xmax/ymin/ymax) for cell cover."""
    return (
        df.withColumn("xmin", F.col("cx") - F.col("hw"))
        .withColumn("xmax", F.col("cx") + F.col("hw"))
        .withColumn("ymin", F.col("cy") - F.col("hh"))
        .withColumn("ymax", F.col("cy") + F.col("hh"))
    )


def hex_extent(df: DataFrame) -> DataFrame:
    """Bounding box of a flat-top hexagon layer (for cell cover)."""
    return (
        df.withColumn("xmin", F.col("cx") - F.col("r"))
        .withColumn("xmax", F.col("cx") + F.col("r"))
        .withColumn("ymin", F.col("cy") - HALF_SQRT3 * F.col("r"))
        .withColumn("ymax", F.col("cy") + HALF_SQRT3 * F.col("r"))
    )
