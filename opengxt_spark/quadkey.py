"""Hierarchical cell index: Morton/quadkey codes with parent rollups.

The north-star architecture calls for H3/S2-style cell indexing. The
engine's planar world uses a square grid, so the hierarchical index is the
quadtree Morton code — the same parent/child contract H3 and S2 expose
(S2 cell ids ARE a face-local Morton order): cell (cx, cy) at level L gets
the bit-interleaved code ``qk``, and the parent at level L-1 is ``qk DIV
4``. What that buys at 10^12 rows is the ROLLUP: aggregates computed once
at the finest level re-aggregate to every coarser level by integer
division on the key — no second scan of the base table, one tiny shuffle
per level over the (already aggregated) cell rows.

All arithmetic is integer SQL shared verbatim by Spark and DuckDB, so the
gate hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import world

WORLD = 1000.0  # world edge length (SURVEY: [0, 1000)^2)


def morton_sql(cx: str, cy: str, bits: int) -> str:
    """Bit-interleave two ``bits``-wide non-negative ints: x bits land on
    odd positions, y on even. Bit j is extracted as
    ``FLOOR(v / 2^j) % 2`` — plain arithmetic both engines parse and
    evaluate identically (Spark's ``DIV`` and DuckDB's ``//`` don't
    cross-port; FLOOR over exact small-int division does)."""
    terms = []
    for j in range(bits):
        terms.append(
            f"(CAST(FLOOR(({cx}) / {1 << j}) AS BIGINT) % 2) * {1 << (2 * j + 1)}"
        )
        terms.append(
            f"(CAST(FLOOR(({cy}) / {1 << j}) AS BIGINT) % 2) * {1 << (2 * j)}"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def level_cell_sql(coord: str, level: int) -> str:
    """Grid coordinate of ``coord`` at quadtree ``level`` (2^level cells
    across the world edge), clamped to the last cell for the boundary."""
    n = 1 << level
    return (
        f"LEAST(CAST(FLOOR(({coord}) * {n} / {world.dlit(WORLD)}) AS BIGINT), "
        f"{n - 1})"
    )


def point_quadkeys(points: DataFrame, level: int) -> DataFrame:
    """Attach the level-``level`` quadkey to each point (narrow projection,
    no shuffle)."""
    cx = level_cell_sql("x", level)
    cy = level_cell_sql("y", level)
    return points.withColumn("qk", F.expr(morton_sql(cx, cy, level)))


def quadkey_rollup(
    points: DataFrame, fine_level: int = 7, coarse_levels: int = 2
) -> DataFrame:
    """Multi-resolution point counts: ONE base aggregation at
    ``fine_level``, then ``coarse_levels`` parent rollups computed from the
    previous level's cells (qk DIV 4, sum) — never from the points.
    Output (level, qk, cnt, sum_w)."""
    fine = (
        point_quadkeys(points, fine_level)
        .groupBy("qk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("w").cast("long").alias("sum_w"),
        )
        .select(F.lit(fine_level).cast("int").alias("level"), "qk", "cnt", "sum_w")
    )
    out = fine
    cur = fine
    for lvl in range(fine_level - 1, fine_level - 1 - coarse_levels, -1):
        cur = (
            cur.groupBy((F.col("qk") / 4).cast("bigint").alias("qk"))
            .agg(
                F.sum("cnt").cast("long").alias("cnt"),
                F.sum("sum_w").cast("long").alias("sum_w"),
            )
            .select(F.lit(lvl).cast("int").alias("level"), "qk", "cnt", "sum_w")
        )
        out = out.unionByName(cur)
    return out


def quadkey_rollup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = world.points_events(spark, sf_dir).select("x", "y", "w")
    return quadkey_rollup(pts)


def quadkey_rollup_oracle(
    fine_level: int = 7,
    coarse_levels: int = 2,
    layer_cte: str | None = None,
    layer_name: str = "points_events",
    x: str = "x",
    y: str = "y",
    w: str = "w",
) -> str:
    """DuckDB oracle for `quadkey_rollup` over any (x, y, w) source:
    default the events point layer; pass ``layer_cte``/``layer_name`` and
    the column expressions to roll up a different table (e.g. image
    footprints)."""
    cx = level_cell_sql(x, fine_level)
    cy = level_cell_sql(y, fine_level)
    qk = morton_sql(cx, cy, fine_level)
    parts = [
        f"""
SELECT CAST({fine_level} AS INT) AS level, qk, cnt, sum_w FROM fine"""
    ]
    prev = "fine"
    ctes = [
        f"""fine AS (
  SELECT {qk} AS qk, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM({w}) AS BIGINT) AS sum_w
  FROM {layer_name} GROUP BY 1
)"""
    ]
    for i, lvl in enumerate(
        range(fine_level - 1, fine_level - 1 - coarse_levels, -1)
    ):
        name = f"lvl{lvl}"
        ctes.append(
            f"""{name} AS (
  SELECT CAST(qk // 4 AS BIGINT) AS qk, CAST(SUM(cnt) AS BIGINT) AS cnt,
         CAST(SUM(sum_w) AS BIGINT) AS sum_w
  FROM {prev} GROUP BY 1
)"""
        )
        parts.append(
            f"""
SELECT CAST({lvl} AS INT) AS level, qk, cnt, sum_w FROM {name}"""
        )
        prev = name
    layer = world.oracle_cte("points_events") if layer_cte is None else layer_cte
    return (
        layer + ",\n" + ",\n".join(ctes) + "\n" + "\nUNION ALL".join(parts)
    )
