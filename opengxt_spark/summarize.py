"""Aggregation operators: summary statistics, dissolve, z-scores, Pearson.

Reference parity:
- ``statistics_features`` <- DataStatisticsOperation.java:52 +
  StatisticsVisitor.java:43-158 (Count/Sum/Mean/Min/Max/Range/Std/Var;
  First/Last are iteration-order artifacts of the single-threaded reference
  and are not reproduced)
- ``dissolve``            <- DissolveOperation.java:74-169 (groupBy +
  geometric union + per-group stats; geometry union is represented by the
  group envelope — exact polygon union needs a geometry kernel, see
  geomlib.py)
- ``standardized_scores`` <- StandardizedScoresOperation.java:44
- ``pearson``             <- PearsonOperation.java:44

All are single-scan Spark aggregates with map-side partial combine — the
reference's per-row visitor accumulation (StatisticsVisitor.visit) is exactly
a fold, which Spark distributes for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def statistics_features(
    df: DataFrame, value_cols: list[str], group_by: list[str] | None = None
) -> DataFrame:
    """Multi-field summary statistics, optionally grouped.

    Output per field f: f_cnt, f_sum, f_avg, f_min, f_max, f_range, f_std,
    f_var (doubles rounded for cross-engine stability).
    """
    aggs = []
    for c in value_cols:
        v = F.col(c)
        aggs += [
            F.count(v).alias(f"{c}_cnt"),
            F.round(F.sum(v), 2).alias(f"{c}_sum"),
            F.round(F.avg(v), 6).alias(f"{c}_avg"),
            F.round(F.min(v), 6).alias(f"{c}_min"),
            F.round(F.max(v), 6).alias(f"{c}_max"),
            F.round(F.max(v) - F.min(v), 6).alias(f"{c}_range"),
            F.round(F.stddev_samp(v), 6).alias(f"{c}_std"),
            F.round(F.var_samp(v), 4).alias(f"{c}_var"),
        ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def dissolve(
    df: DataFrame,
    dissolve_field: str,
    stat_cols: list[str],
    xmin: str = "xmin",
    ymin: str = "ymin",
    xmax: str = "xmax",
    ymax: str = "ymax",
) -> DataFrame:
    """GroupBy + geometric union (envelope representation) + summary stats.

    The reference unions group geometries via CascadedPolygonUnion
    (DissolveOperation.java:120-121); with parametric geometries we emit the
    union's envelope (exact for the reference's contract of "one geometry per
    group") plus count and per-column sums/means, all map-side combinable.
    """
    aggs = [
        F.count(F.lit(1)).alias("cnt"),
        F.min(xmin).alias("uxmin"),
        F.min(ymin).alias("uymin"),
        F.max(xmax).alias("uxmax"),
        F.max(ymax).alias("uymax"),
    ]
    for c in stat_cols:
        aggs += [
            F.round(F.sum(c), 2).alias(f"{c}_sum"),
            F.round(F.avg(c), 6).alias(f"{c}_avg"),
        ]
    return df.groupBy(dissolve_field).agg(*aggs)


def standardized_scores(
    df: DataFrame, value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-row z-score (x - mean)/stddev of a column.

    Broadcast the 1-row global aggregate and join — the distributed
    equivalent of the reference's two-pass visitor. stddev is sample stddev
    (the reference's StatisticsVisitor uses n-1).
    """
    stats = df.agg(
        F.avg(value_col).alias("_mu"), F.stddev_samp(value_col).alias("_sd")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, F.round((F.col(value_col) - F.col("_mu")) / F.col("_sd"), 6))
        .drop("_mu", "_sd")
    )


def pearson(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson correlation r between two fields -> one row (r)."""
    return df.agg(F.round(F.corr(col_a, col_b), 6).alias("r"))
