"""Regression — OLS over distributed exact moment sums.

Reference parity: ``ols_simple`` <- GT/relationship/OLSOperation.java:105-145
(the reference solves X'X beta = X'y with EJML and reports R^2, adjusted
R^2, F, and per-coefficient t statistics; its per-feature residual output
corresponds to the ``residuals`` projection here).

Distributed shape (SURVEY.md §2.6): the only cluster-wide work is ONE
partial-aggregated scan producing the moment sums (n, Sx, Sy, Sxx, Syy,
Sxy); the coefficient algebra is a scalar stage chain on a 1-row frame.
At 100 TB: map-side combine -> 1-row result, no shuffle of data rows.

Determinism: inputs are pre-scaled to exact integers (quantity is integral,
extendedprice has 2 decimals -> x100), so every SUM is order-free and the
double arithmetic happens once in shared SQL fragments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .autocorr import zprob_both_sql
from .binning import stages_to_subquery
from . import world

# lineitem: y = extendedprice_cents (exact int), x = quantity (int)
_OLS_BASE_SPARK = (
    "SELECT CAST(l_quantity AS BIGINT) AS xi, "
    "CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS yi FROM lineitem"
)

OLS_STAGES: list[tuple[str, str]] = [
    ("nD", "CAST(n AS DOUBLE)"),
    ("sxD", "CAST(sx AS DOUBLE)"),
    ("syD", "CAST(sy AS DOUBLE)"),
    ("sxx", "CAST(sxx_i AS DOUBLE)"),
    ("syy", "CAST(syy_i AS DOUBLE)"),
    ("sxy", "CAST(sxy_i AS DOUBLE)"),
    ("ssx", "sxx - sxD * sxD / nD"),
    ("ssy", "syy - syD * syD / nD"),
    ("ssxy", "sxy - sxD * syD / nD"),
    ("slope", "ssxy / ssx"),
    ("intercept", "(syD - slope * sxD) / nD"),
    ("r2", "(ssxy * ssxy) / (ssx * ssy)"),
    ("adj_r2", "1.0 - (1.0 - r2) * (nD - 1.0) / (nD - 2.0)"),
    ("sse", "ssy - slope * ssxy"),
    ("mse", "sse / (nD - 2.0)"),
    ("f_stat", "(ssy - sse) / mse"),
    ("se_slope", "SQRT(mse / ssx)"),
    ("t_slope", "slope / se_slope"),
    ("p_slope", zprob_both_sql("t_slope")),
]


def ols_simple(spark, sf_dir: str) -> DataFrame:
    """Simple OLS of lineitem extendedprice (cents) on quantity.

    One row: slope/intercept (cents units), R^2, adjusted R^2, F, t and
    normal-approx p for the slope (the reference uses the t distribution;
    at gate n the normal approximation is equal to 6 decimals).
    """
    from .binning import apply_stages

    world.register_tables(spark, sf_dir)
    base = spark.sql(_OLS_BASE_SPARK)
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").cast("long").alias("sx"),
        F.sum("yi").cast("long").alias("sy"),
        F.sum(F.expr("xi * xi")).cast("long").alias("sxx_i"),
        F.sum(F.expr("yi * yi")).cast("long").alias("syy_i"),
        F.sum(F.expr("xi * yi")).cast("long").alias("sxy_i"),
    )
    out = apply_stages(agg, OLS_STAGES)
    return out.select(
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        F.round("r2", 6).alias("r2"),
        F.round("adj_r2", 6).alias("adj_r2"),
        F.round("f_stat", 4).alias("f_stat"),
        F.round("t_slope", 4).alias("t_slope"),
        F.round("p_slope", 6).alias("p_slope"),
    )


def ols_oracle() -> str:
    nested = stages_to_subquery("SELECT * FROM agg", OLS_STAGES)
    return f"""
WITH base AS ({_OLS_BASE_SPARK}),
agg AS (SELECT COUNT(*) AS n, CAST(SUM(xi) AS BIGINT) AS sx,
        CAST(SUM(yi) AS BIGINT) AS sy,
        CAST(SUM(xi * xi) AS BIGINT) AS sxx_i,
        CAST(SUM(yi * yi) AS BIGINT) AS syy_i,
        CAST(SUM(xi * yi) AS BIGINT) AS sxy_i FROM base)
SELECT ROUND(slope, 6) AS slope, ROUND(intercept, 4) AS intercept,
       ROUND(r2, 6) AS r2, ROUND(adj_r2, 6) AS adj_r2,
       ROUND(f_stat, 4) AS f_stat, ROUND(t_slope, 4) AS t_slope,
       ROUND(p_slope, 6) AS p_slope
FROM {nested}
"""
