"""Spatial-distribution descriptors (SURVEY.md §2.8).

All are single-pass aggregates over the point layers — the reference's
per-row visitor accumulations (distribution/*Visitor.java) distributed as
map-side-combinable sums. Exact-parity discipline: coordinate sums run over
the layers' integer millicoordinates (ix, iy = 1000x exact), so every
reduction is order-free; scalar double math happens once in shared-text
stage fragments (Spark F.expr == DuckDB text).

Reference parity:
- ``mean_center``       <- MeanCenterOperation.java:44 / MeanCenterVisitor
- ``standard_distance`` <- StandardDistanceOperation.java:45 +
  DistanceFactory.getStandardDistance (:201-230): sqrt(sum w*((x-mx)^2 +
  (y-my)^2) / sum w) * n_std
- ``std_dev_ellipse``   <- StandardDeviationalEllipseOperation.java:46 +
  StandardDeviationalEllipse.calculateSDE (:91-145): covariance rotation,
  sqrt(2)-scaled semi-axes
- ``directional_mean``  <- LinearDirectionalMeanOperation.java:44 +
  LinearDirectionalMean (:44-150): mean segment direction, circular variance
- ``central_feature``   <- CentralFeatureOperation.java:45 (argmin of total
  distance to all others — pair aggregation, not an O(n^2) driver loop)
- ``median_center``     <- MedianCenterOperation.java:45 (Weiszfeld
  iteration: a short driver loop over cached 1-row aggregates)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .binning import stages_to_subquery
from .world import dlit

SQRT2 = 1.4142135623730951
PI = 3.141592653589793


def apply_stages(df: DataFrame, stages: list[tuple[str, str]]) -> DataFrame:
    for name, sql in stages:
        df = df.withColumn(name, F.expr(sql))
    return df


# --- mean center ------------------------------------------------------------

MEAN_CENTER_AGG = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(w) AS BIGINT) AS sw, "
    "CAST(SUM(w * ix) AS BIGINT) AS swx, "
    "CAST(SUM(w * iy) AS BIGINT) AS swy, "
    "CAST(SUM(ix) AS BIGINT) AS sx, CAST(SUM(iy) AS BIGINT) AS sy"
)

MEAN_CENTER_STAGES = [
    ("mean_x", "CAST(sx AS DOUBLE) / 1000.0 / n"),
    ("mean_y", "CAST(sy AS DOUBLE) / 1000.0 / n"),
    ("wmean_x", "CAST(swx AS DOUBLE) / 1000.0 / CAST(sw AS DOUBLE)"),
    ("wmean_y", "CAST(swy AS DOUBLE) / 1000.0 / CAST(sw AS DOUBLE)"),
]


def mean_center(points: DataFrame, case_col: str | None = None) -> DataFrame:
    """(Weighted) mean center, optionally per case group."""
    agg = [
        F.expr(e)
        for e in (
            "CAST(COUNT(*) AS BIGINT) AS n",
            "CAST(SUM(w) AS BIGINT) AS sw",
            "CAST(SUM(w * ix) AS BIGINT) AS swx",
            "CAST(SUM(w * iy) AS BIGINT) AS swy",
            "CAST(SUM(ix) AS BIGINT) AS sx",
            "CAST(SUM(iy) AS BIGINT) AS sy",
        )
    ]
    base = points.groupBy(case_col).agg(*agg) if case_col else points.agg(*agg)
    out = apply_stages(base, MEAN_CENTER_STAGES)
    keep = ([F.col(case_col)] if case_col else []) + [
        F.col("n"),
        F.round("mean_x", 6).alias("mean_x"),
        F.round("mean_y", 6).alias("mean_y"),
        F.round("wmean_x", 6).alias("wmean_x"),
        F.round("wmean_y", 6).alias("wmean_y"),
    ]
    return out.select(*keep)


# --- standard distance ------------------------------------------------------

SD_STAGES = [
    ("nD", "CAST(n AS DOUBLE)"),
    ("mx", "CAST(sx AS DOUBLE) / 1000.0 / nD"),
    ("my", "CAST(sy AS DOUBLE) / 1000.0 / nD"),
    # sum (x-mx)^2 = sum x^2 - n mx^2, from exact integer sums of ix^2
    (
        "sd",
        "SQRT((CAST(sxx AS DOUBLE) / 1000000.0 - nD * mx * mx "
        "+ CAST(syy AS DOUBLE) / 1000000.0 - nD * my * my) / nD)",
    ),
]


def standard_distance(points: DataFrame, n_std: float = 1.0) -> DataFrame:
    """Standard-distance circle: center + radius (unweighted; the weighted
    variant swaps in w-sums as in mean_center)."""
    base = points.agg(
        F.expr("CAST(COUNT(*) AS BIGINT) AS n"),
        F.expr("CAST(SUM(ix) AS BIGINT) AS sx"),
        F.expr("CAST(SUM(iy) AS BIGINT) AS sy"),
        F.expr("CAST(SUM(ix * ix) AS BIGINT) AS sxx"),
        F.expr("CAST(SUM(iy * iy) AS BIGINT) AS syy"),
    )
    out = apply_stages(base, SD_STAGES)
    return out.select(
        "n",
        F.round("mx", 6).alias("mx"),
        F.round("my", 6).alias("my"),
        F.round(F.col("sd") * n_std, 6).alias("std_dist"),
    )


# --- standard deviational ellipse -------------------------------------------

SDE_STAGES = [
    ("nD", "CAST(n AS DOUBLE)"),
    ("mx", "CAST(sx AS DOUBLE) / 1000.0 / nD"),
    ("my", "CAST(sy AS DOUBLE) / 1000.0 / nD"),
    ("sig_x", "CAST(sxx AS DOUBLE) / 1000000.0 - nD * mx * mx"),
    ("sig_y", "CAST(syy AS DOUBLE) / 1000000.0 - nD * my * my"),
    ("sig_xy", "CAST(sxy AS DOUBLE) / 1000000.0 - nD * mx * my"),
    ("denom", "sig_xy * 2.0"),
    ("diff_xy", "sig_x - sig_y"),
    ("sum1", "diff_xy * diff_xy + 4.0 * sig_xy * sig_xy"),
    (
        "arctan_raw",
        "CASE WHEN ABS(denom) > 0.0 THEN ATAN((diff_xy + SQRT(sum1)) / denom) "
        "ELSE 0.0 END",
    ),
    (
        "arctan_v",
        f"CASE WHEN arctan_raw < 0.0 THEN arctan_raw + {dlit(PI / 2.0)} "
        "ELSE arctan_raw END",
    ),
    ("sin_v", "SIN(arctan_v)"),
    ("cos_v", "COS(arctan_v)"),
    ("sxy_sincos", "2.0 * sig_xy * sin_v * cos_v"),
    (
        "se_x",
        f"{dlit(SQRT2)} * SQRT((sig_x * cos_v * cos_v - sxy_sincos "
        "+ sig_y * sin_v * sin_v) / nD)",
    ),
    (
        "se_y",
        f"{dlit(SQRT2)} * SQRT((sig_x * sin_v * sin_v + sxy_sincos "
        "+ sig_y * cos_v * cos_v) / nD)",
    ),
    ("rotation_deg", f"360.0 - arctan_v * {dlit(180.0 / PI)}"),
]


def std_dev_ellipse(points: DataFrame) -> DataFrame:
    """Standard deviational ellipse (1 std): center, semi-axes, rotation.

    Transcription of StandardDeviationalEllipse.calculateSDE:91-139 with
    covariance terms from exact integer sums.
    """
    base = points.agg(
        F.expr("CAST(COUNT(*) AS BIGINT) AS n"),
        F.expr("CAST(SUM(ix) AS BIGINT) AS sx"),
        F.expr("CAST(SUM(iy) AS BIGINT) AS sy"),
        F.expr("CAST(SUM(ix * ix) AS BIGINT) AS sxx"),
        F.expr("CAST(SUM(iy * iy) AS BIGINT) AS syy"),
        F.expr("CAST(SUM(ix * iy) AS BIGINT) AS sxy"),
    )
    out = apply_stages(base, SDE_STAGES)
    return out.select(
        "n",
        F.round("mx", 6).alias("mx"),
        F.round("my", 6).alias("my"),
        F.round("se_x", 6).alias("se_x"),
        F.round("se_y", 6).alias("se_y"),
        F.round("rotation_deg", 6).alias("rotation_deg"),
    )


def sde_oracle_sql(points_base: str) -> str:
    agg = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(ix) AS BIGINT) AS sx, "
        "CAST(SUM(iy) AS BIGINT) AS sy, CAST(SUM(ix * ix) AS BIGINT) AS sxx, "
        "CAST(SUM(iy * iy) AS BIGINT) AS syy, CAST(SUM(ix * iy) AS BIGINT) AS sxy "
        f"FROM ({points_base})"
    )
    nested = stages_to_subquery(agg, SDE_STAGES)
    return (
        "SELECT n, ROUND(mx, 6) AS mx, ROUND(my, 6) AS my, "
        "ROUND(se_x, 6) AS se_x, ROUND(se_y, 6) AS se_y, "
        f"ROUND(rotation_deg, 6) AS rotation_deg FROM {nested}"
    )


def sd_oracle_sql(points_base: str, n_std: float = 1.0) -> str:
    agg = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(ix) AS BIGINT) AS sx, "
        "CAST(SUM(iy) AS BIGINT) AS sy, CAST(SUM(ix * ix) AS BIGINT) AS sxx, "
        f"CAST(SUM(iy * iy) AS BIGINT) AS syy FROM ({points_base})"
    )
    nested = stages_to_subquery(agg, SD_STAGES)
    return (
        "SELECT n, ROUND(mx, 6) AS mx, ROUND(my, 6) AS my, "
        f"ROUND(sd * {dlit(n_std)}, 6) AS std_dist FROM {nested}"
    )


def mean_center_oracle_sql(points_base: str, case_col: str | None = None) -> str:
    body = MEAN_CENTER_AGG.removeprefix("SELECT ")
    if case_col:
        agg = (
            f"SELECT {case_col}, {body} FROM ({points_base}) GROUP BY {case_col}"
        )
        sel = f"{case_col}, "
    else:
        agg = f"SELECT {body} FROM ({points_base})"
        sel = ""
    nested = stages_to_subquery(agg, MEAN_CENTER_STAGES)
    return (
        f"SELECT {sel}n, ROUND(mean_x, 6) AS mean_x, ROUND(mean_y, 6) AS mean_y, "
        f"ROUND(wmean_x, 6) AS wmean_x, ROUND(wmean_y, 6) AS wmean_y FROM {nested}"
    )


# --- directional mean (line layer) ------------------------------------------

DIRMEAN_STAGES = [
    ("nD", "CAST(n AS DOUBLE)"),
    ("radian_angle", "ATAN2(ssin, scos)"),
    ("degree_angle", f"radian_angle * {dlit(180.0 / PI)}"),
    (
        "dir_mean",
        "CASE WHEN 360.0 - degree_angle + 90.0 >= 360.0 "
        "THEN 360.0 - degree_angle + 90.0 - 360.0 "
        "ELSE 360.0 - degree_angle + 90.0 END",
    ),
    ("cir_var", "1.0 - SQRT(ssin * ssin + scos * scos) / nD"),
    ("ave_len", "CAST(slen_u AS DOUBLE) / 1000000.0 / nD"),
]


def directional_mean(segments: DataFrame) -> DataFrame:
    """Mean direction / circular variance / mean length of a segment layer
    (LinearDirectionalMean.java:88-134).

    sin/cos are transcendental (<=1 ulp engine skew) so their sums are
    rounded at 1e-6 before the final scalar math; lengths are summed as
    exact floor(len*1e6) integers.
    """
    per = segments.select(
        F.expr("ATAN2(y2 - y1, x2 - x1)").alias("theta"),
        F.expr(
            "CAST(FLOOR(SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) "
            "* 1000000.0) AS BIGINT)"
        ).alias("len_u"),
    )
    agg = per.agg(
        F.expr("CAST(COUNT(*) AS BIGINT) AS n"),
        F.round(F.sum(F.expr("SIN(theta)")), 6).alias("ssin"),
        F.round(F.sum(F.expr("COS(theta)")), 6).alias("scos"),
        F.expr("CAST(SUM(len_u) AS BIGINT) AS slen_u"),
    )
    out = apply_stages(agg, DIRMEAN_STAGES)
    return out.select(
        "n",
        F.round("dir_mean", 4).alias("dir_mean"),
        F.round("cir_var", 4).alias("cir_var"),
        F.round("ave_len", 4).alias("ave_len"),
    )


def directional_mean_oracle_sql(segments_base: str) -> str:
    per = (
        "SELECT ATAN2(y2 - y1, x2 - x1) AS theta, "
        "CAST(FLOOR(SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) "
        f"* 1000000.0) AS BIGINT) AS len_u FROM ({segments_base})"
    )
    agg = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(SIN(theta)), 6) AS ssin, "
        "ROUND(SUM(COS(theta)), 6) AS scos, CAST(SUM(len_u) AS BIGINT) AS slen_u "
        f"FROM ({per})"
    )
    nested = stages_to_subquery(agg, DIRMEAN_STAGES)
    return (
        "SELECT n, ROUND(dir_mean, 4) AS dir_mean, ROUND(cir_var, 4) AS cir_var, "
        f"ROUND(ave_len, 4) AS ave_len FROM {nested}"
    )


# --- central feature ----------------------------------------------------------


def central_feature(
    points: DataFrame, cell_size: float = 25.0
) -> DataFrame:
    """Feature minimizing total distance to all others
    (CentralFeatureOperation.java:45 — the reference is O(n²) per query).

    Scale plan — **aggregated-cell prune + exact refine** (no crossJoin on
    the full layer):
    1. Aggregate points to grid cells (count + centroid-free cell centers).
    2. For every point, the approximate total Σ̃(p) = Σ_cells cnt·d(p,
       center) — a broadcast join against ~#cells rows, linear in n.
    3. Every per-point distance error is bounded by the half-diagonal
       h = cell_size·√2/2, so S(p) ∈ Σ̃(p) ± n·h; any p with
       Σ̃(p) > min Σ̃ + 2nh provably cannot be the argmin — one plan-time
       scalar prunes the candidate set to the flat bottom of the Σ
       surface.
    4. Exact FLOOR(d·1e6) pair sums (the oracle's arithmetic) run only for
       the surviving candidates (broadcast) against the full layer.
    Result is bit-identical to the all-pairs formulation.
    """
    cs = float(cell_size)
    h = cs * 0.7071067811865476  # half cell diagonal
    pts = points.select("pid", "x", "y")
    cells_agg = pts.groupBy(
        F.floor(F.col("x") / cs).cast("long").alias("cx"),
        F.floor(F.col("y") / cs).cast("long").alias("cy"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    ccx = (F.col("cx") + 0.5) * cs
    ccy = (F.col("cy") + 0.5) * cs
    approx = (
        pts.join(F.broadcast(cells_agg), how="cross")
        .groupBy("pid", "x", "y")
        .agg(
            F.sum(
                F.col("cnt")
                * F.sqrt((F.col("x") - ccx) ** 2 + (F.col("y") - ccy) ** 2)
            ).alias("approx_sum"),
            F.sum("cnt").alias("n_total"),
        )
    )
    row = approx.agg(
        F.min("approx_sum").alias("m"), F.first("n_total").alias("n")
    ).collect()[0]
    thresh = float(row["m"]) + 2.0 * h * float(row["n"])
    cand = approx.where(F.col("approx_sum") <= F.lit(thresh)).select(
        F.col("pid").alias("pid_a"), F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = pts.select(
        F.col("pid").alias("pid_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    pairs = b.join(F.broadcast(cand), how="cross").where(
        F.col("pid_a") != F.col("pid_b")
    )
    sums = pairs.groupBy("pid_a").agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(SQRT((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)) "
            "* 1000000.0) AS BIGINT)) AS BIGINT) AS total_u"
        )
    )
    best = sums.agg(F.min(F.struct("total_u", "pid_a")).alias("_b"))
    return best.select(
        F.col("_b.pid_a").alias("central_pid"),
        F.round(F.col("_b.total_u") / 1e6, 4).alias("total_dist"),
    )


def central_feature_oracle_sql(points_base: str) -> str:
    return f"""
WITH pts AS ({points_base}),
sums AS (
  SELECT a.pid AS pid_a,
         CAST(SUM(CAST(FLOOR(SQRT((a.x - b.x) * (a.x - b.x)
             + (a.y - b.y) * (a.y - b.y)) * 1000000.0) AS BIGINT)) AS BIGINT) AS total_u
  FROM pts a JOIN pts b ON a.pid <> b.pid
  GROUP BY a.pid
)
SELECT pid_a AS central_pid, ROUND(total_u / 1000000.0, 4) AS total_dist
FROM sums ORDER BY total_u ASC, pid_a ASC LIMIT 1
"""


# --- median center (Weiszfeld) ------------------------------------------------


def median_center(points: DataFrame, iterations: int = 20) -> tuple[float, float]:
    """Geometric median via Weiszfeld iteration (MedianCenter.java:36).

    Each step is one distributed aggregate over the cached point layer; the
    ~20-step loop runs on the driver over 1-row results (not per-feature).
    Returns (mx, my).
    """
    pts = points.select("x", "y").persist()
    row = pts.agg(F.avg("x").alias("mx"), F.avg("y").alias("my")).collect()[0]
    mx, my = float(row.mx), float(row.my)
    for _ in range(iterations):
        # dx*dx + dy*dy (not **2 -> pow()): keeps every op IEEE
        # correctly-rounded so the unrolled DuckDB oracle CTE reproduces
        # the iterate to ~1e-14 (only SUM combine order differs).
        dx, dy = F.col("x") - mx, F.col("y") - my
        agg = pts.select(
            (F.lit(1.0) / F.sqrt(dx * dx + dy * dy + F.lit(1e-12))).alias("invd"),
            "x",
            "y",
        ).agg(
            F.sum(F.col("x") * F.col("invd")).alias("sx"),
            F.sum(F.col("y") * F.col("invd")).alias("sy"),
            F.sum("invd").alias("si"),
        ).collect()[0]
        mx, my = float(agg.sx / agg.si), float(agg.sy / agg.si)
    pts.unpersist()
    return mx, my
