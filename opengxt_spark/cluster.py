"""Spatial cluster detection — Besag-Newell and Openshaw GAM.

Reference parity map (GT = /root/reference/GeoTools/process-spatialstatistics/
src/main/java/org/geotools/process/spatialstatistics):
- ``besag_newell`` <- GT/pattern/ClusterBesagNewellOperation.java:64-175
  (per case point: circle through its k nearest case neighbours, population
  mass inside, Poisson tail test) + GT/pattern/FitnessFunction.java:80-121
  (prob = P(Poisson(expected) >= cases); keep prob <= threshold 0.01;
  Poisson fitness = 1 - prob).
- ``gam`` <- GT/pattern/ClusterGAMOperation.java:91-201 (lattice of
  overlapping circles per radius, step = radius * overlapRatio 0.5, same
  fitness), with AbstractClusterOperation.java:195 density = sum(cases) /
  sum(population) and FitnessFunction.isWorthTesting (expected <= cases,
  expected >= 1, cases >= 1).

Documented narrowing: the reference's kNN probe is an unbounded STRtree
search; here the neighbour search is capped at ``max_radius`` (the 100 TB
contract — an unbounded nearest search cannot cell-partition), and the cap
is applied identically in the DuckDB oracle.

Scale design: the per-circle population/case masses are band aggregations
(interior/boundary cell decomposition via ``band_stats_join``) or
cell-banded pair joins — no all-pairs stage anywhere. The Poisson tail
P(X >= c) = 1 - sum_{j<c} e^-l l^j / j! is evaluated with a
**log-factorial table join** (lf(j) = ln(j!) as a sequential window
cumsum): both Spark and DuckDB compute term_j = exp(-l + j*ln(l) - lf(j))
with the same expression text, keeping the oracle comparable at 6
decimals. The table is 1000 rows (the reference itself caps cases at
MAX_CASES); the join fan-out is rows x avg(cases), linear in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import joins, world
from .world import dlit

MAX_CASES = 1000  # log-factorial table size; reference MAX_CASES analog

#: Shared sub-expressions (identical text in Spark SQL and DuckDB): the
#: case layer is a thinned events subset with small integer case counts,
#: the population layer is points_part with integer population weights
#: (FLOOR before CAST: Spark CAST truncates, DuckDB CAST rounds).
CASE_FILTER = "pid % 20 = 0"
CASE_V = "1 + w % 3"
POP_V = "1 + CAST(FLOOR(val) AS BIGINT) % 7"

#: ln(j!) for j = 0..MAX_CASES-1: cumulative sum of ln(max(i, 1)) — the
#: i = 0 and i = 1 terms are ln(1) = 0, so the inclusive running sum at
#: row j is exactly ln(j!). Sequential window -> identical doubles in
#: both engines.
_LF_BODY = (
    "SELECT j, SUM(LN(CAST(GREATEST(j, 1) AS DOUBLE))) "
    "OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) AS lf FROM {src}"
)
_LF_SQL_DUCK = _LF_BODY.format(
    src=f"(SELECT UNNEST(generate_series(0, {MAX_CASES - 1})) AS j)"
)


def _log_factorial(spark: SparkSession) -> DataFrame:
    return spark.sql(
        _LF_BODY.format(src=f"(SELECT id AS j FROM RANGE(0, {MAX_CASES}))")
    )


def _poisson_filter(circ: DataFrame) -> DataFrame:
    """Attach the Poisson tail to a circle table with (ckey, cases, lam)
    columns and keep the significant rows (prob <= 0.01). Adds columns
    ``prob`` and ``fitness`` (= 1 - prob, the Poisson fitness)."""
    lf = F.broadcast(_log_factorial(circ.sparkSession))
    terms = (
        circ.select("ckey", "cases", "lam")
        .join(lf, F.col("j") <= F.col("cases") - 1)
        .groupBy("ckey")
        .agg(
            F.sum(
                F.expr("EXP(-lam + CAST(j AS DOUBLE) * LN(lam) - lf)")
            ).alias("psum")
        )
    )
    out = circ.join(terms, "ckey")
    return out.where("1.0 - psum <= 0.01").withColumn(
        "fitness", F.col("psum")
    )


#: DuckDB text of the same tail computation, over a CTE named ``circ``
#: with (ckey, cases, lam) and the ``lf`` CTE.
_POISSON_TAIL_DUCK = """
  SELECT c2.ckey AS tkey,
         SUM(EXP(-c2.lam + CAST(lf.j AS DOUBLE) * LN(c2.lam) - lf.lf))
           AS psum
  FROM circ c2
  JOIN lf ON lf.j <= CAST(c2.cases AS BIGINT) - 1
  GROUP BY c2.ckey
"""


def besag_newell(
    events: DataFrame,
    pop: DataFrame,
    neighbours: int = 10,
    max_radius: float = 150.0,
) -> DataFrame:
    """Besag-Newell cluster circles over the synthetic case/pop layers.

    Output: (pid, x, y, radius, cases, population, expected, fitness) for
    circles with Poisson tail prob <= 0.01.
    """
    cases = events.where(CASE_FILTER).selectExpr(
        "pid", "x", "y", f"CAST({CASE_V} AS BIGINT) AS case_v"
    )
    popl = pop.selectExpr(
        "pid", "x", "y", f"CAST({POP_V} AS BIGINT) AS pop_v"
    )

    # k nearest case neighbours within the cap (excluding self): circle
    # radius^2 = max d2 of the set; cases = neighbour case mass.
    knn = joins.knn_join(
        cases, cases, k=neighbours, radius=max_radius, exclude_self=True
    )
    cvals = cases.select(
        F.col("pid").alias("pid_r"), F.col("case_v").alias("case_r")
    )
    ring = (
        knn.join(cvals, "pid_r")
        .groupBy("pid_l")
        .agg(
            F.max("d2").alias("r2"),
            F.sum("case_r").cast("long").alias("cases"),
        )
    )
    centers = ring.join(
        cases.select(
            F.col("pid").alias("cpid"), F.col("x").alias("cx"),
            F.col("y").alias("cy"),
        ),
        ring.pid_l == F.col("cpid"),
    ).select(
        F.col("cpid").alias("pid"), F.col("cx").alias("x"),
        F.col("cy").alias("y"), "r2", "cases",
    )

    # population mass inside each circle: cell-banded pair join at the
    # radius cap, refined per pair on the exact squared distance.
    pairs = joins.distance_band_join(
        centers, popl, radius=max_radius,
        left_extra={"r2_c": "r2"},
        right_extra={"pop_r": "pop_v"},
    )
    mass = (
        pairs.where(F.col("d2") <= F.col("r2_c"))
        .groupBy("pid_l")
        .agg(F.sum("pop_r").cast("long").alias("population"))
    )

    tot_c = cases.agg(F.sum("case_v").cast("long").alias("tc"))
    tot_p = popl.agg(F.sum("pop_v").cast("long").alias("tp"))

    circ = (
        centers.join(mass, centers.pid == mass.pid_l)
        .crossJoin(F.broadcast(tot_c))
        .crossJoin(F.broadcast(tot_p))
        .selectExpr(
            "pid AS ckey", "x", "y", "SQRT(r2) AS radius", "cases",
            "population",
            "CAST(population AS DOUBLE) * CAST(tc AS DOUBLE) "
            "/ CAST(tp AS DOUBLE) AS lam",
        )
        .where("lam <= CAST(cases AS DOUBLE) AND lam >= 1.0 AND cases >= 1")
    )
    out = _poisson_filter(circ)
    return out.selectExpr(
        "ckey AS pid", "x", "y", "ROUND(radius, 6) AS radius", "cases",
        "population", "ROUND(lam, 6) AS expected",
        "ROUND(fitness, 6) AS fitness",
    )


def besag_newell_oracle(
    neighbours: int = 10, max_radius: float = 150.0
) -> str:
    """DuckDB oracle: all-pairs kNN window (exact at gate scale), same
    radius cap as the Spark plan."""
    mr2 = max_radius * max_radius
    return world.with_layers(
        f"""
, cases AS (
  SELECT pid, x, y, CAST({CASE_V} AS BIGINT) AS case_v
  FROM points_events WHERE {CASE_FILTER}
), popl AS (
  SELECT pid, x, y, CAST({POP_V} AS BIGINT) AS pop_v FROM points_part
), knn AS (
  SELECT a.pid AS pid_l, b.pid AS pid_r,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
         b.case_v AS case_r
  FROM cases a JOIN cases b ON a.pid <> b.pid
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        <= {dlit(mr2)}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY a.pid ORDER BY d2, b.pid)
          <= {neighbours}
), ring AS (
  SELECT pid_l, MAX(d2) AS r2, CAST(SUM(case_r) AS BIGINT) AS cases
  FROM knn GROUP BY pid_l
), centers AS (
  SELECT c.pid, c.x, c.y, r.r2, r.cases
  FROM ring r JOIN cases c ON c.pid = r.pid_l
), mass AS (
  SELECT c.pid AS pid_l, CAST(SUM(p.pop_v) AS BIGINT) AS population
  FROM centers c JOIN popl p
    ON (c.x - p.x) * (c.x - p.x) + (c.y - p.y) * (c.y - p.y) <= c.r2
  GROUP BY c.pid
), tots AS (
  SELECT (SELECT CAST(SUM(case_v) AS DOUBLE) FROM cases) AS tc,
         (SELECT CAST(SUM(pop_v) AS DOUBLE) FROM popl) AS tp
), circ AS (
  SELECT c.pid AS ckey, c.x, c.y, SQRT(c.r2) AS radius, c.cases,
         m.population,
         CAST(m.population AS DOUBLE) * t.tc / t.tp AS lam
  FROM centers c JOIN mass m ON m.pid_l = c.pid CROSS JOIN tots t
  WHERE CAST(m.population AS DOUBLE) * t.tc / t.tp
          <= CAST(c.cases AS DOUBLE)
    AND CAST(m.population AS DOUBLE) * t.tc / t.tp >= 1.0
    AND c.cases >= 1
), lf AS ({_LF_SQL_DUCK}
), tail AS ({_POISSON_TAIL_DUCK})
SELECT c.ckey AS pid, c.x, c.y, ROUND(c.radius, 6) AS radius, c.cases,
       c.population, ROUND(c.lam, 6) AS expected,
       ROUND(t.psum, 6) AS fitness
FROM circ c JOIN tail t ON t.tkey = c.ckey
WHERE 1.0 - t.psum <= 0.01
""",
        "points_events", "points_part",
    )


def gam(
    events: DataFrame,
    pop: DataFrame,
    radii: tuple[float, ...] = (40.0, 60.0),
    overlap: float = 0.5,
    bbox: tuple[float, float, float, float] = (0.0, 0.0, 1000.0, 1000.0),
) -> DataFrame:
    """Openshaw GAM scan: overlapping circle lattice per radius.

    Output: (radius, gx, gy, cases, population, expected, fitness) for
    significant circles. Grid step = radius * overlap."""
    spark = events.sparkSession
    cases = events.where(CASE_FILTER).selectExpr(
        "pid", "x", "y", f"CAST({CASE_V} AS BIGINT) AS case_v"
    )
    popl = pop.selectExpr(
        "pid", "x", "y", f"CAST({POP_V} AS BIGINT) AS pop_v"
    )
    tot_c = cases.agg(F.sum("case_v").cast("long").alias("tc"))
    tot_p = popl.agg(F.sum("pop_v").cast("long").alias("tp"))

    x0, y0, x1, y1 = bbox
    per_radius = []
    for r in radii:
        step = r * overlap
        nx = int((x1 - x0) / step) + 1
        ny = int((y1 - y0) / step) + 1
        grid = spark.range(nx * ny).selectExpr(
            "id AS gid",
            f"{dlit(x0)} + CAST(id % {nx} AS DOUBLE) * {dlit(step)} AS gx",
            f"{dlit(y0)} + CAST(CAST(FLOOR(id / {nx}) AS BIGINT) AS DOUBLE)"
            f" * {dlit(step)} AS gy",
        )
        cmass = joins.band_stats_join(
            grid, cases, radius=r, value_col="case_v",
            left_cols=("gid", "gx", "gy"),
        ).select(F.col("pid_l").alias("pid_c"), F.col("sum_v").alias("cases"))
        pmass = joins.band_stats_join(
            grid, popl, radius=r, value_col="pop_v",
            left_cols=("gid", "gx", "gy"),
        ).select(
            F.col("pid_l").alias("pid_p"), F.col("sum_v").alias("population")
        )
        m = (
            grid.join(cmass, grid.gid == F.col("pid_c"))
            .join(pmass, grid.gid == F.col("pid_p"))
            .select("gid", "gx", "gy", "cases", "population")
            .withColumn("radius", F.lit(float(r)))
        )
        per_radius.append(m)
    allm = per_radius[0]
    for m in per_radius[1:]:
        allm = allm.unionByName(m)
    circ = (
        allm.crossJoin(F.broadcast(tot_c))
        .crossJoin(F.broadcast(tot_p))
        .selectExpr(
            "CAST(radius AS BIGINT) * 100000000 + gid AS ckey",
            "radius", "gx", "gy", "cases", "population",
            "CAST(population AS DOUBLE) * CAST(tc AS DOUBLE) "
            "/ CAST(tp AS DOUBLE) AS lam",
        )
        .where("lam <= CAST(cases AS DOUBLE) AND lam >= 1.0 AND cases >= 1")
    )
    out = _poisson_filter(circ)
    return out.selectExpr(
        "radius", "gx", "gy", "cases", "population",
        "ROUND(lam, 6) AS expected", "ROUND(fitness, 6) AS fitness",
    )


def gam_oracle(
    radii: tuple[float, ...] = (40.0, 60.0),
    overlap: float = 0.5,
    bbox: tuple[float, float, float, float] = (0.0, 0.0, 1000.0, 1000.0),
) -> str:
    x0, y0, x1, y1 = bbox
    grids = []
    for r in radii:
        step = r * overlap
        nx = int((x1 - x0) / step) + 1
        ny = int((y1 - y0) / step) + 1
        grids.append(
            f"""
SELECT CAST({r!r} AS BIGINT) * 100000000
       + CAST(gy_i AS BIGINT) * {nx} + gx_i AS ckey,
       CAST({r!r} AS DOUBLE) AS radius,
       {dlit(x0)} + CAST(gx_i AS DOUBLE) * {dlit(step)} AS gx,
       {dlit(y0)} + CAST(gy_i AS DOUBLE) * {dlit(step)} AS gy
FROM (SELECT UNNEST(generate_series(0, {nx - 1})) AS gx_i),
     (SELECT UNNEST(generate_series(0, {ny - 1})) AS gy_i)
"""
        )
    grid_sql = " UNION ALL ".join(grids)
    return world.with_layers(
        f"""
, cases AS (
  SELECT pid, x, y, CAST({CASE_V} AS BIGINT) AS case_v
  FROM points_events WHERE {CASE_FILTER}
), popl AS (
  SELECT pid, x, y, CAST({POP_V} AS BIGINT) AS pop_v FROM points_part
), grid AS ({grid_sql}
), cmass AS (
  SELECT g.ckey, CAST(SUM(c.case_v) AS BIGINT) AS cases
  FROM grid g JOIN cases c
    ON (g.gx - c.x) * (g.gx - c.x) + (g.gy - c.y) * (g.gy - c.y)
       <= g.radius * g.radius
  GROUP BY g.ckey
), pmass AS (
  SELECT g.ckey, CAST(SUM(p.pop_v) AS BIGINT) AS population
  FROM grid g JOIN popl p
    ON (g.gx - p.x) * (g.gx - p.x) + (g.gy - p.y) * (g.gy - p.y)
       <= g.radius * g.radius
  GROUP BY g.ckey
), tots AS (
  SELECT (SELECT CAST(SUM(case_v) AS DOUBLE) FROM cases) AS tc,
         (SELECT CAST(SUM(pop_v) AS DOUBLE) FROM popl) AS tp
), circ AS (
  SELECT g.ckey, g.radius, g.gx, g.gy, c.cases, p.population,
         CAST(p.population AS DOUBLE) * t.tc / t.tp AS lam
  FROM grid g JOIN cmass c ON c.ckey = g.ckey
              JOIN pmass p ON p.ckey = g.ckey
              CROSS JOIN tots t
  WHERE CAST(p.population AS DOUBLE) * t.tc / t.tp
          <= CAST(c.cases AS DOUBLE)
    AND CAST(p.population AS DOUBLE) * t.tc / t.tp >= 1.0
    AND c.cases >= 1
), lf AS ({_LF_SQL_DUCK}
), tail AS ({_POISSON_TAIL_DUCK})
SELECT c.radius, c.gx, c.gy, c.cases, c.population,
       ROUND(c.lam, 6) AS expected, ROUND(t.psum, 6) AS fitness
FROM circ c JOIN tail t ON t.tkey = c.ckey
WHERE 1.0 - t.psum <= 0.01
""",
        "points_events", "points_part",
    )
