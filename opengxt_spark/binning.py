"""Binning and grid generation — exact transcriptions of the reference math.

- ``rect_bin_stages``  <- GT/pattern/RectangularBinningVisitor.java:88-105
- ``hex_bin_stages``   <- GT/pattern/HexagonalBinningVisitor.java:59-146
  (row-parity column offset + nearest-center correction + out-of-range drop)
- ``fishnet_grid``     <- GT/operations/FishnetOperation.java:91-188
- ``hexagon_grid``     <- GT/operations/HexagonOperation.java:81

Design: every per-point derivation is a named SQL fragment produced by ONE
Python builder. The DataFrame operator applies them with ``F.expr`` (JVM,
whole-stage codegen); the DuckDB oracle composes the identical text into
nested subqueries. IEEE mul/add/floor are deterministic across engines, and
all distance comparisons use squared distances (monotone-equivalent to the
reference's sqrt comparisons), so results are bit-identical across engines.

Grid-to-cell assignment is embarrassingly parallel (a narrow projection of
the point table) and the aggregate combines map-side — at 100 TB this is a
single scan + one shuffle of (row, col) partial sums.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import planner
from .world import dlit

BBox = tuple[float, float, float, float]  # minx, miny, maxx, maxy
WORLD_BBOX: BBox = (0.0, 0.0, 1000.0, 1000.0)


_FENCE_COUNTER = [0]


def pushdown_fence(df: DataFrame) -> DataFrame:
    """Optimizer fence: stop filter pushdown from re-expanding a deep
    projection chain.

    Spark 4 pushes filters (even non-deterministic ones) through every
    deterministic Project, substituting column aliases as it goes. Through a
    deep stage chain that substitution duplicates shared subtrees
    exponentially — the 12-stage hex assignment became a 180KB Filter
    directly over the scan, which exceeds janino's 64KB method limit and
    re-pays a failed whole-stage-codegen compile (~1.5s, serial) on EVERY
    execution. A ``CollectMetrics`` node (``Dataset.observe``) is a
    lineage-preserving barrier the optimizer will not move predicates
    across (doing so would change the observed metrics), while column
    pruning still reaches the scan. Cost: one count accumulator per task.
    """
    _FENCE_COUNTER[0] += 1
    return df.observe(f"_fence_{_FENCE_COUNTER[0]}", F.count(F.lit(1)))


def apply_stages(
    df: DataFrame, stages: list[tuple[str, str]], fence: bool = False
) -> DataFrame:
    """Apply named SQL-fragment stages as sequential projections.

    Spark 4's cost-aware CollapseProject keeps each stage its own Project
    (multiply-referenced aliases are not inlined), so the chain compiles in
    small per-projection methods. Pass ``fence=True`` when a *filter on the
    staged columns* follows a deep single-table chain — pushdown would
    otherwise substitute the whole chain into one exponential predicate
    (see pushdown_fence). Leave it off on hot exploded paths (the fence's
    CollectMetrics accumulator is interpreted per row — 3-40x overhead on a
    10^8-row Generate output) and after joins (filters referencing both
    sides stop at the join boundary on their own).
    """
    for name, sql in stages:
        df = df.withColumn(name, F.expr(sql))
    return pushdown_fence(df) if fence else df


def stages_to_subquery(base: str, stages: list[tuple[str, str]]) -> str:
    """Nest the stage fragments into subqueries for the DuckDB oracle."""
    q = f"({base})"
    for name, sql in stages:
        q = f"(SELECT *, {sql} AS {name} FROM {q})"
    return q


# ---------------------------------------------------------------------------
# Rectangular binning
# ---------------------------------------------------------------------------


def rect_bin_stages(
    bbox: BBox, columns: int, rows: int, x: str = "x", y: str = "y"
) -> list[tuple[str, str]]:
    minx, miny, maxx, maxy = bbox
    width = (maxx - minx) / columns
    height = (maxy - miny) / rows
    return [
        ("col", f"CAST(FLOOR(({x} - {dlit(minx)}) / {dlit(width)}) AS BIGINT)"),
        ("row", f"CAST(FLOOR(({y} - {dlit(miny)}) / {dlit(height)}) AS BIGINT)"),
    ]


def rect_binning(
    points: DataFrame,
    bbox: BBox,
    columns: int,
    rows: int,
    weight_col: str = "w",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Sum of weight per rectangular grid cell; empty cells dropped
    (onlyValidGrid=true). Output (col, row, val)."""
    df = apply_stages(
        planner.ensure_parallelism(points),
        rect_bin_stages(bbox, columns, rows, x, y),
        fence=True,  # the range filter below must not push through the chain
    )
    df = df.where(
        (F.col("col") >= 0)
        & (F.col("row") >= 0)
        & (F.col("col") < columns)
        & (F.col("row") < rows)
    )
    return df.groupBy("col", "row").agg(
        F.sum(weight_col).cast("long").alias("val")
    )


# ---------------------------------------------------------------------------
# Hexagonal binning (exact reference assignment math)
# ---------------------------------------------------------------------------


@dataclass
class HexGridSpec:
    size: float
    minx: float  # expanded extent minX (bbox.minX - half_xoffset)
    miny: float  # expanded extent minY (bbox.minY - yoffset)
    xoffset: float
    yoffset: float
    half_xoffset: float
    y_origin: float
    columns: int
    rows: int


def hex_grid_spec(bbox: BBox, size: float) -> HexGridSpec:
    """Pointy-top hex grid parameters — HexagonalBinningVisitor.java:59-86.

    Width w = sqrt(3)*size, height h = 2*size; horizontal center spacing w,
    vertical spacing 1.5*size; extent expanded left by w/2 and down by
    1.5*size; columns/rows = floor(extent/offset + 0.5) with +1 fixup.
    """
    bminx, bminy, bmaxx, bmaxy = bbox
    yoffset = size * 1.5
    xoffset = math.sqrt(3.0) * size
    half_xoffset = xoffset * 0.5
    minx = bminx - half_xoffset
    miny = bminy - yoffset
    width = bmaxx - minx
    height = bmaxy - miny
    columns = int(math.floor(width / xoffset + 0.5))
    rows = int(math.floor(height / yoffset + 0.5))
    columns = columns + 1 if columns * xoffset < width else columns
    rows = rows + 1 if rows * yoffset < height else rows
    return HexGridSpec(
        size=size,
        minx=minx,
        miny=miny,
        xoffset=xoffset,
        yoffset=yoffset,
        half_xoffset=half_xoffset,
        y_origin=miny + size * 0.25,
        columns=columns,
        rows=rows,
    )


def hex_bin_stages(
    spec: HexGridSpec, x: str = "x", y: str = "y"
) -> list[tuple[str, str]]:
    """Per-point hex (row, col) assignment — HexagonalBinningVisitor.java:89-146.

    Literal transcription: provisional row from the y band, parity-dependent
    provisional column, provisional center, then the nearest-center
    correction that re-homes points whose distance to the provisional center
    exceeds half the hex width and that are closer to an upper/lower diagonal
    neighbor. All comparisons use squared distances (sqrt is monotone).
    """
    s = spec
    xo, yo, hx = dlit(s.xoffset), dlit(s.yoffset), dlit(s.half_xoffset)
    minx, miny = dlit(s.minx), dlit(s.miny)
    hx2 = dlit(s.half_xoffset * s.half_xoffset)
    return [
        ("row0", f"CAST(FLOOR(({y} - {dlit(s.y_origin)}) / {yo}) AS BIGINT)"),
        ("even", "(row0 % 2) = 1"),
        (
            "col0",
            f"CASE WHEN even THEN CAST(FLOOR(({x} - {minx} - {hx}) / {xo}) AS BIGINT) "
            f"ELSE CAST(FLOOR(({x} - {minx}) / {xo}) AS BIGINT) END",
        ),
        (
            "hcx",
            f"CASE WHEN even THEN ({minx} + {xo}) + col0 * {xo} "
            f"ELSE ({minx} + {hx}) + col0 * {xo} END",
        ),
        ("hcy", f"({miny} + {dlit(s.size)}) + row0 * {yo}"),
        ("d0", f"({x} - hcx) * ({x} - hcx) + ({y} - hcy) * ({y} - hcy)"),
        ("ux", f"CASE WHEN {x} <= hcx THEN hcx - {hx} ELSE hcx + {hx} END"),
        (
            "du",
            f"({x} - ux) * ({x} - ux) + ({y} - (hcy + {yo})) * ({y} - (hcy + {yo}))",
        ),
        (
            "dl",
            f"({x} - ux) * ({x} - ux) + ({y} - (hcy - {yo})) * ({y} - (hcy - {yo}))",
        ),
        ("moved", f"d0 > {hx2} AND (du < d0 OR dl < d0)"),
        (
            "col",
            f"CASE WHEN moved THEN (CASE WHEN {x} <= hcx "
            "THEN (CASE WHEN even THEN col0 ELSE col0 - 1 END) "
            "ELSE (CASE WHEN even THEN col0 + 1 ELSE col0 END) END) "
            "ELSE col0 END",
        ),
        (
            "row",
            "CASE WHEN moved THEN (CASE WHEN du > dl THEN row0 - 1 "
            "ELSE row0 + 1 END) ELSE row0 END",
        ),
    ]


def hex_binning(
    points: DataFrame,
    bbox: BBox,
    size: float,
    weight_col: str = "w",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Pointy-top hexagonal binning, exact reference semantics.

    Output (col, row, val) with empty cells dropped (onlyValidGrid) and
    out-of-range points dropped (HexagonalBinningVisitor.java:144-146).
    """
    spec = hex_grid_spec(bbox, size)
    df = apply_stages(
        planner.ensure_parallelism(points), hex_bin_stages(spec, x, y),
        fence=True,  # the range filter below must not push through the chain
    )
    df = df.where(
        (F.col("col") >= 0)
        & (F.col("row") >= 0)
        & (F.col("col") < spec.columns)
        & (F.col("row") < spec.rows)
    )
    return df.groupBy("col", "row").agg(
        F.sum(weight_col).cast("long").alias("val")
    )


def hex_bin_oracle_sql(
    points_base: str, bbox: BBox, size: float, weight_col: str = "w"
) -> str:
    spec = hex_grid_spec(bbox, size)
    sub = stages_to_subquery(points_base, hex_bin_stages(spec))
    return (
        f"SELECT col, row, CAST(SUM({weight_col}) AS BIGINT) AS val FROM {sub} "
        f"WHERE col >= 0 AND row >= 0 AND col < {spec.columns} "
        f"AND row < {spec.rows} GROUP BY col, row"
    )


def rect_bin_oracle_sql(
    points_base: str, bbox: BBox, columns: int, rows: int, weight_col: str = "w"
) -> str:
    sub = stages_to_subquery(points_base, rect_bin_stages(bbox, columns, rows))
    return (
        f"SELECT col, row, CAST(SUM({weight_col}) AS BIGINT) AS val FROM {sub} "
        f"WHERE col >= 0 AND row >= 0 AND col < {columns} AND row < {rows} "
        "GROUP BY col, row"
    )


# ---------------------------------------------------------------------------
# Grid generators
# ---------------------------------------------------------------------------


def fishnet_grid(spark, bbox: BBox, width: float, height: float) -> DataFrame:
    """Rectangular fishnet over a bbox — FishnetOperation.java:91-110.

    columns = floor(w/width + 0.5) (+1 fixup); cell (col, row) spans
    [minx + col*width, minx + (col+1)*width) x [...). Generated with
    ``spark.range`` — no driver-side loop, scales to any grid size.
    Output: (uid, col, row, xmin, ymin, xmax, ymax); uid = row-major index
    matching the reference's featureID iteration order (row loop outer).
    """
    minx, miny, maxx, maxy = bbox
    columns = int(math.floor((maxx - minx) / width + 0.5))
    rows = int(math.floor((maxy - miny) / height + 0.5))
    columns = columns + 1 if columns * width < (maxx - minx) else columns
    rows = rows + 1 if rows * height < (maxy - miny) else rows
    cw = (maxx - minx) / columns
    ch = (maxy - miny) / rows
    df = spark.range(rows * columns).withColumnRenamed("id", "uid")
    return (
        df.withColumn("col", F.col("uid") % columns)
        .withColumn("row", (F.col("uid") / columns).cast("long"))
        .withColumn("xmin", F.lit(minx) + F.col("col") * F.lit(cw))
        .withColumn("ymin", F.lit(miny) + F.col("row") * F.lit(ch))
        .withColumn("xmax", F.lit(minx) + (F.col("col") + 1) * F.lit(cw))
        .withColumn("ymax", F.lit(miny) + (F.col("row") + 1) * F.lit(ch))
    )


def fishnet_oracle_sql(bbox: BBox, width: float, height: float) -> str:
    minx, miny, maxx, maxy = bbox
    columns = int(math.floor((maxx - minx) / width + 0.5))
    rows = int(math.floor((maxy - miny) / height + 0.5))
    columns = columns + 1 if columns * width < (maxx - minx) else columns
    rows = rows + 1 if rows * height < (maxy - miny) else rows
    cw = (maxx - minx) / columns
    ch = (maxy - miny) / rows
    return (
        "SELECT CAST(uid AS BIGINT) AS uid, "
        f"CAST(uid % {columns} AS BIGINT) AS col, "
        f"CAST(FLOOR(uid / {columns}) AS BIGINT) AS row, "
        f"{dlit(minx)} + (uid % {columns}) * {dlit(cw)} AS xmin, "
        f"{dlit(miny)} + FLOOR(uid / {columns}) * {dlit(ch)} AS ymin, "
        f"{dlit(minx)} + ((uid % {columns}) + 1) * {dlit(cw)} AS xmax, "
        f"{dlit(miny)} + (FLOOR(uid / {columns}) + 1) * {dlit(ch)} AS ymax "
        f"FROM (SELECT generate_series AS uid FROM generate_series(0, {rows * columns - 1}))"
    )


def hexagon_grid(spark, bbox: BBox, size: float) -> DataFrame:
    """Pointy-top hexagon grid centers — HexagonOperation.java:81 /
    the binning grid of HexagonalBinningVisitor (same spec).

    Output: (col, row, hcx, hcy, size). Vertex expansion is a narrow
    projection (6 trig constants * size) left to consumers.
    """
    spec = hex_grid_spec(bbox, size)
    df = spark.range(spec.rows * spec.columns).withColumnRenamed("id", "uid")
    df = (
        df.withColumn("col", F.col("uid") % spec.columns)
        .withColumn("row", (F.col("uid") / spec.columns).cast("long"))
        .withColumn("even", (F.col("row") % 2) == 1)
    )
    return df.select(
        "uid",
        "col",
        "row",
        F.when(
            F.col("even"),
            F.lit(spec.minx + spec.xoffset) + F.col("col") * spec.xoffset,
        )
        .otherwise(
            F.lit(spec.minx + spec.half_xoffset) + F.col("col") * spec.xoffset
        )
        .alias("hcx"),
        (F.lit(spec.miny + spec.size) + F.col("row") * spec.yoffset).alias("hcy"),
        F.lit(spec.size).alias("size"),
    )


def hexagon_grid_oracle_sql(bbox: BBox, size: float) -> str:
    spec = hex_grid_spec(bbox, size)
    c = spec.columns
    xo = dlit(spec.xoffset)
    return (
        "SELECT CAST(uid AS BIGINT) AS uid, "
        f"CAST(uid % {c} AS BIGINT) AS col, "
        f"CAST(FLOOR(uid / {c}) AS BIGINT) AS row, "
        f"CASE WHEN CAST(FLOOR(uid / {c}) AS BIGINT) % 2 = 1 "
        f"THEN {dlit(spec.minx + spec.xoffset)} + (uid % {c}) * {xo} "
        f"ELSE {dlit(spec.minx + spec.half_xoffset)} + (uid % {c}) * {xo} END AS hcx, "
        f"{dlit(spec.miny + spec.size)} + CAST(FLOOR(uid / {c}) AS BIGINT) * {dlit(spec.yoffset)} AS hcy, "
        f"{dlit(spec.size)} AS size "
        f"FROM (SELECT generate_series AS uid FROM generate_series(0, {spec.rows * spec.columns - 1}))"
    )


def triangular_grid(spark, bbox: BBox, size: float) -> DataFrame:
    """Triangular grid over the extent — TriangularGridOperation.java:48.

    Each square cell of ``size`` splits into an up- and a down-triangle;
    output (uid, tri, x0, y0) with tri in {0, 1} and (x0, y0) the cell's
    lower-left corner. spark.range generator — no data movement.
    """
    minx, miny, maxx, maxy = bbox
    cols = int(math.ceil((maxx - minx) / size))
    rows = int(math.ceil((maxy - miny) / size))
    n = cols * rows * 2
    df = spark.range(n).withColumnRenamed("id", "uid")
    return df.select(
        "uid",
        (F.col("uid") % 2).cast("int").alias("tri"),
        F.round(
            F.lit(minx)
            + (F.floor(F.col("uid") / 2) % cols).cast("double") * F.lit(size),
            6,
        ).alias("x0"),
        F.round(
            F.lit(miny)
            + F.floor(F.floor(F.col("uid") / 2) / cols).cast("double")
            * F.lit(size),
            6,
        ).alias("y0"),
    )


def triangular_grid_oracle(bbox: BBox, size: float) -> str:
    minx, miny, maxx, maxy = bbox
    cols = int(math.ceil((maxx - minx) / size))
    rows = int(math.ceil((maxy - miny) / size))
    n = cols * rows * 2
    return f"""
SELECT uid, CAST(uid % 2 AS INT) AS tri,
       ROUND({dlit(minx)} + CAST(CAST(FLOOR(uid / 2) AS BIGINT) % {cols} AS DOUBLE)
             * {dlit(size)}, 6) AS x0,
       ROUND({dlit(miny)} + CAST(FLOOR(CAST(FLOOR(uid / 2) AS BIGINT) / {cols})
             AS DOUBLE) * {dlit(size)}, 6) AS y0
FROM (SELECT generate_series AS uid FROM generate_series(0, {n - 1}))
"""


def circular_grid(spark, bbox: BBox, radius: float) -> DataFrame:
    """Circle-cell grid over the extent — CircularGridOperation.java:53.
    Output (uid, cx, cy, r): circle centers on a 2r lattice."""
    minx, miny, maxx, maxy = bbox
    step = 2.0 * radius
    cols = int(math.ceil((maxx - minx) / step))
    rows = int(math.ceil((maxy - miny) / step))
    n = cols * rows
    df = spark.range(n).withColumnRenamed("id", "uid")
    return df.select(
        "uid",
        F.round(
            F.lit(minx + radius)
            + (F.col("uid") % cols).cast("double") * F.lit(step),
            6,
        ).alias("cx"),
        F.round(
            F.lit(miny + radius)
            + F.floor(F.col("uid") / cols).cast("double") * F.lit(step),
            6,
        ).alias("cy"),
        F.lit(float(radius)).alias("r"),
    )


def circular_grid_oracle(bbox: BBox, radius: float) -> str:
    minx, miny, maxx, maxy = bbox
    step = 2.0 * radius
    cols = int(math.ceil((maxx - minx) / step))
    rows = int(math.ceil((maxy - miny) / step))
    n = cols * rows
    return f"""
SELECT uid,
       ROUND({dlit(minx + radius)} + CAST(uid % {cols} AS DOUBLE)
             * {dlit(step)}, 6) AS cx,
       ROUND({dlit(miny + radius)} + CAST(FLOOR(uid / {cols}) AS DOUBLE)
             * {dlit(step)}, 6) AS cy,
       {dlit(float(radius))} AS r
FROM (SELECT generate_series AS uid FROM generate_series(0, {n - 1}))
"""
