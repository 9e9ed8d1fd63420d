"""Per-row geometry transformers (SURVEY.md §2.2/2.3) on parametric layers.

Each reference operator is a lazy per-row decorator
(GT/transformation/*FeatureCollection.java); here each is a narrow
projection — Catalyst pipelines them inside whole-stage codegen, the exact
analogue of the reference's iterator pipelining, but columnar and parallel.

- ``buffer_points``      <- BufferExpressionFeatureCollection.java:60
  (expression distance, adds buf_dist; circles stay parametric)
- ``clip_points``        <- ClipWithGeometryFeatureCollection.java:57
  (fast-path rectangular clip = filter)
- ``affine_rects``       <- OffsetFeatureCollection.java:43 /
  ScaleFeatureCollection.java:44 (translate/scale)
- ``envelope_of_hex``    <- EnvelopeToPolygonFeatureCollection.java:44
- ``centroids_of_rects`` <- ToPointFeatureCollection.java:44
- ``delete_duplicates``  <- DeleteDuplicateFeaturesOperation.java:44
- ``collect_events``     <- CollectEventsOperation.java:61 (coincident
  points within a snap tolerance -> count)
- ``merge_layers``       <- MergeFeaturesOperation.java:42
- ``union_area_raster``  <- UnionPolygonProcess.java:55 — the union AREA
  computed exactly on the pixel grid (count pixels covered by >= 1
  polygon): the raster route to a union that needs no geometry kernel and
  scales as a PIP join.
- ``calculate_area_perimeter`` <- AreaCalculationFeatureCollection.java:43
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cells, planner, world
from .world import dlit


def buffer_points(
    points: DataFrame, dist_expr: str = "w % 10 + 2", unit: str | None = None
) -> DataFrame:
    """Buffer by an expression distance -> parametric circle layer
    (pid, cx, cy, radius, buf_dist, buf_area).

    ``unit``: DistanceUnit the expression's value is in (DistanceUnit.
    java:26-58); the evaluated distance converts to world units in-plan,
    mirroring BufferExpressionOperation's UnitConverter use."""
    from . import units

    if unit is not None and units.factor(unit) != 1.0:
        dist_expr = f"(({dist_expr}) * {units.factor(unit)!r})"
    return points.select(
        "pid",
        F.col("x").alias("cx"),
        F.col("y").alias("cy"),
        F.expr(f"CAST({dist_expr} AS DOUBLE)").alias("radius"),
        F.expr(f"CAST({dist_expr} AS DOUBLE)").alias("buf_dist"),
        F.expr(
            f"ROUND({dlit(3.141592653589793)} * CAST({dist_expr} AS DOUBLE) "
            f"* CAST({dist_expr} AS DOUBLE), 6)"
        ).alias("buf_area"),
    )


def clip_points(
    points: DataFrame, xmin: float, ymin: float, xmax: float, ymax: float
) -> DataFrame:
    """Rectangular clip — the reference's GeometryClipper fast path is a
    pure filter for points."""
    return points.where(
        (F.col("x") >= xmin)
        & (F.col("x") <= xmax)
        & (F.col("y") >= ymin)
        & (F.col("y") <= ymax)
    )


def affine_rects(
    rects: DataFrame, dx: float = 0.0, dy: float = 0.0, scale: float = 1.0
) -> DataFrame:
    """Translate + scale about the world origin (parametric affine)."""
    s = dlit(scale)
    return rects.select(
        "rid",
        F.expr(f"cx * {s} + {dlit(dx)}").alias("cx"),
        F.expr(f"cy * {s} + {dlit(dy)}").alias("cy"),
        F.expr(f"hw * {s}").alias("hw"),
        F.expr(f"hh * {s}").alias("hh"),
    )


def centroids_of_rects(rects: DataFrame) -> DataFrame:
    return rects.select("rid", F.col("cx").alias("x"), F.col("cy").alias("y"))


def envelope_of_hex(hexes: DataFrame) -> DataFrame:
    """Bounding box polygon of each hexagon (+ area of the box)."""
    h = world.hex_extent(hexes)
    return h.select(
        "hid",
        "xmin",
        "ymin",
        "xmax",
        "ymax",
        F.round((F.col("xmax") - F.col("xmin")) * (F.col("ymax") - F.col("ymin")), 6).alias(
            "env_area"
        ),
    )


def calculate_area_perimeter(rects: DataFrame) -> DataFrame:
    """Add area/perimeter columns (CalculateAreaProcess) — exact doubles."""
    return rects.select(
        "rid",
        (F.col("hw") * 2 * (F.col("hh") * 2)).alias("area"),
        ((F.col("hw") * 2 + F.col("hh") * 2) * 2).alias("perimeter"),
    )


def delete_duplicates(points: DataFrame) -> DataFrame:
    """Drop rows with duplicate geometry — keep min pid per exact (ix, iy)."""
    return points.groupBy("ix", "iy").agg(
        F.min("pid").alias("pid"), F.count(F.lit(1)).alias("n_dups")
    )


def collect_events(points: DataFrame, snap: float = 5.0) -> DataFrame:
    """Merge coincident points within a snap tolerance -> count per snapped
    location (CollectEventsOperation's distance-tolerance merge on the
    cell grid)."""
    s = dlit(snap)
    return points.groupBy(
        F.expr(f"CAST(FLOOR(x / {s}) AS BIGINT)").alias("sx"),
        F.expr(f"CAST(FLOOR(y / {s}) AS BIGINT)").alias("sy"),
    ).agg(F.count(F.lit(1)).alias("xcount"))


def merge_layers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Concatenate two layers with schema alignment (unionByName)."""
    return a.unionByName(b, allowMissingColumns=True)


def union_area_raster(spark, rects: DataFrame, grid: int = 500) -> DataFrame:
    """Area of the union of all rect polygons, computed exactly on the pixel
    grid: count pixels whose center lies in >= 1 rect, x pixel area.

    UnionPolygonProcess via rasterization — no geometry kernel, one PIP
    join; resolution-exact for this grid (documented deviation from the
    vector union), and embarrassingly scalable.
    """
    px_size = 1000.0 / grid
    pixels = spark.range(grid * grid).select(
        F.expr(f"CAST(id % {grid} AS BIGINT)").alias("gx"),
        F.expr(f"CAST(FLOOR(id / {grid}) AS BIGINT)").alias("gy"),
    ).select(
        "gx",
        "gy",
        F.expr(f"gx * {dlit(px_size)} + {dlit(px_size / 2)}").alias("x"),
        F.expr(f"gy * {dlit(px_size)} + {dlit(px_size / 2)}").alias("y"),
    )
    p = cells.with_point_cells(planner.ensure_parallelism(pixels))
    r = cells.explode_extent_cells(world.rect_corners(rects))
    covered = (
        planner.cell_join(p, r, world.rect_contains_sql("x", "y"))
        .select("gx", "gy")
        .distinct()
    )
    return covered.agg(
        F.count(F.lit(1)).alias("n_pixels"),
        F.round(F.count(F.lit(1)) * F.lit(px_size * px_size), 6).alias("union_area"),
    )
