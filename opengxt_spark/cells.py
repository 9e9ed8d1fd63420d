"""Grid cell index — the engine's replacement for OpenGXT's per-query STRtree.

OpenGXT builds an in-memory STRtree per query and probes it row-at-a-time
(GT/operations/SpatialJoinOperation.java:185-198). That cannot distribute. We
instead assign every geometry an integer grid-cell key derived from pure
``floor()`` expressions, turning every spatial join into a Catalyst equi-join
on (cell_x, cell_y) followed by an exact refine predicate — the same
filter-then-refine architecture (bbox prefilter + exact predicate) the
reference hand-codes in GXTSimpleFeatureCollection.java:73-76, but expressed
declaratively so Spark picks broadcast vs shuffle and AQE splits skewed cells.

H3/S2 would serve the same role on a geographic CRS; the synthetic world is a
planar [0,1000)^2 grid, so a uniform grid index is both exact and oracle-
expressible (DuckDB computes the identical cell keys).

Cells are (cell_x, cell_y) BIGINT pairs. A point maps to exactly one cell, so
point-side never duplicates rows; polygon/extent sides explode to their
covering cells via ``sequence()`` (JVM-side, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CELL_SIZE = 25.0  # 40x40 cells over the 1000^2 world


def cell_of(coord: Column | str, cell_size: float) -> Column:
    c = F.col(coord) if isinstance(coord, str) else coord
    return F.floor(c / F.lit(float(cell_size))).cast("long")


def with_point_cells(
    df: DataFrame, x: str = "x", y: str = "y", cell_size: float = DEFAULT_CELL_SIZE
) -> DataFrame:
    """Attach (cell_x, cell_y) to a point layer — one row stays one row."""
    return df.withColumn("cell_x", cell_of(x, cell_size)).withColumn(
        "cell_y", cell_of(y, cell_size)
    )


def explode_extent_cells(
    df: DataFrame,
    xmin: str = "xmin",
    xmax: str = "xmax",
    ymin: str = "ymin",
    ymax: str = "ymax",
    cell_size: float = DEFAULT_CELL_SIZE,
) -> DataFrame:
    """Explode each row to every grid cell its bbox covers.

    ``sequence(floor(xmin/cs), floor(xmax/cs))`` runs JVM-side; typical
    polygons cover O(1)-O(10) cells so the blow-up is bounded. This is the
    distributed analogue of inserting a geometry's envelope into an STRtree.
    """
    cs = float(cell_size)
    out = df.withColumn(
        "cell_x",
        F.explode(F.sequence(cell_of(xmin, cs), cell_of(xmax, cs))),
    ).withColumn(
        "cell_y",
        F.explode(F.sequence(cell_of(ymin, cs), cell_of(ymax, cs))),
    )
    return out


def expand_extent(
    df: DataFrame, radius: Column | float, cols=("xmin", "xmax", "ymin", "ymax")
) -> DataFrame:
    """Expand a bbox by a search radius — the reference's BBOXExpanding
    FilterVisitor (GT/util/BBOXExpandingFilterVisitor.java) for distance joins."""
    r = F.lit(float(radius)) if isinstance(radius, (int, float)) else radius
    xmin, xmax, ymin, ymax = cols
    return (
        df.withColumn(xmin, F.col(xmin) - r)
        .withColumn(xmax, F.col(xmax) + r)
        .withColumn(ymin, F.col(ymin) - r)
        .withColumn(ymax, F.col(ymax) + r)
    )


def explode_circle_cells(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    radius: float = 0.0,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> DataFrame:
    """Explode each point to the cells its radius-circle actually overlaps.

    The naive bbox cover of a circle fetches (2r/cs + 1)^2 cells; many (the
    corners) never intersect the circle, and every spurious build cell
    multiplies candidate pairs in the join. Keep only cells whose nearest
    rectangle point lies within the radius: with cs = r/2 this cuts the
    candidate area from 9r^2 (3x3 ring at cs=r) to ~3.3r^2 vs the true
    pi*r^2 — ~2.7x fewer joined rows, which at 100 TB is the difference
    between a band join that fits the cluster and one that doesn't. All
    pruning is closed-form JVM arithmetic (GREATEST/floor), fully inside
    whole-stage codegen.
    """
    cs = float(cell_size)
    r = float(radius)
    px, py = F.col(x), F.col(y)
    out = df.withColumn(
        "cell_x",
        F.explode(F.sequence(cell_of(px - r, cs), cell_of(px + r, cs))),
    ).withColumn(
        "cell_y",
        F.explode(F.sequence(cell_of(py - r, cs), cell_of(py + r, cs))),
    )
    # Distance from the point to the cell rectangle [cx*cs,(cx+1)*cs) x [...)
    ddx = F.greatest(
        F.col("cell_x") * cs - px, px - (F.col("cell_x") + 1) * cs, F.lit(0.0)
    )
    ddy = F.greatest(
        F.col("cell_y") * cs - py, py - (F.col("cell_y") + 1) * cs, F.lit(0.0)
    )
    return out.where(ddx * ddx + ddy * ddy <= F.lit(r * r))


def point_extent(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Degenerate bbox of a point layer (for radius-expanded covers)."""
    return (
        df.withColumn("xmin", F.col(x))
        .withColumn("xmax", F.col(x))
        .withColumn("ymin", F.col(y))
        .withColumn("ymax", F.col(y))
    )
