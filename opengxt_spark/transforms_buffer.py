"""Buffer variants + remaining closed-form feature transformers.

Reference parity map (GT = /root/reference/GeoTools/process-spatialstatistics/
src/main/java/org/geotools/process/spatialstatistics):
- ``wedge_buffers``        <- GT/transformation/WedgeBufferFeatureCollection
                              .java:46 (circular sector at each point from
                              azimuth/angle fields)
- ``single_sided_buffers`` <- GT/transformation/SingleSidedBufferFeature
                              Collection.java:44 (offset rectangle on one
                              side of each segment)
- ``variable_buffers``     <- GT/VariableBufferProcess.java:43 (per-feature
                              buffer distance from an attribute — the
                              parametric circle form of buffer_points)
- ``split_polygon_by_count`` <- GT/operations/SplitPolygonByCountOperation
                              .java:48 (k equal-area strips per polygon)
- ``max_inscribed_circle`` <- GT/transformation/MaximumInscribedCircle
                              FeatureCollection.java:44 (closed form for
                              axis-aligned rects: r = min(hw, hh) at center)
- ``force_dimension``      <- GT/transformation/ForceDimensionFeature
                              Collection.java:40 (2D/3D coercion — schema
                              transform; z synthesized or dropped)

All are narrow per-row projections/explodes over parametric geometry —
closed-form, zero shuffle, identical SQL text in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import planner, world
from .world import dlit

PI = 3.141592653589793


def wedge_buffers(points: DataFrame) -> DataFrame:
    """Circular sector per point: azimuth sector index from an attribute
    (w % 8 -> 45-degree sectors, trig-free), radius from the value field.
    Output (pid, r, a0_deg, a1_deg, wedge_area)."""
    df = planner.ensure_parallelism(points)
    return df.selectExpr(
        "pid",
        "CAST(5 + w % 10 AS DOUBLE) AS r",
        "CAST((w % 8) * 45 AS DOUBLE) AS a0_deg",
        "CAST((w % 8) * 45 + 45 AS DOUBLE) AS a1_deg",
        f"ROUND({dlit(PI)} * (5 + w % 10) * (5 + w % 10) / 8.0, 6) "
        "AS wedge_area",
    )


def wedge_buffers_oracle(layer: str = "points_events") -> str:
    return world.with_layers(
        f"""
SELECT pid, CAST(5 + w % 10 AS DOUBLE) AS r,
       CAST((w % 8) * 45 AS DOUBLE) AS a0_deg,
       CAST((w % 8) * 45 + 45 AS DOUBLE) AS a1_deg,
       ROUND({dlit(PI)} * (5 + w % 10) * (5 + w % 10) / 8.0, 6) AS wedge_area
FROM {layer}
""",
        layer,
    )


_SSB_EXPRS = (
    "lid",
    # left-side offset rectangle: corners = endpoints + normal * d
    "ROUND(x1, 6) AS qx1", "ROUND(y1, 6) AS qy1",
    "ROUND(x2, 6) AS qx2", "ROUND(y2, 6) AS qy2",
    "ROUND(x2 - d * (y2 - y1) / len, 6) AS qx3",
    "ROUND(y2 + d * (x2 - x1) / len, 6) AS qy3",
    "ROUND(x1 - d * (y2 - y1) / len, 6) AS qx4",
    "ROUND(y1 + d * (x2 - x1) / len, 6) AS qy4",
    "ROUND(d * len, 6) AS buf_area",
)


def single_sided_buffers(
    segments: DataFrame, distance: float, unit: str | None = None
) -> DataFrame:
    """Left-side offset rectangle per segment (the single-sided buffer of a
    straight segment is exactly this quad). Zero-length segments dropped.
    ``unit``: DistanceUnit of ``distance`` (DistanceUnit.java:26-58)."""
    from . import units

    d = dlit(units.to_world(distance, unit))
    df = planner.ensure_parallelism(segments).selectExpr(
        "lid", "x1", "y1", "x2", "y2",
        f"SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS len",
        f"{d} AS d",
    ).where("len > 0.0")
    return df.selectExpr(*_SSB_EXPRS)


def single_sided_buffers_oracle(layer: str, distance: float) -> str:
    d = dlit(float(distance))
    cols = ", ".join(_SSB_EXPRS)
    return world.with_layers(
        f"""
SELECT {cols}
FROM (SELECT lid, x1, y1, x2, y2,
             SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS len,
             {d} AS d
      FROM {layer})
WHERE len > 0.0
""",
        layer,
    )


def variable_buffers(
    points: DataFrame, dist_sql: str = "val / 100.0", unit: str | None = None
) -> DataFrame:
    """Per-feature buffer distance from an attribute expression
    (VariableBufferProcess). Output (pid, buf_dist, buf_area).
    ``unit``: DistanceUnit of the expression (DistanceUnit.java:26-58)."""
    from . import units

    if unit is not None and units.factor(unit) != 1.0:
        dist_sql = f"(({dist_sql}) * {units.factor(unit)!r})"
    df = planner.ensure_parallelism(points)
    return df.selectExpr(
        "pid",
        f"ROUND({dist_sql}, 6) AS buf_dist",
        f"ROUND({dlit(PI)} * ({dist_sql}) * ({dist_sql}), 6) AS buf_area",
    )


def variable_buffers_oracle(layer: str = "points_part",
                            dist_sql: str = "val / 100.0") -> str:
    return world.with_layers(
        f"""
SELECT pid, ROUND({dist_sql}, 6) AS buf_dist,
       ROUND({dlit(PI)} * ({dist_sql}) * ({dist_sql}), 6) AS buf_area
FROM {layer}
""",
        layer,
    )


def split_polygon_by_count(rects: DataFrame, k: int) -> DataFrame:
    """Split each rect into k equal-area vertical strips
    (SplitPolygonByCountOperation). Output (rid, part, sxmin, sxmax,
    symin, symax, part_area)."""
    kk = int(k)
    df = planner.ensure_parallelism(rects).selectExpr(
        "rid", "cx", "cy", "hw", "hh",
        f"explode(sequence(0, {kk - 1})) AS part",
    )
    w = f"(2.0 * hw / {dlit(float(kk))})"
    return df.selectExpr(
        "rid", "CAST(part AS INT) AS part",
        f"ROUND(cx - hw + part * {w}, 6) AS sxmin",
        f"ROUND(cx - hw + (part + 1) * {w}, 6) AS sxmax",
        "ROUND(cy - hh, 6) AS symin",
        "ROUND(cy + hh, 6) AS symax",
        f"ROUND({w} * 2.0 * hh, 6) AS part_area",
    )


def split_polygon_by_count_oracle(layer: str, k: int) -> str:
    kk = int(k)
    w = f"(2.0 * hw / {dlit(float(kk))})"
    return world.with_layers(
        f"""
SELECT rid, CAST(part AS INT) AS part,
       ROUND(cx - hw + part * {w}, 6) AS sxmin,
       ROUND(cx - hw + (part + 1) * {w}, 6) AS sxmax,
       ROUND(cy - hh, 6) AS symin,
       ROUND(cy + hh, 6) AS symax,
       ROUND({w} * 2.0 * hh, 6) AS part_area
FROM {layer}, LATERAL UNNEST(generate_series(0, {kk - 1})) AS u(part)
""",
        layer,
    )


def max_inscribed_circle(rects: DataFrame) -> DataFrame:
    """Maximum inscribed circle of an axis-aligned rect: centered, radius
    min(hw, hh) — the closed form of the reference's iterative search.
    Output (rid, micx, micy, mic_r, mic_area)."""
    df = planner.ensure_parallelism(rects)
    return df.selectExpr(
        "rid",
        "ROUND(cx, 6) AS micx", "ROUND(cy, 6) AS micy",
        "ROUND(LEAST(hw, hh), 6) AS mic_r",
        f"ROUND({dlit(PI)} * LEAST(hw, hh) * LEAST(hw, hh), 6) AS mic_area",
    )


def max_inscribed_circle_oracle(layer: str = "rects_customer") -> str:
    return world.with_layers(
        f"""
SELECT rid, ROUND(cx, 6) AS micx, ROUND(cy, 6) AS micy,
       ROUND(LEAST(hw, hh), 6) AS mic_r,
       ROUND({dlit(PI)} * LEAST(hw, hh) * LEAST(hw, hh), 6) AS mic_area
FROM {layer}
""",
        layer,
    )


def force_dimension(points: DataFrame, target_dim: int = 3) -> DataFrame:
    """Dimension coercion: 2D -> 3D synthesizes z from the value field
    (the reference copies/truncates ordinates); 3D -> 2D drops z.
    Output (pid, x, y[, z])."""
    df = planner.ensure_parallelism(points)
    if target_dim == 3:
        return df.selectExpr(
            "pid", "ROUND(x, 6) AS x", "ROUND(y, 6) AS y",
            "ROUND(val, 6) AS z",
        )
    return df.selectExpr("pid", "ROUND(x, 6) AS x", "ROUND(y, 6) AS y")


def force_dimension_oracle(layer: str = "points_part",
                           target_dim: int = 3) -> str:
    if target_dim == 3:
        body = (
            "SELECT pid, ROUND(x, 6) AS x, ROUND(y, 6) AS y, "
            f"ROUND(val, 6) AS z FROM {layer}"
        )
    else:
        body = f"SELECT pid, ROUND(x, 6) AS x, ROUND(y, 6) AS y FROM {layer}"
    return world.with_layers(body, layer)
