"""File sources beyond parquet — the TextfileToPointOperation path.

Reference parity:
- ``csv_to_points`` <- GT/operations/TextfileToPointOperation.java:56
  (delimited text -> point features: split, column projection, X/Y parse).

The distributed shape is ``spark.read.csv`` with an explicit schema (no
inference scan) -> the same layer projection the parquet path uses. Numeric
coordinates travel as exact integer millicoordinates, so the text roundtrip
is lossless and the layer values are bit-identical to the parquet-derived
layer (the correctness gate compares against the parquet oracle).

At 100 TB: CSV splits parallelize like any file scan; the projection is a
narrow map. Schema-on-read with explicit types avoids the double full scan
of inference.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import world

CSV_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.LongType()),
        T.StructField("ix", T.LongType()),
        T.StructField("iy", T.LongType()),
        T.StructField("w", T.LongType()),
        T.StructField("cat", T.StringType()),
    ]
)


def write_points_csv(spark: SparkSession, sf_dir: str, path: str) -> str:
    """Materialize the events layer as a CSV fixture (exact integer
    millicoordinates — text-lossless). Idempotent overwrite."""
    world.register_tables(spark, sf_dir)
    df = spark.sql(
        "SELECT event_id AS pid, "
        f"CAST({world.pxi_sql('event_id')} AS BIGINT) AS ix, "
        f"CAST({world.pyi_sql('event_id')} AS BIGINT) AS iy, "
        f"{world.int_weight_sql('value')} AS w, "
        "event_type AS cat FROM events"
    )
    df.coalesce(4).write.mode("overwrite").option("header", True).csv(path)
    return path


def csv_to_points(spark: SparkSession, path: str) -> DataFrame:
    """TextfileToPointOperation: delimited text -> point layer
    (pid, x, y, w, cat) via explicit schema + the shared projection."""
    raw = spark.read.csv(path, header=True, schema=CSV_SCHEMA)
    return raw.select(
        "pid",
        (F.col("ix").cast("double") / 1000.0).alias("x"),
        (F.col("iy").cast("double") / 1000.0).alias("y"),
        "w",
        "cat",
    )


def csv_points_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: write the CSV fixture for this sf_dir (keyed by path so
    repeat calls reuse it) and read it back as a point layer."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join("/tmp", f"opengxt_csv_points{tag}")
    write_points_csv(spark, sf_dir, path)
    return csv_to_points(spark, path)


def csv_points_oracle() -> str:
    """The parquet-side equivalent of the CSV roundtrip (identical values —
    the integer text roundtrip is lossless)."""
    return (
        "SELECT event_id AS pid, "
        f"CAST(CAST({world.pxi_sql('event_id')} AS BIGINT) AS DOUBLE) / 1000.0 AS x, "
        f"CAST(CAST({world.pyi_sql('event_id')} AS BIGINT) AS DOUBLE) / 1000.0 AS y, "
        f"{world.int_weight_sql('value')} AS w, "
        "event_type AS cat FROM events"
    )
