"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-polygon aggregate join at
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 plus the training-data pipeline ops; the registry lives in
``opengxt_spark.driver_queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opengxt_spark import driver_queries, gatenorm  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return driver_queries.QUERIES["pip_count_rect"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query.

    Each oracle is wrapped in a signed-zero-normalizing projection (see
    ``opengxt_spark.gatenorm``) matching the projection applied to the Spark
    side by the query registry, so ``-0.0`` vs ``0.0`` emission differences
    between the engines can never flip the driver's value hash.
    """
    return gatenorm.dezero_oracles(dict(driver_queries.ORACLES))
