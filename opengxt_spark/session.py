"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design target and proven locally:
AQE on (runtime re-plan + skew-join splitting), Arrow for every
pandas-UDF boundary, shuffle partitions sized to the parallelism level.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "opengxt-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver convention) or 32.
    On a real cluster the master/size come from spark-submit; these configs
    are safe there too (AQE, Arrow, adaptive shuffle sizing).
    """
    cores = int(cores or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(2 * cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Cell joins are many-to-many on bounded key groups: shuffled-hash
        # avoids sorting both sides (the sort of a 10^8-row candidate build
        # side dominates SMJ); AQE still falls back / splits skewed keys.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Tiled (ghost-halo) joins co-partition both sides by tile and join
        # on (tile, cell): accepting subset-key co-partitioning lets the
        # join and grouping run with zero additional exchange.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.requireAllClusterKeysForDistribution", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # Heap paging policy. Default: do NOT pre-size the heap (-Xms = max
        # without pre-touch was A/B'd in round 1: the second query stalls
        # 60-100 s in kernel page-zeroing while G1 first-touches tens of GB
        # on demand). But a LAZILY grown heap just spreads the same zeroing
        # over whichever queries trigger growth — measured as intermittent
        # 30-60 s first-build spikes on the allocation-heaviest query (knn
        # collect_list buffers). SPARK_GRAFT_PRETOUCH=1 (bench sets it)
        # commits AND zeroes the whole heap at JVM startup
        # (-Xms=-Xmx -XX:+AlwaysPreTouch, parallel in JDK 17), so timed
        # queries never pay first-touch; startup cost is untimed.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if os.environ.get("SPARK_GRAFT_PRETOUCH", "") == "1":
        mem = os.environ.get("SPARK_DRIVER_MEM", "48g")
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-Xms{mem} -XX:+AlwaysPreTouch",
        )
    return builder.getOrCreate()
