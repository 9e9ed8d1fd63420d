"""Decompose wds_write's cost and A/B the late-materialization sink.

Stages timed at one parallelism level over the same replicated input:
  scan        — synthesize bytes, noop sink (the pure decode cost)
  hash+noop   — + hash shuffle of the byte rows (shuffle volume cost)
  range+noop  — + range sampling pass (extra child-plan evaluation)
  sink:bytes  — full tar export, bytes shuffled (current generic path)
  sink:late   — full tar export, metadata-only shuffle + writer-side
                payload materialization (the 10^12-scale shape)

Usage: python tools/ab_wds_partition.py [cores] [sf_dir] [img_scale]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    from pyspark.sql import functions as F

    from opengxt_spark import raster, wds
    from opengxt_spark.session import get_spark

    spark = get_spark(f"ab-wds-{cores}", shuffle_partitions=64)
    meta = raster.images_meta(spark, sf_dir).repartition(64)
    if k > 1:
        meta = (
            meta.withColumn(
                "_rep",
                F.explode(F.sequence(
                    F.lit(0).cast("long"), F.lit(k - 1).cast("long"))),
            )
            .withColumn(
                "okey",
                F.col("okey") + F.col("_rep") * F.lit(10**9).cast("long"),
            )
            .withColumn(
                "image_id",
                F.concat(F.lit("img_"), F.col("okey").cast("string")),
            )
            .withColumn("w", F.expr("CAST(16 + okey % 4 * 8 AS INT)"))
            .withColumn("h", F.expr("CAST(16 + okey % 3 * 8 AS INT)"))
            .drop("_rep")
        )
    meta = meta.cache()
    imgs = raster.with_bytes(meta)
    n_shards = 75  # match the sink's sizing at this volume, 16MB target
    print("rows:", imgs.count(), flush=True)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def sink(payload) -> None:
        d = tempfile.mkdtemp(prefix="abwds_")
        try:
            src = meta if payload is not None else imgs
            wds.write_wds_shards(
                src, d, target_bytes=16 << 20, payload=payload
            ).count()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    jobs = [
        ("scan", lambda: noop(imgs)),
        ("hash+noop", lambda: noop(imgs.repartition(n_shards, "okey"))),
        ("range+noop", lambda: noop(imgs.repartitionByRange(n_shards, "okey"))),
        ("sink:bytes", lambda: sink(None)),
        ("sink:late", lambda: sink(raster.payload_rgb8)),
    ]
    for name, fn in jobs:
        fn()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
