"""Replicate bench.py's exact conditions for knn_join, print every repeat."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opengxt_spark import joins, world  # noqa: E402
from opengxt_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402


def main():
    import gc
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("knn-profile2", shuffle_partitions=64)
    ins = bench.load_inputs(spark, sf_dir)
    joins.pip_count_join(
        world.points_events(spark, sf_dir), world.rects_customer(spark, sf_dir)
    ).write.format("noop").mode("overwrite").save()

    for trial in range(6):
        t0 = time.time()
        df = bench.QUERY_BUILDERS["knn_join_k4_r50"](ins)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(f"trial{trial}: build={t1-t0:.2f}s exec={t2-t1:.2f}s "
              f"total={t2-t0:.2f}s", flush=True)
        del df
        joins.release_scratch()
        if trial == 2:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            print("-- System.gc() --", flush=True)


if __name__ == "__main__":
    main()
