"""Ad-hoc profiler for the knn_join ring schedule at bench scale."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opengxt_spark import joins, planner, world  # noqa: E402
from opengxt_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("knn-profile", shuffle_partitions=64)
    ins = bench.load_inputs(spark, sf_dir)
    left, right = ins["ev"], ins["pt"]
    k, radius = 4, 50.0

    rho = joins.point_density(right)
    r1 = joins._adaptive_first_radius(right, float(k) + 4.0, radius)
    cs = joins._ring_cell_size(r1, rho)
    n_r = planner.cached_count(right)
    strat = joins._ring_strategy_n(n_r, r1, cs)
    print(f"rho={rho:.6f} r1={r1:.3f} cs={cs:.3f} n_right={n_r} strat={strat}",
          flush=True)

    pairs = joins._band_pairs_outer(left, right, r1, cs, strat,
                                    exclude_self=False)
    t0 = time.time()
    npairs = pairs.count()
    print(f"ring1 pair count: {npairs} in {time.time()-t0:.2f}s", flush=True)

    agg = pairs.groupBy("cell_x", "cell_y", "pid_l").agg(
        F.slice(
            F.sort_array(F.collect_list(
                F.when(F.col("pid_r").isNotNull(), F.struct("d2", "pid_r"))
            )), 1, k,
        ).alias("_lst"),
        F.count("pid_r").alias("_n"),
        F.min("lx").alias("_sx"),
        F.min("ly").alias("_sy"),
    )
    print(agg._jdf.queryExecution().executedPlan().toString()[:4000], flush=True)
    for trial in range(3):
        t0 = time.time()
        n = agg.where(F.col("_n") < k).count()
        print(f"ring1 agg+pendingcount trial{trial}: pending={n} "
              f"{time.time()-t0:.2f}s", flush=True)

    # full query end-to-end
    for trial in range(3):
        t0 = time.time()
        df = joins.knn_join(left, right, k=4, radius=50.0, exclude_self=False)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(f"full knn trial{trial}: build={t1-t0:.2f}s exec={t2-t1:.2f}s",
              flush=True)
        del df
        joins.release_scratch()


if __name__ == "__main__":
    main()
