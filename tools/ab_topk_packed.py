"""A/B: struct vs packed-bigint top-k aggregate over the knn ring-1 pairs.

The knn local[8] leg swings run-to-run from collect_list(struct) GC churn
(BENCH.md executor-emulation study). Candidate fix: collect ONE bigint
per pair — d2_mm * P + pid_r, where d2_mm is the exact integer-mm squared
distance (coords are exact n/1000 doubles, so round(x*1000) recovers n)
and P > max(pid_r) — so the sort order (d2, then pid) is preserved while
the aggregate buffers primitive longs instead of row objects.

This script times ONLY the aggregate formulations over identical pair
streams (same join plan), interleaved trials, to isolate the allocation
effect. Semantics are checked separately in tests.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opengxt_spark import joins, planner  # noqa: E402
from opengxt_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("topk-ab", shuffle_partitions=64)
    ins = bench.load_inputs(spark, sf_dir)
    left, right = ins["ev"], ins["pt"]
    k, radius = 4, 50.0

    rho = joins.point_density(right)
    r1 = joins._adaptive_first_radius(right, float(k) + 4.0, radius)
    cs = joins._ring_cell_size(r1, rho)
    n_r = planner.cached_count(right)
    strat = joins._ring_strategy_n(n_r, r1, cs)
    pairs = joins._band_pairs_outer(left, right, r1, cs, strat,
                                    exclude_self=False)
    print(f"r1={r1:.3f} strat={strat} n_right={n_r}", flush=True)

    def agg_struct(p):
        return p.groupBy("cell_x", "cell_y", "pid_l").agg(
            F.slice(
                F.sort_array(F.collect_list(
                    F.when(F.col("pid_r").isNotNull(), F.struct("d2", "pid_r"))
                )), 1, k,
            ).alias("_lst"),
            F.count("pid_r").alias("_n"),
        )

    # P = 2^25 (pids at bench scale < 33.5M); d2_mm <= (50*1000)^2 = 2.5e9
    # -> packed < 2^57. The packed value reconstructs nothing here (timing
    # only); the real operator unpacks d2_mm and pid_r after the slice.
    P = 1 << 25
    dxm = F.round(F.col("lx") * 1000).cast("long") - F.round(
        F.col("rx") * 1000
    ).cast("long")
    dym = F.round(F.col("ly") * 1000).cast("long") - F.round(
        F.col("ry") * 1000
    ).cast("long")

    def agg_packed(p):
        pk = (dxm * dxm + dym * dym) * F.lit(P) + F.col("pid_r")
        return p.groupBy("cell_x", "cell_y", "pid_l").agg(
            F.slice(
                F.sort_array(F.collect_list(
                    F.when(F.col("pid_r").isNotNull(), pk)
                )), 1, k,
            ).alias("_lst"),
            F.count("pid_r").alias("_n"),
        )

    # packed needs rx, ry on the pair rows; re-derive a pair stream that
    # carries them (same join, wider projection).
    pairs_xy = joins._band_pairs_outer(
        left, right, r1, cs, strat, exclude_self=False, keep_rxy=True
    ) if "keep_rxy" in joins._band_pairs_outer.__code__.co_varnames else None

    if pairs_xy is None:
        # fallback: recompute d2_mm from d2 for TIMING purposes only —
        # same arithmetic width, same allocation profile.
        def agg_packed(p):  # noqa: F811
            pk = (F.col("d2") * 1e6).cast("long") * F.lit(P) + F.col("pid_r")
            return p.groupBy("cell_x", "cell_y", "pid_l").agg(
                F.slice(
                    F.sort_array(F.collect_list(
                        F.when(F.col("pid_r").isNotNull(), pk)
                    )), 1, k,
                ).alias("_lst"),
                F.count("pid_r").alias("_n"),
            )
        pairs_xy = pairs

    # untimed warm
    agg_struct(pairs).write.format("noop").mode("overwrite").save()
    agg_packed(pairs_xy).write.format("noop").mode("overwrite").save()
    for trial in range(4):
        t0 = time.time()
        agg_struct(pairs).write.format("noop").mode("overwrite").save(); ns = 0
        ts = time.time() - t0
        t0 = time.time()
        agg_packed(pairs_xy).write.format("noop").mode("overwrite").save(); np_ = 0
        tp = time.time() - t0
        print(f"trial {trial}: struct {ts:.2f}s ({ns}) packed {tp:.2f}s "
              f"({np_})", flush=True)


if __name__ == "__main__":
    main()
