"""Headline benchmark: spatial-join + tiling throughput.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "throughput_rows_per_sec": ...}.

Execution is measured end-to-end with the noop sink (full pipeline runs, no
driver collect). Set BENCH_QUERIES=comma,list to subset.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opengxt_spark import driver_queries  # noqa: E402
from opengxt_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pip_count_rect",
    "pip_count_hex",
    "neighbor_count_r15",
    "nearest_join_r25",
    "knn_join_k4_r50",
    "attribute_join_agg",
]


def run_query(spark, name, sf_dir) -> float:
    df = driver_queries.QUERIES[name](spark, sf_dir)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = os.environ.get("BENCH_QUERIES")
    names = names.split(",") if names else [
        q for q in HEADLINE if q in driver_queries.QUERIES
    ]
    spark = get_spark("opengxt-bench")
    # warm the JVM/codegen once with the cheapest query
    run_query(spark, "attribute_join_agg", sf_dir)

    input_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    timings: dict[str, float] = {}
    for name in names:
        timings[name] = round(run_query(spark, name, sf_dir), 3)
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "spatial-join+tiling headline suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "throughput_rows_per_sec": round(
                    input_rows * len(timings) / total, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
