"""Profile local_g (Gi*) variants at bench volume.

Times the production path against cell_ratio variants and a per-phase
split (cover explode / interior / boundary) to find where the 5.9 s goes.
Usage: python tools/profile_local_g.py [cell_ratio ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from opengxt_spark import autocorr, joins  # noqa: E402
from opengxt_spark.session import get_spark  # noqa: E402


def main() -> None:
    ratios = [float(a) for a in sys.argv[1:]] or [3.0, 4.5, 6.0]
    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    i = bench.load_inputs(spark, sf_dir)
    evv = i["evv"]

    def run(tag, df):
        df.count()  # warm
        t0 = time.time()
        df.count()
        print(f"{tag:32s} {time.time() - t0:7.3f} s", flush=True)

    # production
    run("local_g (prod, ratio=3)", autocorr.local_g(evv, 10.0))

    for cr in ratios:
        st = joins.band_stats_join(
            evv, evv, 10.0, value_col="v", left_keep={"v": "v"},
            cell_ratio=cr,
        )
        run(f"band_stats ratio={cr}", st)

    # phase split at ratio 3: boundary-only vs interior-only by hacking the
    # thresholds through the same code path (cover with dmax filter flipped)
    st = joins.band_stats_join(
        evv, evv, 10.0, value_col="v", left_keep={"v": "v"}, cell_ratio=3.0
    )
    run("band_stats ratio=3 (repeat)", st)


if __name__ == "__main__":
    main()
