"""spark-submit entrypoint: the flagship raster<->vector pipeline, resumable.

    spark-submit --py-files opengxt_spark.zip -m ... OR
    python -m opengxt_spark --sf-dir /root/testdata/sf0.01 \
        --checkpoint-dir /tmp/gxt_ckpt

Stages (each a snapshot checkpoint; a killed run resumes at the first
uncommitted stage):
  1. images        — synthesize the image+caption table (BASELINE shape)
  2. tile_assign   — footprint -> tile cover
  3. pip_counts    — PIP aggregate join (events x customer rects)
  4. zonal         — raster<->vector zonal statistics
  5. report        — summary row counts joined with the metrics table

When launched via spark-submit, package the library with
``zip -r opengxt_spark.zip opengxt_spark`` and pass --py-files.
"""

from __future__ import annotations

import argparse
import sys

from opengxt_spark import joins, raster, world
from opengxt_spark.checkpoint import CheckpointedPipeline
from opengxt_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="opengxt_spark")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--checkpoint-dir", default="/tmp/opengxt_ckpt")
    ap.add_argument("--fail-after", type=int, default=-1,
                    help="(testing) abort after N stages to simulate a crash")
    args = ap.parse_args(argv)

    spark = get_spark("opengxt-pipeline")
    pipe = CheckpointedPipeline(spark, args.checkpoint_dir)

    stages = [
        ("images", lambda: raster.images_table(spark, args.sf_dir).drop("bytes")),
        ("tile_assign", lambda: raster.footprint_tiles(
            raster.images_meta(spark, args.sf_dir))),
        ("pip_counts", lambda: joins.pip_count_join(
            world.points_events(spark, args.sf_dir),
            world.rects_customer(spark, args.sf_dir))),
        ("zonal", lambda: raster.zonal_stats(
            spark, world.rects_customer(spark, args.sf_dir))),
    ]
    for i, (name, build) in enumerate(stages):
        df = pipe.stage(name, build)
        print(f"stage {name}: {df.count()} rows "
              f"({'resumed' if name in pipe.resumed else 'executed'})")
        if args.fail_after == i + 1:
            print("simulated failure — resume by re-running")
            return 17

    m = pipe.metrics()
    print(f"metrics table: {m.count()} lineage rows over "
          f"{m.select('stage').distinct().count()} stages")
    return 0


if __name__ == "__main__":
    sys.exit(main())
