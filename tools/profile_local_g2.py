"""Phase split of the local_g band_stats self-join at bench volume:
cover explode / interior join / boundary join, timed separately over the
same cached input. Mirrors joins.band_stats_join's broadcast branch."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from opengxt_spark import cells, joins, planner  # noqa: E402
from opengxt_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    i = bench.load_inputs(spark, sf_dir)
    evv = i["evv"]

    radius, cell_ratio = 10.0, 3.0
    cs = radius / cell_ratio
    r2 = radius * radius

    r = evv.select(F.col("x").alias("rx"), F.col("y").alias("ry"),
                   F.col("v").alias("rv"))
    r = cells.with_point_cells(r, x="rx", y="ry", cell_size=cs)
    rcells = r.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).alias("c_cnt"),
        F.sum("rv").cast("long").alias("c_sum"))

    l = evv.select(F.col("pid").alias("pid_l"), F.col("x").alias("lx"),
                   F.col("y").alias("ly"), F.col("v").alias("v"))
    cover = l.withColumn(
        "cell_x", F.explode(F.sequence(cells.cell_of(F.col("lx") - radius, cs),
                                       cells.cell_of(F.col("lx") + radius, cs))),
    ).withColumn(
        "cell_y", F.explode(F.sequence(cells.cell_of(F.col("ly") - radius, cs),
                                       cells.cell_of(F.col("ly") + radius, cs))),
    )
    px, py = F.col("lx"), F.col("ly")
    ndx = F.greatest(F.col("cell_x") * cs - px, px - (F.col("cell_x") + 1) * cs,
                     F.lit(0.0))
    ndy = F.greatest(F.col("cell_y") * cs - py, py - (F.col("cell_y") + 1) * cs,
                     F.lit(0.0))
    fdx = F.greatest(px - F.col("cell_x") * cs, (F.col("cell_x") + 1) * cs - px)
    fdy = F.greatest(py - F.col("cell_y") * cs, (F.col("cell_y") + 1) * cs - py)
    cover = (cover.withColumn("_dmin2", ndx * ndx + ndy * ndy)
                  .withColumn("_dmax2", fdx * fdx + fdy * fdy)
                  .where(F.col("_dmin2") <= F.lit(r2)))

    def run(tag, df):
        df.count()
        t0 = time.time()
        n = df.count()
        print(f"{tag:36s} {time.time() - t0:7.3f} s   rows={n}", flush=True)

    run("cover explode (count only)", cover)
    interior = (cover.where(F.col("_dmax2") <= F.lit(r2))
                .join(F.broadcast(rcells), ["cell_x", "cell_y"])
                .groupBy("pid_l", "v")
                .agg(F.sum("c_cnt").alias("cnt"), F.sum("c_sum").alias("sum_v")))
    run("interior join+agg", interior)
    dx = F.col("lx") - F.col("rx")
    dy = F.col("ly") - F.col("ry")
    d2 = dx * dx + dy * dy
    bjoin = (cover.where(F.col("_dmax2") > F.lit(r2))
             .join(F.broadcast(r), ["cell_x", "cell_y"]))
    run("boundary join (pre-distance)", bjoin)
    boundary = (bjoin.where(d2 <= F.lit(r2))
                .groupBy("pid_l", "v")
                .agg(F.count(F.lit(1)).alias("cnt"),
                     F.sum("rv").cast("long").alias("sum_v")))
    run("boundary join+filter+agg", boundary)
    full = interior.unionByName(boundary).groupBy("pid_l", "v").agg(
        F.sum("cnt").cast("long").alias("cnt"),
        F.sum("sum_v").cast("long").alias("sum_v"))
    run("full union+final agg", full)


if __name__ == "__main__":
    main()


def fused() -> None:
    """Single-pass variant: build side = union(cell aggregates tagged
    agg=1, raw points tagged agg=0); join key includes the interior flag
    so interior cover rows match only aggregate rows and boundary rows
    only points. One cover generate, one join, one aggregation tree."""
    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    i = bench.load_inputs(spark, sf_dir)
    evv = i["evv"]
    radius, cell_ratio = 10.0, 3.0
    cs = radius / cell_ratio
    r2 = radius * radius

    r = evv.select(F.col("x").alias("rx"), F.col("y").alias("ry"),
                   F.col("v").alias("rv"))
    r = cells.with_point_cells(r, x="rx", y="ry", cell_size=cs)
    rcells = r.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).cast("long").alias("b_cnt"),
        F.sum("rv").cast("long").alias("b_sum"))
    bld = rcells.select(
        "cell_x", "cell_y", F.lit(True).alias("agg"),
        F.lit(0.0).alias("rx"), F.lit(0.0).alias("ry"),
        "b_cnt", "b_sum",
    ).unionByName(r.select(
        "cell_x", "cell_y", F.lit(False).alias("agg"), "rx", "ry",
        F.lit(1).cast("long").alias("b_cnt"),
        F.col("rv").cast("long").alias("b_sum"),
    ))

    l = evv.select(F.col("pid").alias("pid_l"), F.col("x").alias("lx"),
                   F.col("y").alias("ly"), F.col("v").alias("v"))
    cover = l.withColumn(
        "cell_x", F.explode(F.sequence(cells.cell_of(F.col("lx") - radius, cs),
                                       cells.cell_of(F.col("lx") + radius, cs))),
    ).withColumn(
        "cell_y", F.explode(F.sequence(cells.cell_of(F.col("ly") - radius, cs),
                                       cells.cell_of(F.col("ly") + radius, cs))),
    )
    px, py = F.col("lx"), F.col("ly")
    ndx = F.greatest(F.col("cell_x") * cs - px, px - (F.col("cell_x") + 1) * cs,
                     F.lit(0.0))
    ndy = F.greatest(F.col("cell_y") * cs - py, py - (F.col("cell_y") + 1) * cs,
                     F.lit(0.0))
    fdx = F.greatest(px - F.col("cell_x") * cs, (F.col("cell_x") + 1) * cs - px)
    fdy = F.greatest(py - F.col("cell_y") * cs, (F.col("cell_y") + 1) * cs - py)
    cover = (cover.withColumn("_dmin2", ndx * ndx + ndy * ndy)
                  .withColumn("agg", fdx * fdx + fdy * fdy <= F.lit(r2))
                  .where(F.col("_dmin2") <= F.lit(r2)))

    dx = F.col("lx") - F.col("rx")
    dy = F.col("ly") - F.col("ry")
    d2 = dx * dx + dy * dy
    out = (cover.join(F.broadcast(bld), ["cell_x", "cell_y", "agg"])
           .where(F.col("agg") | (d2 <= F.lit(r2)))
           .groupBy("pid_l", "v")
           .agg(F.sum("b_cnt").cast("long").alias("cnt"),
                F.sum("b_sum").cast("long").alias("sum_v")))

    out.count()
    t0 = time.time()
    n = out.count()
    print(f"{'fused single-pass':36s} {time.time() - t0:7.3f} s   rows={n}",
          flush=True)
