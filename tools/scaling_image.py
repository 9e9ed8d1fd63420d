"""Two-parallelism scaling run for the IMAGE pipeline (N vs 4N proxy).

Same design as tools/scaling.py (one fresh JVM per cell, shuffle
partitions fixed at 64, N-then-4N ladder per job) but over the
decode-bearing multimodal jobs rather than the spatial-join suite:

- ``patchify``: images_table -> decode -> 8x8 patch extraction ->
  count+checksum agg. Pure single-pass Arrow map; the embarrassingly
  parallel scan path every per-image op (flip/resize/grayscale/
  histogram/phash) shares.
- ``exact_dedup``: images_table -> sha2(bytes) hash-shuffle ->
  duplicate-class agg. The one image op with an exchange — the linear
  dedup pass of a 10^12-image curation pipeline.
- ``wds_write``: images_table -> range partition -> task-local tar
  shard writes + lineage manifest. The export path (write throughput,
  the analog of the reference's FeatureInserter buffered sink).

Usage:
  python tools/scaling_image.py [sf_dir] [n_small] [n_big]   # parent
  python tools/scaling_image.py --child JOB CORES SF_DIR     # one cell
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOBS = ("patchify", "exact_dedup", "wds_write", "wds_write_late")


def child(job: str, cores: int, sf_dir: str) -> None:
    sys.path.insert(0, REPO)
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    from pyspark.sql import functions as F

    from opengxt_spark.session import get_spark
    from opengxt_spark import imageops, raster

    spark = get_spark(f"img-scaling-{job}-{cores}", shuffle_partitions=64)
    # Replicate the image meta K times (okey-derived columns recomputed so
    # replicas are valid distinct images), then pin the map-stage partition
    # count at 64 for BOTH levels — the same task graph executed by fewer
    # or more threads, like tools/scaling.py.
    k = int(os.environ.get("IMG_SCALE", "8"))
    # Repartition BEFORE the replicate explode: the sf parquet is one file
    # -> one scan task, and an explode in that task is a serial stage that
    # caps scaling (measured: ~10 s serial -> 0.66 efficiency at 2->8
    # cores, Amdahl-exact). Shuffling the tiny pre-explode meta is cheap.
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
    imgs = raster.with_bytes(meta)

    def build():
        if job == "patchify":
            return imageops.patchify_images(imgs).groupBy().agg(
                {"wsum": "sum", "psum": "count"})
        return imageops.exact_dedup_images(imgs)

    def run_once() -> None:
        if job.startswith("wds_write"):
            # The tar export path: synthesize + pack + write shards, then
            # drop them — the sink's manifest materialization IS the job.
            # `wds_write` shuffles the byte rows (generic path, bounded by
            # single-disk shuffle bandwidth in local mode); `wds_write_late`
            # shuffles metadata only and materializes payload at the writer
            # (the 10^12-scale shape — shuffle pointers, not pixels).
            import shutil
            import tempfile

            from opengxt_spark import wds

            d = tempfile.mkdtemp(prefix="wds_scale_")
            late = job.endswith("_late")
            # WDS_SHARD_BYTES: ladder the export at a different shard
            # grain (e.g. 268435456 for the 256 MB production-default leg
            # — fewer, task-sized shards, amortized tar headers).
            tb = int(os.environ.get("WDS_SHARD_BYTES", str(16 << 20)))
            try:
                wds.write_wds_shards(
                    meta if late else imgs, d, target_bytes=tb,
                    payload=raster.payload_rgb8 if late else None,
                ).count()
            finally:
                shutil.rmtree(d, ignore_errors=True)
        else:
            build().write.format("noop").mode("overwrite").save()

    # warm pass (JVM/codegen/Arrow spin-up), then timed best-of-N.
    # Between runs, drain the page-cache writeback queue OUTSIDE the
    # timer: the wds jobs write ~2.4 GB of shards per run and deferred
    # flushes from run k otherwise stall run k+1's writes (measured
    # swings of 20-44 s for identical runs on this VM's shared virtio
    # disk) — each timed run should pay for its own I/O only.
    run_once()
    best = float("inf")
    reps = 3 if job.startswith("wds_write") else 2
    for _ in range(reps):
        os.sync()
        t0 = time.time()
        run_once()
        best = min(best, time.time() - t0)
    n = imgs.count()
    print(json.dumps({"job": job, "cores": cores, "sec": round(best, 3),
                      "rows": n}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    jobs = [j for j in JOBS
            if j in os.environ.get("IMG_JOBS", ",".join(JOBS)).split(",")]
    results: dict[str, dict[int, dict]] = {}
    for job in jobs:
        results[job] = {}
        for cores in (n_small, n_big):  # ladder: both levels back-to-back
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 job, str(cores), sf_dir],
                capture_output=True, text=True, timeout=3600,
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            results[job][cores] = json.loads(line)
            print(line, flush=True)
    ratio = n_big / n_small
    for job in jobs:
        a, b = results[job][n_small], results[job][n_big]
        eff = a["sec"] / (ratio * b["sec"])
        print(f"{job}: local[{n_small}] {a['sec']}s "
              f"({a['rows']/a['sec']:.0f} rows/s) -> "
              f"local[{n_big}] {b['sec']}s ({b['rows']/b['sec']:.0f} rows/s)"
              f"  speedup {a['sec']/b['sec']:.2f}x  efficiency {eff:.3f}")


if __name__ == "__main__":
    main()
