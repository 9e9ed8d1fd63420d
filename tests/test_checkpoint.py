"""Resumability: crash mid-pipeline, resume, stages skip; lineage recorded."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from opengxt_spark.checkpoint import CheckpointedPipeline


def test_checkpoint_resume_and_lineage(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    calls = {"a": 0, "b": 0}

    def build_a():
        calls["a"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    def build_b():
        calls["b"] += 1
        return spark.range(10)

    p1 = CheckpointedPipeline(spark, root)
    df_a = p1.stage("a", build_a)
    assert df_a.count() == 100 and calls["a"] == 1

    # simulate crash before stage b; a new pipeline resumes
    p2 = CheckpointedPipeline(spark, root)
    df_a2 = p2.stage("a", build_a)
    assert calls["a"] == 1  # NOT rebuilt
    assert p2.resumed == ["a"]
    assert df_a2.count() == 100
    df_b = p2.stage("b", build_b)
    assert df_b.count() == 10 and calls["b"] == 1

    # lineage/metrics table has per-file rows for both stages
    m = p2.metrics()
    stages = {r.stage for r in m.select("stage").distinct().collect()}
    assert stages == {"a", "b"}
    assert m.agg(F.sum("rows")).collect()[0][0] == 110

    # corrupt manifest -> stage re-runs
    mpath = os.path.join(root, "a", "_manifest.json")
    with open(mpath, "w") as f:
        f.write("{not json")
    p3 = CheckpointedPipeline(spark, root)
    p3.stage("a", build_a)
    assert calls["a"] == 2
    with open(mpath) as f:
        assert json.load(f)["status"] == "committed"
    shutil.rmtree(root)


def test_entrypoint_crash_resume(spark, sf_dir, tmp_path):
    """Drive the spark-submit entrypoint: crash after stage 2, resume."""
    from opengxt_spark.__main__ import main

    ckpt = str(tmp_path / "pipe")
    rc = main(["--sf-dir", sf_dir, "--checkpoint-dir", ckpt, "--fail-after", "2"])
    assert rc == 17
    assert os.path.exists(os.path.join(ckpt, "tile_assign", "_manifest.json"))
    assert not os.path.exists(os.path.join(ckpt, "zonal", "_manifest.json"))
    rc2 = main(["--sf-dir", sf_dir, "--checkpoint-dir", ckpt])
    assert rc2 == 0
    assert os.path.exists(os.path.join(ckpt, "zonal", "_manifest.json"))
