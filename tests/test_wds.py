"""WebDataset tar shard sink/source + training-split/shard-plan tests.

Round-trip fidelity (bit-exact payloads, caption equality), per-partition
lineage manifest consistency, deterministic re-export (pinned tar
metadata), split determinism/partition, and shard-plan size bounds.
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
from pyspark.sql import functions as F

from opengxt_spark import imageops, raster, wds


def _roundtrip(spark, sf_dir, tmp_path, target=1 << 20):
    out = str(tmp_path / "shards")
    src = raster.images_table(spark, sf_dir)
    manifest = wds.write_wds_shards(src, out, target_bytes=target)
    back = wds.read_wds_shards(spark, out)
    return src, manifest, back, out


def test_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    src, _, back, _ = _roundtrip(spark, sf_dir, tmp_path)
    a = src.select(
        "image_id", "w", "h", "fmt", "caption",
        F.sha2("bytes", 256).alias("sha"),
    )
    b = back.select(
        "image_id", "w", "h", "fmt", "caption",
        F.sha2("bytes", 256).alias("sha"),
    )
    assert a.count() == b.count() > 0
    # exceptAll both ways == empty -> exact multiset equality of all columns
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_manifest_lineage_consistent(spark, sf_dir, tmp_path):
    src, manifest, back, out = _roundtrip(spark, sf_dir, tmp_path)
    rows = manifest.collect()
    n_src = src.count()
    assert sum(r.rows for r in rows) == n_src == back.count()
    # files on disk match the manifest exactly
    on_disk = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out, "*.tar"))
    )
    assert sorted(r.file for r in rows) == on_disk
    # okey ranges are disjoint (range partitioning) and byte sums match
    spans = sorted((r.okey_min, r.okey_max) for r in rows)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 < b0
    total = src.agg(F.sum(F.expr("CAST(w AS BIGINT) * h * 3"))).first()[0]
    assert sum(r.bytes for r in rows) == total


def test_late_materialization_bit_identical(spark, sf_dir, tmp_path):
    """The payload= late-materialization sink (metadata-only shuffle,
    writer-side byte synthesis) produces bit-identical shard files to the
    generic bytes-shuffled sink on the same input."""
    meta = raster.images_meta(spark, sf_dir).where("okey % 13 = 5")
    digests = []
    for d, src, payload in (
        ("bytes", raster.with_bytes(meta), None),
        ("late", meta, raster.payload_rgb8),
    ):
        out = str(tmp_path / d)
        m = wds.write_wds_shards(src, out, target_bytes=1 << 18,
                                 payload=payload)
        assert m.agg(F.sum("rows")).first()[0] == meta.count()
        digests.append({
            os.path.basename(p): hashlib.sha256(open(p, "rb").read()).hexdigest()
            for p in sorted(glob.glob(os.path.join(out, "*.tar")))
        })
    assert digests[0] == digests[1] and digests[0]


def test_crash_resume_rewrites_only_missing(spark, sf_dir, tmp_path):
    """Simulated crash (half the shard files deleted, manifest gone):
    a resume=True re-run restores the missing shards WITHOUT rewriting
    the survivors, and the final directory is bit-identical to the
    original full export."""
    out = str(tmp_path / "shards")
    meta = raster.images_meta(spark, sf_dir).where("okey % 7 = 1")
    wds.write_wds_shards(meta, out, target_bytes=1 << 16,
                         payload=raster.payload_rgb8)

    def digest():
        return {
            os.path.basename(p): hashlib.sha256(open(p, "rb").read()).hexdigest()
            for p in sorted(glob.glob(os.path.join(out, "*.tar")))
        }

    full = digest()
    tars = sorted(glob.glob(os.path.join(out, "*.tar")))
    assert len(tars) >= 4
    for p in tars[::2]:
        os.remove(p)
    survivors = {p: os.stat(p).st_mtime_ns for p in tars[1::2]}
    manifest = wds.write_wds_shards(meta, out, target_bytes=1 << 16,
                                    payload=raster.payload_rgb8, resume=True)
    assert digest() == full
    # survivors were skipped, not rewritten (mtime untouched)
    assert {p: os.stat(p).st_mtime_ns for p in survivors} == survivors
    # manifest rows cover every shard with correct lineage totals
    assert manifest.agg(F.sum("rows")).first()[0] == meta.count()
    assert sorted(r.file for r in manifest.collect()) == sorted(full)


def test_deterministic_re_export(spark, sf_dir, tmp_path):
    """Same data exported twice -> bit-identical shard files (tar
    metadata pinned: mtime=0, uid/gid=0, members in okey order)."""
    src = raster.images_table(spark, sf_dir).where("okey % 17 = 3")
    hashes = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        wds.write_wds_shards(src, out, target_bytes=1 << 18)
        digest = {}
        for p in sorted(glob.glob(os.path.join(out, "*.tar"))):
            digest[os.path.basename(p)] = hashlib.sha256(
                open(p, "rb").read()
            ).hexdigest()
        hashes.append(digest)
    assert hashes[0] == hashes[1] and hashes[0]


def test_read_plan_is_shuffle_free(spark, sf_dir, tmp_path):
    _, _, back, _ = _roundtrip(spark, sf_dir, tmp_path)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_train_split_partition_and_determinism(spark, sf_dir):
    meta = raster.images_meta(spark, sf_dir)
    assigned = meta.withColumn("split", F.expr(imageops.SPLIT_CASE_SQL))
    n = meta.count()
    counts = {r.split: r.c for r in
              assigned.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == n
    # proportions near 80/10/10 (binomial tolerance at sf0.001 n~1500)
    assert abs(counts.get("train", 0) / n - 0.8) < 0.05
    # pure function of image_id: re-evaluation identical
    again = {r.split: r.c for r in
             assigned.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert counts == again


def test_shard_plan_size_bound(spark, sf_dir):
    target = 1 << 18
    meta = raster.images_meta(spark, sf_dir)
    plan = imageops.shard_plan(meta, target).collect()
    max_item = meta.agg(
        F.max(F.expr("CAST(w AS BIGINT) * h * 3 + length(caption)"))
    ).first()[0]
    total = meta.agg(
        F.sum(F.expr("CAST(w AS BIGINT) * h * 3 + length(caption)"))
    ).first()[0]
    assert sum(r.n_images for r in plan) == meta.count()
    assert sum(r.shard_bytes for r in plan) == total
    # running-cutoff guarantee: every shard < target + its largest item
    for r in plan:
        assert r.shard_bytes < target + max_item
    # shards are contiguous okey ranges
    spans = sorted((r.okey_min, r.okey_max) for r in plan)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 < b0


def test_augment_chain_equals_sequential(spark, sf_dir):
    """Fused flip->rot90->crop == the three single ops composed."""
    imgs = raster.images_table(spark, sf_dir).where("okey % 29 = 1")
    fused = imageops.probe_checksums(
        imageops.augment_chain_images(imgs, 14, 12))
    seq = imageops.probe_checksums(
        imageops.center_crop_images(
            imageops.rotate90_images(imageops.flip_images(imgs, "h")),
            14, 12))
    a = {r.image_id: (r.w, r.h, r.wsum) for r in fused.collect()}
    b = {r.image_id: (r.w, r.h, r.wsum) for r in seq.collect()}
    assert a == b and a


def test_image_diversity_matches_numpy(spark, sf_dir):
    imgs = raster.images_table(spark, sf_dir).where("okey % 31 = 2")
    got = {r.image_id: (r.n, r.sumsq)
           for r in imageops.image_diversity(imgs).collect()}
    for r in imgs.select("image_id", "okey", "w", "h").collect():
        v = raster.gen_pixels(r.okey, r.w, r.h).reshape(-1)
        c = np.bincount(v // 16, minlength=16).astype(np.int64)
        assert got[r.image_id] == (int(c.sum()), int((c * c).sum()))


def test_split_zone_balance_consistent(spark, sf_dir):
    """Sum over splits of the (rid, split) counts == the per-zone image
    count, and every count is positive."""
    from opengxt_spark import driver_queries as dq

    zb = dq.QUERIES["split_zone_balance"](spark, sf_dir)
    zones = dq.QUERIES["images_in_zones"](spark, sf_dir)
    a = {r.rid: r.total for r in
         zb.groupBy("rid").agg(F.sum("cnt").alias("total")).collect()}
    b = {r.rid: r.cnt for r in zones.collect()}
    assert a == b and a


def test_manifest_shard_pruning_reads_one_shard(spark, sf_dir, tmp_path):
    """Zone-map pruning: a point-okey lookup must select exactly ONE of
    the N shards via the manifest (range-partitioned export -> disjoint
    shard key ranges), and the pruned read must equal the full read
    filtered to the same range."""
    from opengxt_spark import raster, wds

    out = str(tmp_path / "wds_prune")
    man = wds.write_wds_shards(
        raster.images_table(spark, sf_dir), out
    ).collect()
    assert len(man) >= 2, "fixture must be multi-shard"
    # a key strictly inside one shard's range
    mid = sorted(man, key=lambda r: r["okey_min"])[len(man) // 2]
    key = (mid["okey_min"] + mid["okey_max"]) // 2
    paths = wds.prune_shards(spark, out, key, key)
    assert len(paths) == 1, (key, paths)
    assert mid["file"] in paths[0]

    lo, hi = mid["okey_min"], mid["okey_max"]
    pruned = wds.read_wds_shards(spark, out, okey_range=(lo, hi))
    full = wds.read_wds_shards(spark, out).where(
        f"okey BETWEEN {lo} AND {hi}"
    )
    a = sorted((r["image_id"], r["okey"]) for r in pruned.collect())
    b = sorted((r["image_id"], r["okey"]) for r in full.collect())
    assert a == b and len(a) == mid["rows"]
    # empty range prunes to zero shards and zero rows without a scan
    top = max(r["okey_max"] for r in man)
    assert wds.prune_shards(spark, out, top + 10, top + 20) == []
    assert wds.read_wds_shards(
        spark, out, okey_range=(top + 10, top + 20)
    ).count() == 0
