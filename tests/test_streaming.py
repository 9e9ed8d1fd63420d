"""Streaming binning: complete replay equals the batch operator."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opengxt_spark import binning, streaming, world

SF = "/root/testdata/sf0.001"

SCHEMA = T.StructType([
    T.StructField("pid", T.LongType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("w", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])


def test_stream_replay_equals_batch(spark, tmp_path):
    pts = world.points_events(spark, SF).select("pid", "x", "y", "w")
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    pts = pts.withColumn(
        "ts",
        F.lit(base) + F.expr("make_interval(0, 0, 0, 0, 0, 0, pid % 5)"),
    )
    # two micro-batch files
    src = str(tmp_path / "stream_src")
    pts.where("pid % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    pts.where("pid % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    stream_df = streaming.stream_rect_bins(spark, src, SCHEMA)
    streaming.run_available_now(stream_df, "bins_replay")
    got = (
        spark.table("bins_replay")
        .groupBy("col", "row")
        .agg(F.sum("val").cast("long").alias("val"))
        .collect()
    )
    want = binning.rect_binning(pts, binning.WORLD_BBOX, 40, 25).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_stream_dedup_first_seen(spark, tmp_path):
    """Stateful streaming dedup: replay emits exactly one row per distinct
    fingerprint, and state carries ACROSS micro-batches (a key seen in
    batch 1 is suppressed in batch 2)."""
    import datetime

    base = datetime.datetime(2026, 1, 1)
    rows = []
    # 40 docs over 12 fingerprints; duplicates split across the two files
    for i in range(40):
        rows.append((i, f"fp{i % 12}", base + datetime.timedelta(seconds=i)))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("fp", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "dedup_src")
    df.where("doc_id < 20").coalesce(1).write.mode("append").parquet(src)
    df.where("doc_id >= 20").coalesce(1).write.mode("append").parquet(src)

    out = streaming.stream_dedup_first_seen(spark, src, schema)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_replay")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_replay").collect()
    # exactly one row per distinct fingerprint, and it is the first-seen doc
    assert len(got) == 12
    by_fp = {r["fp"]: r["doc_id"] for r in got}
    assert by_fp == {f"fp{k}": k for k in range(12)}


def test_stream_pip_replay_equals_batch(spark, tmp_path):
    """Stream-static spatial join: a complete replay of the point feed
    joined to the static rect layer equals the batch pip_count_join."""
    from opengxt_spark import joins

    pts = world.points_events(spark, SF).select("pid", "x", "y", "w")
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    pts = pts.withColumn(
        "ts",
        F.lit(base) + F.expr("make_interval(0, 0, 0, 0, 0, 0, pid % 7)"),
    )
    src = str(tmp_path / "pip_src")
    pts.where("pid % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    pts.where("pid % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    rects = world.rects_customer(spark, SF)
    stream_df = streaming.stream_pip_count(spark, src, SCHEMA, rects)
    streaming.run_available_now(stream_df, "pip_replay")
    got = (
        spark.table("pip_replay")
        .groupBy("rid")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("sum_w").cast("long").alias("sum_w"),
        )
        .collect()
    )
    want = joins.pip_count_join(
        pts.select("pid", "x", "y", "w"), rects
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_stream_image_stats_replay_equals_batch(spark, tmp_path):
    """Streaming image decode + windowed channel stats: a complete replay
    of a two-file image feed equals the batch channel_stats aggregate."""
    from opengxt_spark import imageops, raster

    imgs = (
        raster.images_table(spark, SF)
        .where("okey % 11 = 0")
        .select("image_id", "okey", "w", "h", "fmt", "bytes")
    )
    base = datetime.datetime(2026, 1, 1)
    imgs = imgs.withColumn(
        "ts",
        F.lit(base) + F.expr("make_interval(0, 0, 0, 0, 0, 0, okey % 25)"),
    )
    src = str(tmp_path / "img_stream")
    imgs.where("okey % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    imgs.where("okey % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("okey", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("ts", T.TimestampType()),
    ])
    stream_df = streaming.stream_image_channel_stats(spark, src, schema)
    streaming.run_available_now(stream_df, "img_stats_replay")
    got = (
        spark.table("img_stats_replay")
        .groupBy("c")
        .agg(
            F.sum("n_images").cast("long").alias("n"),
            F.sum("sum_v").cast("long").alias("s"),
            F.min("min_v").alias("lo"),
            F.max("max_v").alias("hi"),
        )
        .collect()
    )
    want = (
        imageops.channel_stats(imgs)
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("ch_sum").cast("long").alias("s"),
            F.min("ch_min").alias("lo"),
            F.max("ch_max").alias("hi"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == 3
    # multiple event-time windows actually exercised
    assert spark.table("img_stats_replay").select("start").distinct().count() > 1


def test_stream_sessionize_replay(spark, tmp_path):
    """Stateful sessionization: every session the stream CLOSES (gap
    crossing or event-time timeout) matches the batch gaps-and-islands
    operator tuple-for-tuple, sessions merge correctly ACROSS micro-batch
    boundaries, and most sessions flush (only those inside the final
    watermark+gap horizon may stay open)."""
    from opengxt_spark import sessionize

    world.register_tables(spark, SF)
    batch = {
        (r["user_id"], r["sid"], r["n_events"], r["t_start"], r["t_end"],
         r["sum_v100"])
        for r in spark.sql(sessionize.sessionize_sql()).collect()
    }
    ev = spark.table("events").select(
        "event_id", "ts", "user_id", "value"
    ).orderBy("ts")
    src = str(tmp_path / "sess_src")
    # 8 time-sliced files written oldest-first: >= 2 micro-batches at
    # maxFilesPerTrigger=4, so open sessions must survive a batch boundary.
    import pyspark.sql.functions as F  # noqa: N812

    ranked = ev.withColumn(
        "slice", F.ntile(8).over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.orderBy("ts")
        )
    )
    for i in range(1, 9):
        ranked.where(F.col("slice") == i).drop("slice").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    q = (
        sessionize.stream_sessionize(spark, src, schema)
        .writeStream.format("memory")
        .queryName("sess_replay")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        tuple(r)
        for r in spark.table("sess_replay")
        .select("user_id", "sid", "n_events", "t_start", "t_end", "sum_v100")
        .collect()
    }
    assert got, "stream emitted no closed sessions"
    assert got <= batch, list(got - batch)[:3]
    # the only sessions allowed to stay open are those ending within the
    # watermark horizon (1h) + gap of the stream's max event time
    import datetime

    max_ts = max(r[4] for r in batch)
    horizon = max_ts - datetime.timedelta(seconds=3600 + sessionize.GAP_SECONDS)
    must_close = {r for r in batch if r[4] < horizon}
    assert must_close <= got, list(must_close - got)[:3]


def test_stream_sessionize_sid_survives_timeout(spark, tmp_path):
    """An event-time TIMEOUT closes a session mid-stream; the same user's
    LATER events must continue the batch sid numbering (sid=2), not restart
    at sid=1 — the counter-only state row must survive the timeout."""
    import datetime

    from opengxt_spark import sessionize

    base = datetime.datetime(2026, 1, 1, 0, 0, 0)

    def ev(eid, uid, secs, val=1.0):
        return (eid, base + datetime.timedelta(seconds=secs), uid, val)

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    # batch 1: user1 session A (t=0, t=10); user2 at t=3h advances the
    #   watermark to 2h after the batch, past user1's timeout (t+gap=30m10s).
    # batch 2: user2 only — user1 has NO data, so its timeout FIRES here
    #   (Spark only times out keys without data in the batch).
    # batch 3: user1 at 4h (opens sid=2) then 5h (gap-crossing closes sid=2).
    batches = [
        [ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 3 * 3600)],
        [ev(4, 2, 3 * 3600 + 600)],
        [ev(5, 1, 4 * 3600), ev(6, 1, 5 * 3600)],
    ]
    src = str(tmp_path / "sess_timeout_src")
    for rows in batches:
        df = spark.createDataFrame(rows, schema)
        # 1 data file + 3 empty files fills maxFilesPerTrigger=4 exactly,
        # forcing each list above into its own micro-batch.
        df.coalesce(1).write.mode("append").parquet(src)
        for _ in range(3):
            df.limit(0).coalesce(1).write.mode("append").parquet(src)

    q = (
        sessionize.stream_sessionize(spark, src, schema)
        .writeStream.format("memory")
        .queryName("sess_timeout_replay")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["sid"], r["n_events"])
        for r in spark.table("sess_timeout_replay").collect()
    }
    # session A closed by TIMEOUT carries sid=1; the post-timeout session
    # closed by the 5h gap-crossing event carries sid=2 (batch numbering),
    # NOT a colliding sid=1.
    assert (1, 1, 2) in got, got
    assert (1, 2, 1) in got, got
    assert (1, 1, 1) not in got, got
