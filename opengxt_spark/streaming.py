"""Structured Streaming surface: incremental spatial binning.

The reference is strictly batch (SURVEY.md §2.12 — WPS request/response,
no watermarks or stateful operators anywhere), so streaming is an
*extension* of the engine, not a parity item: the same closed-form bin
assignment expressions run over `readStream` micro-batches, giving
incremental versions of the binning/tiling operators for append-only
feeds (the shape of a continuously-ingested 10^12-image table).

Design: file-source streaming over a parquet directory; event time =
ingest time column; watermark bounds state for windowed aggregation. The
aggregation is the identical `rect_bin_stages` SQL used by the batch
operator, so a complete stream replay equals the batch result exactly
(pytest-checked with the availableNow trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .binning import BBox, WORLD_BBOX, rect_bin_stages


def stream_rect_bins(
    spark: SparkSession,
    input_dir: str,
    schema,
    bbox: BBox = WORLD_BBOX,
    columns: int = 40,
    rows: int = 25,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming rectangular binning: per (window, col, row) weight sums.

    Returns a streaming DataFrame; callers attach a sink
    (``.writeStream``). State is bounded by the event-time watermark —
    late rows beyond it are dropped, everything else lands in its
    10-second window exactly once per micro-batch.
    """
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    staged = src
    for name, sql in rect_bin_stages(bbox, columns, rows):
        staged = staged.withColumn(name, F.expr(sql))
    staged = staged.where(
        (F.col("col") >= 0) & (F.col("row") >= 0)
        & (F.col("col") < columns) & (F.col("row") < rows)
    )
    return (
        staged.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 seconds").alias("win"), "col", "row")
        .agg(F.sum("w").cast("long").alias("val"))
        .select("win.start", "col", "row", "val")
    )


def run_available_now(stream_df: DataFrame, query_name: str):
    """Drain everything currently in the source into an in-memory table and
    stop — the deterministic replay mode used by tests and backfills.

    Complete output mode: append would hold back any window the watermark
    has not passed when the source drains (the final batch's windows never
    emit), while complete re-materializes the full aggregate each batch —
    the right semantics for a bounded replay.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_dedup_first_seen(
    spark: SparkSession,
    input_dir: str,
    schema,
    key_col: str = "fp",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST document per fingerprint
    across all micro-batches — the incremental form of the batch
    ``dedup_exact`` operator for an append-only 10^12-row feed.

    Custom stateful operator via ``applyInPandasWithState`` (the engine's
    one non-windowed stateful surface): state per fingerprint bucket is
    the set of keys already emitted; a micro-batch emits a row iff its key
    is unseen, then folds the key into state. Bucketing by
    ``pmod(hash(fp), 1024)`` keeps per-group state small and the shuffle
    key stable; state never expires (exact dedup has no event-time bound —
    at 100 TB the state store IS the fingerprint index, RocksDB-backed on
    a real cluster).

    Replay equality: a complete replay emits exactly one row per distinct
    key — the row with the smallest ``ts`` (ties: smallest id) seen in
    arrival order per micro-batch; with a single input file per key order
    is deterministic (pytest checks replay == batch first-seen).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    bucketed = src.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(1024))
    )

    out_schema = (
        f"{id_col} long, {key_col} string, ts timestamp"
    )
    state_schema = "seen array<string>"

    def dedup(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", id_col])
            fresh = ~pdf[key_col].isin(seen)
            kept = pdf[fresh].drop_duplicates(subset=[key_col], keep="first")
            if len(kept):
                outs.append(kept[[id_col, key_col, "ts"]])
                seen.update(kept[key_col])
        state.update((list(seen),))
        if outs:
            yield pd.concat(outs)

    return bucketed.groupBy("_bucket").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_pip_count(
    spark: SparkSession,
    input_dir: str,
    schema,
    rects: DataFrame,
    cell_size: float | None = None,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming point-in-polygon join: an append-only point feed against a
    STATIC polygon layer, per (event-time window, zone) counts/weight sums.

    The micro-batch plan is the batch ``pip_count_join`` verbatim — point
    cell assignment (narrow), broadcast of the exploded static rect cells,
    exact containment refine, partial agg — so each trigger does O(batch)
    work and no stream-stream state exists; the only state is the windowed
    aggregation, bounded by the watermark. This is the shape of continuous
    ingest against a curated zone layer at 10^12 rows: the static side is
    planned once per micro-batch and broadcast, the stream side never
    shuffles before the final keyed agg.
    """
    from . import cells as _cells
    from . import joins as _joins
    from . import world as _world

    cs = (
        _joins.adaptive_cell_size(rects)
        if cell_size is None
        else float(cell_size)
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    p = _cells.with_point_cells(src, cell_size=cs)
    r = _cells.explode_extent_cells(_world.rect_corners(rects), cell_size=cs)
    joined = p.join(
        F.broadcast(r), on=["cell_x", "cell_y"], how="inner"
    ).where(F.expr(_world.rect_contains_sql("x", "y")))
    return (
        joined.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 seconds").alias("win"), "rid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("w").cast("long").alias("sum_w"),
        )
        .select("win.start", "rid", "cnt", "sum_w")
    )


def stream_image_channel_stats(
    spark: SparkSession,
    input_dir: str,
    schema,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming multimodal feature extraction: an append-only feed of
    image rows (binary ``bytes`` + typed metadata + event time ``ts``)
    decoded per micro-batch into per-channel statistics, aggregated per
    (event-time window, channel).

    The decode kernel is the batch ``imageops.channel_stats`` verbatim
    (Arrow-batched ``mapInPandas`` is a stateless streaming transform, so
    each trigger does O(batch) decode work and holds no stream state);
    the only state is the watermark-bounded windowed aggregation — the
    shape of continuous image ingest at 10^12 rows, where decode/extract
    happens once per arriving image and only tiny (window, channel)
    aggregates persist.
    """
    from . import imageops as _imageops

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    per_image = _imageops.channel_stats(src, extra=("ts",))
    return (
        per_image.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 seconds").alias("win"), "c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum("ch_sum").cast("long").alias("sum_v"),
            F.min("ch_min").alias("min_v"),
            F.max("ch_max").alias("max_v"),
        )
        .select("win.start", "c", "n_images", "sum_v", "min_v", "max_v")
    )
