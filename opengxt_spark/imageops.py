"""Multimodal image/video column operators over the BASELINE input shape.

The input_hint table (image_id, bytes, w, h, fmt, caption, phash) treats
media as opaque ``binary`` columns with typed metadata. Decode and
feature-extract (phash) live in ``raster.py``; this module adds the
remaining brief-listed multimodal ops — **resize** (bilinear) and
**frame-sample** (video-as-binary) — as Arrow-batched ``mapInPandas``
kernels: the Spark-side plumbing (schema, partitioning, batch shape) is
real and gated; pixel work is vectorized numpy, never per-pixel Python.

At 10^12 images both operators are embarrassingly parallel single-pass
maps — no shuffle, no driver state; the scan's split count is the only
parallelism knob. Wire formats needing codec libs absent from this
container stay stubbed behind ``raster.decode_image``'s
NotImplementedError contract.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import planner, raster, world

# ---------------------------------------------------------------------------
# Bilinear resize kernel (half-pixel-center convention, like OpenCV/PIL)
# ---------------------------------------------------------------------------


def bilinear_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized bilinear resample of an (h, w, c) uint8 array.

    Sampling grid uses the half-pixel-center convention: output pixel i
    samples source coordinate (i + 0.5) * (in/out) - 0.5, clamped at the
    borders. Identity dims reproduce the input bit-exactly (weights hit
    0/1 on integer coordinates); constant images stay constant after the
    floor(v + 0.5) re-quantization (weight products sum to 1 within fp).
    """
    h, w = img.shape[0], img.shape[1]
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = np.clip(xs - x0, 0.0, 1.0)
    fy = np.clip(ys - y0, 0.0, 1.0)
    x0 = np.clip(x0, 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y0 = np.clip(y0, 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    p = img.astype(np.float64)
    a = p[y0][:, x0]
    b = p[y0][:, x1]
    c = p[y1][:, x0]
    d = p[y1][:, x1]
    wx = fx[None, :, None]
    wy = fy[:, None, None]
    out = (
        a * (1.0 - wx) * (1.0 - wy)
        + b * wx * (1.0 - wy)
        + c * (1.0 - wx) * wy
        + d * wx * wy
    )
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """ImageResize over the input-shape table: decode -> bilinear -> rgb8.

    Output keeps every input column except (bytes, w, h, fmt), which are
    replaced by the resized payload — the table stays input-shape so
    resize composes with rasterize/phash/tile-assign downstream.
    """
    keep = [f for f in images.schema.fields
            if f.name not in ("bytes", "w", "h", "fmt")]
    schema = T.StructType(keep + [
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
    ])
    names = [f.name for f in keep]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[names].copy()
            res = []
            for data, w_, h_, fmt in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                img = raster.decode_image(data, int(w_), int(h_), str(fmt))
                res.append(bilinear_resize(img, out_w, out_h).tobytes())
            out["w"] = np.int32(out_w)
            out["h"] = np.int32(out_h)
            out["fmt"] = "rgb8"
            out["bytes"] = res
            yield out

    return planner.ensure_parallelism(images).mapInPandas(gen, schema=schema)


def with_const_bytes(meta: DataFrame) -> DataFrame:
    """Attach constant-color rgb8 payloads (v = okey % 251) — the
    closed-form fixture for the resize gate: bilinear resampling of a
    constant image is that constant at ANY output size."""
    fields = [f for f in meta.schema.fields if f.name != "fmt"]
    schema = T.StructType(fields + [
        T.StructField("fmt", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["fmt"] = "rgb8"
            pdf["bytes"] = [
                np.full(int(w_) * int(h_) * 3, int(k) % 251,
                        dtype=np.uint8).tobytes()
                for k, w_, h_ in zip(pdf["okey"], pdf["w"], pdf["h"])
            ]
            yield pdf

    return meta.mapInPandas(gen, schema=schema)


def image_pixel_sums(images: DataFrame) -> DataFrame:
    """Per-image decoded-pixel sum: (image_id, w, h, pix_sum) — the
    checksum projection the resize/codec gates compare closed-form."""
    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("pix_sum", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums = [
                int(raster.decode_image(d, int(w_), int(h_), str(f_))
                    .astype(np.int64).sum())
                for d, w_, h_, f_ in zip(
                    pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ]
            yield pd.DataFrame({
                "image_id": pdf["image_id"].to_numpy(),
                "w": pdf["w"].astype(np.int32).to_numpy(),
                "h": pdf["h"].astype(np.int32).to_numpy(),
                "pix_sum": np.asarray(sums, dtype=np.int64),
            })

    return images.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Video-as-binary: frame sampling
# ---------------------------------------------------------------------------

FRAME_W = 8
FRAME_H = 6
_VIDEOS_META_SQL = (
    "SELECT image_id, okey, n_frames FROM (SELECT "
    "CONCAT('img_', CAST(o_orderkey AS VARCHAR(32))) AS image_id, "
    "o_orderkey AS okey, "
    "CAST(o_orderkey % 5 + 3 AS INT) AS n_frames FROM orders) v"
)


def videos_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic video column: (image_id, okey, n_frames, fw, fh, fmt,
    bytes) — ``bytes`` is n_frames concatenated rgb8 frames, frame f a
    constant plane of value (okey*7 + f*13) % 256. Deterministic, so the
    sampling gate has a closed-form DuckDB oracle; the binary layout
    (frame-major, fw*fh*3 per frame) is the real multimodal contract."""
    world.register_tables(spark, sf_dir)
    meta = spark.sql(_VIDEOS_META_SQL)
    schema = T.StructType(meta.schema.fields + [
        T.StructField("fw", T.IntegerType()),
        T.StructField("fh", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fsz = FRAME_W * FRAME_H * 3
        for pdf in batches:
            pdf = pdf.copy()
            payload = []
            for k, n in zip(pdf["okey"], pdf["n_frames"]):
                vals = (int(k) * 7 + np.arange(int(n), dtype=np.int64) * 13) % 256
                payload.append(
                    np.repeat(vals.astype(np.uint8), fsz).tobytes()
                )
            pdf["fw"] = np.int32(FRAME_W)
            pdf["fh"] = np.int32(FRAME_H)
            pdf["fmt"] = "rgb8seq"
            pdf["bytes"] = payload
            yield pdf

    return planner.ensure_parallelism(meta).mapInPandas(gen, schema=schema)


def frame_sample(videos: DataFrame, stride: int) -> DataFrame:
    """FrameSample: every ``stride``-th frame of each video payload.

    Output one row per sampled frame: (image_id, frame_idx, fw, fh,
    pix_sum, frame) — ``frame`` the raw rgb8 bytes (input-shape for any
    downstream image op), ``pix_sum`` the decoded checksum the gate
    verifies closed-form. Single-pass map, no shuffle; at video scale the
    explode factor is bounded by n_frames/stride per row.
    """
    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("fw", T.IntegerType()),
        T.StructField("fh", T.IntegerType()),
        T.StructField("pix_sum", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums, frames = [], [], [], []
            for vid, data, fw_, fh_, n in zip(
                pdf["image_id"], pdf["bytes"], pdf["fw"], pdf["fh"],
                pdf["n_frames"],
            ):
                fsz = int(fw_) * int(fh_) * 3
                arr = np.frombuffer(data, dtype=np.uint8)
                for f in range(0, int(n), stride):
                    blk = arr[f * fsz:(f + 1) * fsz]
                    ids.append(vid)
                    idxs.append(f)
                    sums.append(int(blk.astype(np.int64).sum()))
                    frames.append(blk.tobytes())
            yield pd.DataFrame({
                "image_id": ids,
                "frame_idx": np.asarray(idxs, dtype=np.int32),
                "fw": np.full(len(ids), FRAME_W, dtype=np.int32),
                "fh": np.full(len(ids), FRAME_H, dtype=np.int32),
                "pix_sum": np.asarray(sums, dtype=np.int64),
                "frame": frames,
            })

    return videos.mapInPandas(gen, schema=schema)


def _permute_images(
    images: DataFrame,
    xform,
    out_dims,
) -> DataFrame:
    """Shared kernel for index-permutation ops (flip/rotate/crop).

    ``xform(img) -> np.ndarray`` is a pure numpy view/slice transform;
    ``out_dims(w, h) -> (w', h')`` gives the output dimensions. Keeps the
    table input-shape (bytes/w/h/fmt replaced) so permutation ops compose
    with resize/rasterize/phash downstream. Like ``resize_images`` this is
    an embarrassingly parallel single-pass map — no shuffle, no driver
    state; scan splits are the only parallelism knob at 10^12 images.
    """
    keep = [f for f in images.schema.fields
            if f.name not in ("bytes", "w", "h", "fmt")]
    schema = T.StructType(keep + [
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
    ])
    names = [f.name for f in keep]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[names].copy()
            res, ws, hs = [], [], []
            for data, w_, h_, fmt in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                img = raster.decode_image(data, int(w_), int(h_), str(fmt))
                res.append(np.ascontiguousarray(xform(img)).tobytes())
                ow, oh = out_dims(int(w_), int(h_))
                ws.append(ow)
                hs.append(oh)
            out["w"] = np.asarray(ws, dtype=np.int32)
            out["h"] = np.asarray(hs, dtype=np.int32)
            out["fmt"] = "rgb8"
            out["bytes"] = res
            yield out

    return planner.ensure_parallelism(images).mapInPandas(gen, schema=schema)


def flip_images(images: DataFrame, mode: str = "h") -> DataFrame:
    """ImageFlip: mirror each image horizontally (``mode='h'``, left-right)
    or vertically (``'v'``, top-bottom). Dims unchanged."""
    if mode == "h":
        return _permute_images(images, lambda a: a[:, ::-1], lambda w, h: (w, h))
    if mode == "v":
        return _permute_images(images, lambda a: a[::-1], lambda w, h: (w, h))
    raise ValueError(f"mode must be 'h' or 'v', got {mode!r}")


def rotate90_images(images: DataFrame) -> DataFrame:
    """ImageRotate90: rotate each image 90 degrees counter-clockwise
    (``np.rot90`` convention: out[r', c'] = in[c', w-1-r']); output dims
    are the input's swapped (w' = h, h' = w)."""
    return _permute_images(images, np.rot90, lambda w, h: (h, w))


def center_crop_images(images: DataFrame, cw: int, ch: int) -> DataFrame:
    """ImageCenterCrop: the centered ``cw`` x ``ch`` window of each image
    (floor-division offsets, the torchvision convention). Requires
    cw <= w and ch <= h for every row — the kernel asserts it."""

    def xf(a: np.ndarray) -> np.ndarray:
        h, w = a.shape[0], a.shape[1]
        assert cw <= w and ch <= h, (cw, ch, w, h)
        oy, ox = (h - ch) // 2, (w - cw) // 2
        return a[oy:oy + ch, ox:ox + cw]

    return _permute_images(images, xf, lambda w, h: (cw, ch))


def probe_checksums(images: DataFrame) -> DataFrame:
    """Position-weighted decoded checksum: (image_id, w, h, wsum) with
    wsum = sum_i pixel[i] * (i + 1) over the row-major flat index.

    Unlike the plain ``image_pixel_sums`` (which is invariant under any
    pixel permutation), the position weight makes flips/rotations/crops
    hash-distinguishable — the projection the permutation-op gates use.
    Max value 255 * n(n+1)/2 at n = 40*32*3 pixels ~ 1.9e9: int64-safe.
    """
    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("wsum", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums = []
            for d, w_, h_, f_ in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                v = raster.decode_image(
                    d, int(w_), int(h_), str(f_)
                ).reshape(-1).astype(np.int64)
                sums.append(int(np.dot(v, np.arange(1, v.size + 1))))
            yield pd.DataFrame({
                "image_id": pdf["image_id"].to_numpy(),
                "w": pdf["w"].astype(np.int32).to_numpy(),
                "h": pdf["h"].astype(np.int32).to_numpy(),
                "wsum": np.asarray(sums, dtype=np.int64),
            })

    return images.mapInPandas(gen, schema=schema)


# Gate subsample for the permutation-op oracles: okey % 7 = 3 keeps every
# (w, h) combination (7 coprime to the %4 / %3 dim cycles) while bounding
# the DuckDB generate_series fan-out to ~n/7 images x w*h*3 terms.
PERM_GATE_FILTER = "okey % 7 = 3"
_PERM_GATE_META = (
    "SELECT o_orderkey AS okey, "
    "CONCAT('img_', CAST(o_orderkey AS VARCHAR(32))) AS image_id, "
    "CAST(16 + (o_orderkey % 4) * 8 AS INT) AS w, "
    "CAST(16 + (o_orderkey % 3) * 8 AS INT) AS h "
    "FROM orders WHERE o_orderkey % 7 = 3"
)


def _perm_oracle_sql(src_index: str, out_w: str = "w", out_h: str = "h") -> str:
    """Weighted-checksum oracle for a pixel-permutation op.

    ``src_index`` maps the OUTPUT flat index ``i`` (row-major over the
    output dims) to the INPUT flat index, in DuckDB SQL over columns
    (i, w, h) — w/h the INPUT dims. The source pixel value is the
    closed-form generator (okey*31 + j*7) % 256 (raster.gen_pixels).
    """
    return f"""
WITH m AS ({_PERM_GATE_META}),
px AS (SELECT image_id, okey, w, h,
       UNNEST(generate_series(0, ({out_w}) * ({out_h}) * 3 - 1)) AS i
       FROM m)
SELECT image_id,
       CAST({out_w} AS INT) AS w,
       CAST({out_h} AS INT) AS h,
       CAST(SUM(((okey * 31 + ({src_index}) * 7) % 256) * (i + 1))
            AS BIGINT) AS wsum
FROM px GROUP BY image_id, w, h
"""


def flip_h_oracle_sql() -> str:
    """Mirror left-right: source x = w-1-x, same y and channel."""
    j = "((i // (3 * w)) * w + (w - 1 - ((i // 3) % w))) * 3 + (i % 3)"
    return _perm_oracle_sql(j)


def flip_v_oracle_sql() -> str:
    """Mirror top-bottom: source y = h-1-y, same x and channel."""
    j = "((h - 1 - (i // (3 * w))) * w + ((i // 3) % w)) * 3 + (i % 3)"
    return _perm_oracle_sql(j)


def rot90_oracle_sql() -> str:
    """np.rot90 CCW: output (r', c') of shape (w, h) reads input
    (y = c', x = w-1-r'); output flat index i decomposes against the
    OUTPUT dims (rows = w, cols = h)."""
    j = ("(((i // 3) % h) * w + (w - 1 - (i // (3 * h)))) * 3 + (i % 3)")
    return _perm_oracle_sql(j, out_w="h", out_h="w")


def center_crop_oracle_sql(cw: int, ch: int) -> str:
    """Centered window: source (y + (h-ch)//2, x + (w-cw)//2)."""
    j = (
        f"((i // (3 * {cw}) + (h - {ch}) // 2) * w "
        f"+ ((i // 3) % {cw} + (w - {cw}) // 2)) * 3 + (i % 3)"
    )
    return _perm_oracle_sql(j, out_w=str(cw), out_h=str(ch))


def channel_stats(images: DataFrame, extra: tuple = ()) -> DataFrame:
    """Per-channel decoded statistics: (image_id, c, ch_sum, ch_min,
    ch_max) — one row per image per channel (c in 0..2). The per-image
    feature-extraction shape a curation pipeline filters on (e.g. drop
    near-monochrome images); single-pass map, no shuffle. ``extra``
    names input columns to propagate per output row (e.g. the event-time
    column when this kernel runs inside a streaming plan).
    """
    by_name = {f.name: f for f in images.schema.fields}
    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("c", T.IntegerType()),
        T.StructField("ch_sum", T.LongType()),
        T.StructField("ch_min", T.IntegerType()),
        T.StructField("ch_max", T.IntegerType()),
    ] + [by_name[n] for n in extra])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cs, sums, mins, maxs = [], [], [], [], []
            extras: list[list] = [[] for _ in extra]
            for row_i, (vid, d, w_, h_, f_) in enumerate(zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["fmt"],
            )):
                img = raster.decode_image(d, int(w_), int(h_), str(f_))
                flat = img.reshape(-1, 3).astype(np.int64)
                for c in range(3):
                    ids.append(vid)
                    cs.append(c)
                    sums.append(int(flat[:, c].sum()))
                    mins.append(int(flat[:, c].min()))
                    maxs.append(int(flat[:, c].max()))
                    for j, name in enumerate(extra):
                        extras[j].append(pdf[name].iloc[row_i])
            out = pd.DataFrame({
                "image_id": ids,
                "c": np.asarray(cs, dtype=np.int32),
                "ch_sum": np.asarray(sums, dtype=np.int64),
                "ch_min": np.asarray(mins, dtype=np.int32),
                "ch_max": np.asarray(maxs, dtype=np.int32),
            })
            for j, name in enumerate(extra):
                out[name] = extras[j]
            yield out

    return images.mapInPandas(gen, schema=schema)


def channel_stats_oracle_sql() -> str:
    """Closed-form per-channel stats of the gen_pixels pattern on the
    gate subsample: value at flat index i is (okey*31 + i*7) % 256 and
    channel c takes indices i = 3k + c."""
    return f"""
WITH m AS ({_PERM_GATE_META}),
px AS (SELECT image_id, okey, w, h,
       UNNEST(generate_series(0, w * h * 3 - 1)) AS i FROM m)
SELECT image_id,
       CAST(i % 3 AS INT) AS c,
       CAST(SUM((okey * 31 + i * 7) % 256) AS BIGINT) AS ch_sum,
       CAST(MIN((okey * 31 + i * 7) % 256) AS INT) AS ch_min,
       CAST(MAX((okey * 31 + i * 7) % 256) AS INT) AS ch_max
FROM px GROUP BY image_id, i % 3
"""


def frame_sample_oracle_sql(stride: int) -> str:
    """Closed-form DuckDB oracle for ``frame_sample(videos_table(...))``:
    sampled indices are generate_series(0, n_frames-1, stride) and each
    frame's checksum is ((okey*7 + f*13) % 256) * fw*fh*3."""
    fsz = FRAME_W * FRAME_H * 3
    # Scalar-form UNNEST: DuckDB's generate_series TABLE function cannot
    # take lateral column args (same workaround as footprint_tiles_oracle).
    return f"""
WITH v AS ({_VIDEOS_META_SQL}),
s AS (SELECT image_id, okey,
      UNNEST(generate_series(0, n_frames - 1, {stride})) AS f
      FROM v)
SELECT image_id,
       CAST(f AS INT) AS frame_idx,
       CAST({FRAME_W} AS INT) AS fw,
       CAST({FRAME_H} AS INT) AS fh,
       CAST(((okey * 7 + f * 13) % 256) * {fsz} AS BIGINT) AS pix_sum
FROM s
"""


# ---------------------------------------------------------------------------
# Patch extraction (ViT-style), grayscale, histogram, pad — preprocessing
# ---------------------------------------------------------------------------


PATCH = 8  # all synthetic dims (16/24/32/40 x 16/24/32) are multiples of 8


def patchify_images(images: DataFrame, p: int = PATCH) -> DataFrame:
    """ImagePatchify: split each image into non-overlapping ``p`` x ``p``
    patches (the ViT patch-embedding input shape) and emit one row per
    patch: (image_id, px, py, psum, wsum) — ``psum`` the patch pixel sum,
    ``wsum`` the position-weighted checksum over the patch's LOCAL
    row-major flat index (weight l+1, l in [0, p*p*3)), which pins the
    within-patch pixel ORDER, not just the multiset.

    Requires p | w and p | h for every row (asserted). Single-pass
    embarrassingly parallel map; the explode factor is (w/p)*(h/p) per
    image — bounded, no shuffle. At 10^12 images this is the patch-prep
    scan a ViT training pipeline runs before embedding.
    """
    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("psum", T.LongType()),
        T.StructField("wsum", T.LongType()),
    ])
    wts = np.arange(1, p * p * 3 + 1, dtype=np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pxs, pys, psums, wsums = [], [], [], [], []
            for vid, d, w_, h_, f_ in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["fmt"],
            ):
                w, h = int(w_), int(h_)
                assert w % p == 0 and h % p == 0, (w, h, p)
                img = raster.decode_image(d, w, h, str(f_))
                nx, ny = w // p, h // p
                # (ny, p, nx, p, 3) -> (ny, nx, p, p, 3) -> (n, p*p*3)
                mat = (
                    img.reshape(ny, p, nx, p, 3)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(ny * nx, p * p * 3)
                    .astype(np.int64)
                )
                ids.extend([vid] * (ny * nx))
                idx = np.arange(ny * nx)
                pxs.append(idx % nx)
                pys.append(idx // nx)
                psums.append(mat.sum(axis=1))
                wsums.append(mat @ wts)
            yield pd.DataFrame({
                "image_id": ids,
                "px": np.concatenate(pxs).astype(np.int32)
                if pxs else np.array([], dtype=np.int32),
                "py": np.concatenate(pys).astype(np.int32)
                if pys else np.array([], dtype=np.int32),
                "psum": np.concatenate(psums).astype(np.int64)
                if psums else np.array([], dtype=np.int64),
                "wsum": np.concatenate(wsums).astype(np.int64)
                if wsums else np.array([], dtype=np.int64),
            })

    return planner.ensure_parallelism(images).mapInPandas(gen, schema=schema)


def patchify_oracle_sql(p: int = PATCH) -> str:
    """Closed-form patch oracle: one pixel series per image, grouped by
    (patch-x, patch-y); the local weight l is rebuilt from the global
    index's (row, col, channel) decomposition."""
    return f"""
WITH m AS ({_PERM_GATE_META}),
px AS (SELECT image_id, okey, w, h,
       UNNEST(generate_series(0, w * h * 3 - 1)) AS i FROM m),
t AS (SELECT image_id,
      ((i // 3) % w) // {p} AS px,
      (i // (3 * w)) // {p} AS py,
      (((i // (3 * w)) % {p}) * {p} + ((i // 3) % w) % {p}) * 3 + i % 3
        AS l,
      (okey * 31 + i * 7) % 256 AS v
      FROM px)
SELECT image_id, CAST(px AS INT) AS px, CAST(py AS INT) AS py,
       CAST(SUM(v) AS BIGINT) AS psum,
       CAST(SUM(v * (l + 1)) AS BIGINT) AS wsum
FROM t GROUP BY image_id, px, py
"""


def grayscale_images(images: DataFrame) -> DataFrame:
    """ImageGrayscale: ITU-R BT.601 integer luma, y = (299R + 587G +
    114B) // 1000 — exact integer math so the oracle reproduces it
    bit-for-bit. Output keeps the input shape with fmt='gray8' and
    single-channel bytes (w*h uint8)."""
    keep = [f for f in images.schema.fields
            if f.name not in ("bytes", "fmt")]
    schema = T.StructType(keep + [
        T.StructField("fmt", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
    ])
    names = [f.name for f in keep]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[names].copy()
            res = []
            for d, w_, h_, f_ in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                img = raster.decode_image(
                    d, int(w_), int(h_), str(f_)
                ).astype(np.int64)
                lum = (
                    299 * img[:, :, 0] + 587 * img[:, :, 1]
                    + 114 * img[:, :, 2]
                ) // 1000
                res.append(lum.astype(np.uint8).tobytes())
            out["fmt"] = "gray8"
            out["bytes"] = res
            yield out

    return planner.ensure_parallelism(images).mapInPandas(gen, schema=schema)


def gray_checksums(gray: DataFrame) -> DataFrame:
    """Weighted checksum over a gray8 table: (image_id, w, h, lsum,
    lwsum) with lsum = sum(luma), lwsum = sum(luma[k] * (k+1))."""
    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("lsum", T.LongType()),
        T.StructField("lwsum", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ls, lw = [], []
            for d, f_ in zip(pdf["bytes"], pdf["fmt"]):
                assert str(f_) == "gray8", f_
                v = np.frombuffer(d, dtype=np.uint8).astype(np.int64)
                ls.append(int(v.sum()))
                lw.append(int(np.dot(v, np.arange(1, v.size + 1))))
            yield pd.DataFrame({
                "image_id": pdf["image_id"].to_numpy(),
                "w": pdf["w"].astype(np.int32).to_numpy(),
                "h": pdf["h"].astype(np.int32).to_numpy(),
                "lsum": np.asarray(ls, dtype=np.int64),
                "lwsum": np.asarray(lw, dtype=np.int64),
            })

    return gray.mapInPandas(gen, schema=schema)


_LUMA_TERMS = (
    "(299 * ((okey * 31 + (3 * k) * 7) % 256) "
    "+ 587 * ((okey * 31 + (3 * k + 1) * 7) % 256) "
    "+ 114 * ((okey * 31 + (3 * k + 2) * 7) % 256)) // 1000"
)


def grayscale_oracle_sql() -> str:
    """Closed-form BT.601 integer-luma oracle over the gate subsample:
    pixel k's channels sit at flat indices 3k/3k+1/3k+2 of gen_pixels."""
    return f"""
WITH m AS ({_PERM_GATE_META}),
px AS (SELECT image_id, okey, w, h,
       UNNEST(generate_series(0, w * h - 1)) AS k FROM m),
t AS (SELECT image_id, w, h, k, {_LUMA_TERMS} AS lum FROM px)
SELECT image_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
       CAST(SUM(lum) AS BIGINT) AS lsum,
       CAST(SUM(lum * (k + 1)) AS BIGINT) AS lwsum
FROM t GROUP BY image_id, w, h
"""


def value_histogram(images: DataFrame, nbins: int = 16) -> DataFrame:
    """Per-image histogram of decoded byte values in ``nbins`` equal
    bins over [0, 256) — the quality/anomaly-score primitive (a spike in
    one bin flags synthetic or clipped images). Output (image_id, bin,
    cnt); absent bins are omitted (sparse)."""
    assert 256 % nbins == 0, nbins
    width = 256 // nbins
    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bins, cnts = [], [], []
            for vid, d, w_, h_, f_ in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["fmt"],
            ):
                v = raster.decode_image(
                    d, int(w_), int(h_), str(f_)
                ).reshape(-1)
                c = np.bincount(v // width, minlength=nbins)
                nz = np.nonzero(c)[0]
                ids.extend([vid] * len(nz))
                bins.append(nz)
                cnts.append(c[nz])
            yield pd.DataFrame({
                "image_id": ids,
                "bin": np.concatenate(bins).astype(np.int32)
                if bins else np.array([], dtype=np.int32),
                "cnt": np.concatenate(cnts).astype(np.int64)
                if cnts else np.array([], dtype=np.int64),
            })

    return planner.ensure_parallelism(images).mapInPandas(gen, schema=schema)


def value_histogram_oracle_sql(nbins: int = 16) -> str:
    width = 256 // nbins
    return f"""
WITH m AS ({_PERM_GATE_META}),
px AS (SELECT image_id, okey, w, h,
       UNNEST(generate_series(0, w * h * 3 - 1)) AS i FROM m)
SELECT image_id,
       CAST(((okey * 31 + i * 7) % 256) // {width} AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM px GROUP BY image_id, bin
"""


def pad_square_images(images: DataFrame) -> DataFrame:
    """ImagePadSquare: zero-pad right/bottom to max(w, h) x max(w, h) —
    the aspect-preserving squarify every fixed-input-shape model
    pipeline applies before resize. Composes with the permutation-gate
    checksum like flip/rotate/crop."""

    def xf(a: np.ndarray) -> np.ndarray:
        h, w = a.shape[0], a.shape[1]
        s = max(w, h)
        return np.pad(a, ((0, s - h), (0, s - w), (0, 0)))

    return _permute_images(
        images, xf, lambda w, h: (max(w, h), max(w, h)))


def pad_square_oracle_sql() -> str:
    """Weighted checksum over the padded S x S output: source pixels
    where (x < w AND y < h), zeros elsewhere (zero terms drop out of the
    sum but the (i+1) weighting still pins their positions)."""
    return f"""
WITH m AS ({_PERM_GATE_META}),
d AS (SELECT image_id, okey, w, h, GREATEST(w, h) AS s FROM m),
px AS (SELECT image_id, okey, w, h, s,
       UNNEST(generate_series(0, s * s * 3 - 1)) AS i FROM d)
SELECT image_id,
       CAST(s AS INT) AS w, CAST(s AS INT) AS h,
       CAST(SUM(CASE WHEN ((i // 3) % s) < w AND (i // (3 * s)) < h
            THEN ((okey * 31
                   + ((i // (3 * s)) * w + (i // 3) % s) * 3 * 7
                   + (i % 3) * 7) % 256) * (i + 1)
            ELSE 0 END) AS BIGINT) AS wsum
FROM px GROUP BY image_id, s
"""


# ---------------------------------------------------------------------------
# Curation: exact content dedup, aspect-ratio bucketing, brightness filter
# ---------------------------------------------------------------------------


def exact_dedup_images(images: DataFrame) -> DataFrame:
    """Exact image dedup by content hash over the FULL table: group by
    sha2(bytes) (plus dims, belt-and-braces against truncated payloads)
    and emit one row per duplicate class: (canon_okey, n_copies,
    grp_bytes). At 10^12 images this is a single hash-shuffle on a
    256-bit key with map-side partial aggregation — the linear-scale
    dedup pass every training-data pipeline runs first.

    The synthetic generator makes classes closed-form (pixel value
    (okey*31 + 7i) % 256 with dims from okey % 4 / % 3, so images are
    identical iff okey ≡ okey' mod 768) — which is what lets the gate
    verify a CONTENT-hash grouping against a metadata-only oracle.
    """
    return (
        images.groupBy(
            F.sha2(F.col("bytes"), 256).alias("chash"),
            "w", "h",
        )
        .agg(
            F.min("okey").alias("canon_okey"),
            F.count("*").alias("n_copies"),
            F.sum(F.expr("CAST(w AS BIGINT) * h * 3")).alias("grp_bytes"),
        )
        .drop("chash", "w", "h")
    )


def exact_dedup_oracle_sql() -> str:
    return """
SELECT MIN(o_orderkey) AS canon_okey,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(SUM(CAST((16 + (o_orderkey % 4) * 8) AS BIGINT)
                * (16 + (o_orderkey % 3) * 8) * 3) AS BIGINT) AS grp_bytes
FROM orders GROUP BY o_orderkey % 768
"""


def aspect_ratio_buckets(images: DataFrame) -> DataFrame:
    """Aspect-ratio bucketing over the FULL table: group images by the
    integer per-mille ratio w*1000//h (how batch-shape bucketing groups
    variable-AR images for padded-batch training). Output (ar_mille,
    n_images, px_total). Pure Catalyst aggregation — no decode."""
    return (
        images.groupBy(
            F.expr("CAST(w * 1000 DIV h AS INT)").alias("ar_mille"))
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.expr("CAST(w AS BIGINT) * h")).alias("px_total"),
        )
    )


def aspect_ratio_oracle_sql() -> str:
    return """
SELECT CAST((16 + (o_orderkey % 4) * 8) * 1000
            // (16 + (o_orderkey % 3) * 8) AS INT) AS ar_mille,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(CAST((16 + (o_orderkey % 4) * 8) AS BIGINT)
                * (16 + (o_orderkey % 3) * 8)) AS BIGINT) AS px_total
FROM orders GROUP BY ar_mille
"""


# Brightness cut: keep images whose mean integer luma exceeds 2029/16
# (= 126.8125, the synthetic population's median) — exact integer
# comparison 16*lsum > 2029*w*h on both engines, no float thresholds.
BRIGHT_NUM = 2029
BRIGHT_DEN = 16


def brightness_filter(images: DataFrame) -> DataFrame:
    """Curation filter: keep images with mean BT.601 luma above the
    population median; emit (image_id, w, h, lsum). Decode + luma sum is
    one Arrow-batched map, the cut an exact integer predicate — the
    shape of every decode-then-threshold quality filter."""
    return gray_checksums(grayscale_images(images)).where(
        F.expr(f"{BRIGHT_DEN} * lsum > {BRIGHT_NUM} * CAST(w AS BIGINT) * h")
    ).drop("lwsum")


def brightness_filter_oracle_sql() -> str:
    return f"""
WITH m AS ({_PERM_GATE_META}),
px AS (SELECT image_id, okey, w, h,
       UNNEST(generate_series(0, w * h - 1)) AS k FROM m),
t AS (SELECT image_id, w, h, SUM({_LUMA_TERMS}) AS lsum
      FROM px GROUP BY image_id, w, h)
SELECT image_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
       CAST(lsum AS BIGINT) AS lsum
FROM t WHERE {BRIGHT_DEN} * lsum > {BRIGHT_NUM} * w * h
"""


# ---------------------------------------------------------------------------
# Video: temporal difference (shot-boundary primitive)
# ---------------------------------------------------------------------------


def temporal_diff(videos: DataFrame) -> DataFrame:
    """VideoTemporalDiff: sum of absolute pixel differences between each
    consecutive frame pair — the scene-change/shot-boundary score a video
    curation pipeline thresholds. Output (image_id, frame_idx, diff_sum)
    for frame_idx in [0, n_frames-2]. Single-pass map over the packed
    frame-major payload; explode factor n_frames-1 per video."""
    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("diff_sum", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for vid, data, fw_, fh_, n in zip(
                pdf["image_id"], pdf["bytes"], pdf["fw"], pdf["fh"],
                pdf["n_frames"],
            ):
                fsz = int(fw_) * int(fh_) * 3
                fr = np.frombuffer(data, dtype=np.uint8).reshape(
                    int(n), fsz).astype(np.int64)
                d = np.abs(fr[1:] - fr[:-1]).sum(axis=1)
                ids.extend([vid] * (int(n) - 1))
                idxs.append(np.arange(int(n) - 1))
                sums.append(d)
            yield pd.DataFrame({
                "image_id": ids,
                "frame_idx": np.concatenate(idxs).astype(np.int32)
                if idxs else np.array([], dtype=np.int32),
                "diff_sum": np.concatenate(sums).astype(np.int64)
                if sums else np.array([], dtype=np.int64),
            })

    return videos.mapInPandas(gen, schema=schema)


def temporal_diff_oracle_sql() -> str:
    """Frames are constant planes of (okey*7 + f*13) % 256, so the
    consecutive-frame L1 distance is ABS(plane(f+1) - plane(f)) * fsz."""
    fsz = FRAME_W * FRAME_H * 3
    return f"""
WITH v AS ({_VIDEOS_META_SQL}),
s AS (SELECT image_id, okey,
      UNNEST(generate_series(0, n_frames - 2)) AS f
      FROM v WHERE n_frames >= 2)
SELECT image_id,
       CAST(f AS INT) AS frame_idx,
       CAST(ABS((okey * 7 + (f + 1) * 13) % 256
                - (okey * 7 + f * 13) % 256) * {fsz} AS BIGINT) AS diff_sum
FROM s
"""


def nn_resize_images(images: DataFrame, ow: int, oh: int) -> DataFrame:
    """ImageResize (nearest-neighbor, floor convention: src col =
    x*w // ow, src row = y*h // oh) to an arbitrary output size. Unlike
    bilinear (gated only at its closed-form identity/constant points),
    the NN index map is exact integer math, so REAL pattern images gate
    at any scale factor."""

    def xf(a: np.ndarray) -> np.ndarray:
        h, w = a.shape[0], a.shape[1]
        iy = (np.arange(oh, dtype=np.int64) * h) // oh
        ix = (np.arange(ow, dtype=np.int64) * w) // ow
        return a[iy][:, ix]

    return _permute_images(images, xf, lambda w, h: (ow, oh))


def nn_resize_oracle_sql(ow: int, oh: int) -> str:
    """Weighted checksum through the NN index map: output flat index i
    (over ow*oh*3) reads source flat index ((y*h//oh)*w + x*w//ow)*3+c."""
    j = (
        f"(((i // (3 * {ow})) * h // {oh}) * w "
        f"+ ((i // 3) % {ow}) * w // {ow}) * 3 + i % 3"
    )
    return _perm_oracle_sql(j, out_w=str(ow), out_h=str(oh))


# ---------------------------------------------------------------------------
# Fused augmentation chain (flip_h -> rot90 -> center_crop in ONE pass)
# ---------------------------------------------------------------------------

# The individual permutation maps as (output-flat-index -> input-flat-index)
# DuckDB formulas over INPUT dims (w, h) — the same strings the single-op
# oracles use, factored so the chain oracle can compose them textually.
_FLIP_H_J = "((i // (3 * w)) * w + (w - 1 - ((i // 3) % w))) * 3 + (i % 3)"
_ROT90_J = "(((i // 3) % h) * w + (w - 1 - (i // (3 * h)))) * 3 + (i % 3)"


def _sub_i(formula: str, repl: str) -> str:
    """Substitute the standalone index variable ``i`` in a map formula."""
    import re

    return re.sub(r"\bi\b", f"({repl})", formula)


def augment_chain_images(images: DataFrame, cw: int, ch: int) -> DataFrame:
    """Fused augmentation chain flip_h -> rot90(CCW) -> center_crop(cw,ch)
    in ONE decode/encode pass (numpy views compose lazily; only the final
    crop is materialized). A 3-op torchvision-style pipeline run as three
    separate operators costs 3 decodes + 3 encodes + 3 Arrow hops per
    image; the fused kernel costs 1 of each — at 10^12 images the
    difference is the whole augmentation budget. Requires cw <= h and
    ch <= w for every row (dims swap at the rot90 step)."""

    def xf(a: np.ndarray) -> np.ndarray:
        b = np.rot90(a[:, ::-1])          # (h,w,3) -> (w,h,3), both views
        hh, ww = b.shape[0], b.shape[1]
        assert cw <= ww and ch <= hh, (cw, ch, ww, hh)
        oy, ox = (hh - ch) // 2, (ww - cw) // 2
        return b[oy:oy + ch, ox:ox + cw]

    return _permute_images(images, xf, lambda w, h: (cw, ch))


def augment_chain_oracle_sql(cw: int, ch: int) -> str:
    """Composed index-map oracle: crop-over-(h,w) o rot90 o flip_h.

    Each stage's verified single-op formula is substituted into the next
    (output index walks backwards through the chain), so the oracle IS
    the composition — no hand-derived closed form to get wrong."""
    # center_crop formula with input dims (W,H) = (h,w) (post-rot90):
    j3 = (
        f"((i // (3 * {cw}) + (w - {ch}) // 2) * h "
        f"+ ((i // 3) % {cw} + (h - {cw}) // 2)) * 3 + (i % 3)"
    )
    j2 = _sub_i(_ROT90_J, j3)    # rot90 source over input dims (w, h)
    j1 = _sub_i(_FLIP_H_J, j2)   # flip_h source over input dims (w, h)
    return _perm_oracle_sql(j1, out_w=str(cw), out_h=str(ch))


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (portable md5 bucket hash)
# ---------------------------------------------------------------------------

SPLIT_BUCKETS = 65536
TRAIN_CUT = 52429  # floor(0.8 * 65536) + 1 boundary -> 80.0005% train
VAL_CUT = 58982    # +10% val, rest test


def md5_bucket_sql(expr: str) -> str:
    """Integer in [0, 65536) from the first 4 hex digits of md5(expr),
    written in SQL that evaluates identically on Spark and DuckDB
    (md5/substr/instr exist in both with the same semantics). The
    engine-portable deterministic hash every split/sample op here uses."""
    terms = []
    for k in range(1, 5):
        d = f"(instr('0123456789abcdef', substr(md5({expr}), {k}, 1)) - 1)"
        terms.append(f"{d} * {16 ** (4 - k)}")
    return "(" + " + ".join(terms) + ")"


SPLIT_CASE_SQL = (
    f"CASE WHEN {md5_bucket_sql('image_id')} < {TRAIN_CUT} THEN 'train' "
    f"WHEN {md5_bucket_sql('image_id')} < {VAL_CUT} THEN 'val' "
    "ELSE 'test' END"
)


def train_split(meta: DataFrame) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5(image_id)
    bucket — stable across runs, cluster sizes, and row order (the split
    is a pure function of the id, so adding images never reshuffles
    existing assignments). Returns per-split (split, n_images, okey_sum,
    px_total); the full assignment is the same expression un-aggregated."""
    return (
        meta.withColumn("split", F.expr(SPLIT_CASE_SQL))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("okey").alias("okey_sum"),
            F.sum(F.expr("CAST(w AS BIGINT) * h")).alias("px_total"),
        )
    )


_FULL_META = (
    "SELECT o_orderkey AS okey, "
    "CONCAT('img_', CAST(o_orderkey AS VARCHAR(32))) AS image_id, "
    "CAST(16 + (o_orderkey % 4) * 8 AS INT) AS w, "
    "CAST(16 + (o_orderkey % 3) * 8 AS INT) AS h, "
    "CONCAT('cap ', o_orderpriority, ' ', CAST(o_orderkey AS VARCHAR(32))) "
    "AS caption "
    "FROM orders"
)


def train_split_oracle_sql() -> str:
    return f"""
WITH m AS ({_FULL_META})
SELECT {SPLIT_CASE_SQL} AS split,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(okey) AS BIGINT) AS okey_sum,
       CAST(SUM(CAST(w AS BIGINT) * h) AS BIGINT) AS px_total
FROM m GROUP BY split
"""


#: caption normalization for collision classes: digit runs collapse to
#: '#' ('cap 2-HIGH 4711' -> 'cap #-HIGH #'), so captions differing only
#: in serial numbers/ids land in one class.
CAPTION_CLASS_SQL = "regexp_replace(caption, '[0-9]+', '#')"


def caption_collision(spark, sf_dir: str):
    """Label-noise audit: caption CLASSES (digit runs normalized away)
    attached to more than one distinct image content (phash proxy) — the
    groups a naive caption-dedup would wrongly collapse and a trainer
    should weight or re-caption. One hash aggregation over the metadata
    (map-side partial agg, linear at 10^12 rows). Output
    (caption_class, n_images, n_contents, okey_min)."""
    from . import raster

    meta = raster.images_meta(spark, sf_dir)
    return (
        meta.groupBy(F.expr(CAPTION_CLASS_SQL).alias("caption_class"))
        .agg(
            F.count("*").alias("n_images"),
            F.countDistinct("phash").alias("n_contents"),
            F.min("okey").alias("okey_min"),
        )
        .where("n_contents > 1")
    )


def caption_collision_oracle_sql() -> str:
    from . import raster

    return f"""
WITH m AS ({raster.IMAGES_META_SQL_DUCK})
SELECT regexp_replace(caption, '[0-9]+', '#', 'g') AS caption_class,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(COUNT(DISTINCT phash) AS BIGINT) AS n_contents,
       CAST(MIN(okey) AS BIGINT) AS okey_min
FROM m GROUP BY caption_class HAVING COUNT(DISTINCT phash) > 1
"""


def split_leakage(spark, sf_dir: str, max_hamming: int = 3):
    """Train/val/test LEAKAGE audit: near-duplicate image pairs (phash
    Hamming <= max_hamming) whose two members landed in DIFFERENT splits
    — the rows a curation pipeline must quarantine before the validation
    metric means anything. Composition of the pigeonhole phash near-dup
    join with the deterministic split expression, the split CARRIED
    through the existing chunk shuffle (no extra meta joins; see
    `raster.phash_neardup(carry=...)`). Output one row per leaking pair:
    (okey_a, okey_b, hamming, split_a, split_b)."""
    from . import raster

    pairs = raster.phash_neardup(
        spark, sf_dir, max_hamming, carry={"split": SPLIT_CASE_SQL}
    )
    return pairs.where("split_a != split_b")


def split_leakage_oracle_sql(max_hamming: int = 3) -> str:
    from . import raster

    return f"""
WITH pairs AS ({raster.phash_neardup_oracle(max_hamming)}),
m AS ({_FULL_META}),
s AS (SELECT okey, {SPLIT_CASE_SQL} AS split FROM m)
SELECT p.okey_a, p.okey_b, p.hamming,
       sa.split AS split_a, sb.split AS split_b
FROM pairs p
JOIN s sa ON sa.okey = p.okey_a
JOIN s sb ON sb.okey = p.okey_b
WHERE sa.split <> sb.split
"""


# ---------------------------------------------------------------------------
# Image diversity score (exact-integer Gini-Simpson over the histogram)
# ---------------------------------------------------------------------------

def image_diversity(images: DataFrame, nbins: int = 16) -> DataFrame:
    """Per-image diversity from the ``nbins`` value histogram: emit
    (image_id, n, sumsq) with sumsq = sum of squared bin counts. The
    Gini-Simpson diversity 1 - sumsq/n^2 orders images identically, but
    the integers are EXACT cross-engine (a Shannon entropy would hang the
    gate on sub-ulp libm log differences) — the quality-filter primitive
    for flagging near-constant (low-diversity) images."""
    return (
        value_histogram(images, nbins)
        .groupBy("image_id")
        .agg(
            F.sum("cnt").alias("n"),
            F.sum(F.expr("cnt * cnt")).alias("sumsq"),
        )
    )


def image_diversity_oracle_sql(nbins: int = 16) -> str:
    return f"""
WITH hist AS ({value_histogram_oracle_sql(nbins)})
SELECT image_id, CAST(SUM(cnt) AS BIGINT) AS n,
       CAST(SUM(cnt * cnt) AS BIGINT) AS sumsq
FROM hist GROUP BY image_id
"""


# ---------------------------------------------------------------------------
# Size-targeted shard plan (manifest-level bin packing)
# ---------------------------------------------------------------------------

def shard_plan(meta: DataFrame, target_bytes: int) -> DataFrame:
    """Assign images to size-targeted shards by running-size cutoff in
    okey order: shard k holds the rows whose PRECEDING payload total is in
    [k*target, (k+1)*target). Output one row per shard: (shard_id,
    n_images, shard_bytes, okey_min, okey_max).

    Scale note: the global ordered window is intentional — this op runs
    at MANIFEST grain. At 10^12 images the input is the per-file lineage
    table (~10^6 rows, one per parquet file), not per-image rows; the
    per-image shard assignment inside a file is then file-local. The
    actual tar sink (opengxt_spark.wds) never runs a global window: it
    range-partitions by okey and packs within tasks."""
    nbytes = "CAST(w AS BIGINT) * h * 3 + length(caption)"
    withb = meta.select(
        "okey", F.expr(nbytes).alias("nbytes")
    ).withColumn(
        "prev",
        F.expr(
            "COALESCE(SUM(nbytes) OVER (ORDER BY okey ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        ),
    )
    return (
        withb.withColumn("shard_id", F.expr(f"CAST(prev DIV {target_bytes} AS INT)"))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("nbytes").alias("shard_bytes"),
            F.min("okey").alias("okey_min"),
            F.max("okey").alias("okey_max"),
        )
    )


def shard_plan_oracle_sql(target_bytes: int) -> str:
    return f"""
WITH m AS ({_FULL_META}),
b AS (SELECT okey, CAST(w AS BIGINT) * h * 3 + length(caption) AS nbytes
      FROM m),
p AS (SELECT okey, nbytes,
      COALESCE(SUM(nbytes) OVER (ORDER BY okey ROWS BETWEEN UNBOUNDED
      PRECEDING AND 1 PRECEDING), 0) AS prev FROM b)
SELECT CAST(prev // {target_bytes} AS INT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(nbytes) AS BIGINT) AS shard_bytes,
       CAST(MIN(okey) AS BIGINT) AS okey_min,
       CAST(MAX(okey) AS BIGINT) AS okey_max
FROM p GROUP BY shard_id
"""


def dedup_canonical(images: DataFrame) -> DataFrame:
    """Exact-dedup SURVIVOR set: one canonical row per duplicate class
    (min okey wins), with the class size — the filtered table a curation
    pipeline actually trains on, vs `exact_dedup_images` which reports
    the classes. Same single hash-shuffle with map-side partial agg;
    linear at 10^12 images."""
    return (
        images.groupBy(F.sha2(F.col("bytes"), 256).alias("chash"), "w", "h")
        .agg(
            F.min("okey").alias("okey"),
            F.count("*").alias("n_dups"),
        )
        .select("okey", "w", "h", "n_dups")
    )


def dedup_canonical_oracle_sql() -> str:
    """Duplicate classes are okey ≡ okey' (mod 768) with identical dims
    (see exact_dedup_images); the canonical row's dims follow from its
    okey since all class members agree mod 4 and mod 3."""
    return """
SELECT CAST(MIN(o_orderkey) AS BIGINT) AS okey,
       CAST(16 + (MIN(o_orderkey) % 4) * 8 AS INT) AS w,
       CAST(16 + (MIN(o_orderkey) % 3) * 8 AS INT) AS h,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM orders GROUP BY o_orderkey % 768
"""
