"""GeoTIFF interchange — the raster half of the reference's export surface.

Reference parity: RasterExportOperation / GeoTiff DataStore round-trips
(GT/storage, SURVEY §2.1 "Shape/Raster export"). Built from the PUBLIC
TIFF 6.0 specification plus the GeoTIFF 1.1 tag set (ModelPixelScale,
ModelTiepoint, GeoKeyDirectory) — uncompressed, single-strip, one 16-bit
grayscale sample per pixel, which is exactly what the engine's integer
value raster needs. No codec library involved, so the container constraint
that stubs lossy imagery (raster.py) does not apply here.

Distribution contract (same as the shapefile sink):

- **Export** tiles the raster grid and writes one ``tile-TX-TY.tif`` per
  tile via ``applyInPandas`` over the (tile_x, tile_y) groups — each tile
  is one task, the lineage frame (file, rows, bytes) is the manifest. At
  100 TB rasters this is the standard COG-style sharding: tiles are
  independent, resumable, and parallel both ways.
- **Import** scans the shard directory with ``binaryFile`` and parses each
  tile in an Arrow-batched pass back to (ix, iy, px, py, v) pixel rows.

Georeferencing: GeoKey RasterTypeGeoKey = PixelIsPoint, so the tiepoint
maps raster (0,0) directly to the TOP-LEFT pixel CENTER; rows run north to
south (the TIFF convention), ``ModelPixelScale = (sx, sy, 0)`` with
``py(row) = tiepoint_y - row * sy``. All grid coordinates are exact small
integers scaled by exact doubles, so the round-trip is bit-exact.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("rows", T.LongType()),
        T.StructField("bytes", T.LongType()),
    ]
)

_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("ix", T.LongType()),
        T.StructField("iy", T.LongType()),
        T.StructField("px", T.DoubleType()),
        T.StructField("py", T.DoubleType()),
        T.StructField("v", T.LongType()),
    ]
)

_PIXEL_SCHEMA_F = T.StructType(
    [
        T.StructField("ix", T.LongType()),
        T.StructField("iy", T.LongType()),
        T.StructField("px", T.DoubleType()),
        T.StructField("py", T.DoubleType()),
        T.StructField("v", T.DoubleType()),
    ]
)

# TIFF type codes
_SHORT, _LONG, _DOUBLE = 3, 4, 12


def _ifd_entry(tag: int, typ: int, count: int, value: int) -> bytes:
    """12-byte IFD entry; ``value`` is either the inline value (left-packed
    for SHORT) or an absolute offset for external data."""
    if typ == _SHORT and count == 1:
        return struct.pack("<HHIHH", tag, typ, count, value, 0)
    return struct.pack("<HHII", tag, typ, count, value)


def tile_tif_bytes(
    pix: np.ndarray,
    x0: float,
    y_top: float,
    sx: float = 2.0,
    sy: float = 2.0,
    compress: bool = False,
) -> bytes:
    """Encode one tile (2-D array, row 0 = northmost) as a minimal GeoTIFF.
    ``(x0, y_top)`` is the world position of the top-left pixel CENTER
    (PixelIsPoint). Sample type follows the array dtype: uint16 ->
    16-bit unsigned; float32 -> 32-bit IEEE float (SampleFormat=3, the
    reference's float-DEM case, e.g. its sfdem.tif fixture). ``compress``
    selects Deflate (TIFF Compression=8, stdlib zlib) — bit-exact, smaller
    shards."""
    h, w = pix.shape
    if pix.dtype == np.uint16:
        bits, sfmt = 16, 1
        strip = pix.astype("<u2").tobytes()
    elif pix.dtype == np.float32:
        bits, sfmt = 32, 3
        strip = pix.astype("<f4").tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {pix.dtype}")
    comp = 1
    if compress:
        import zlib

        strip = zlib.compress(strip, 6)
        comp = 8
    # GeoKeyDirectory: version 1.1.0, 2 keys — GTModelType = user-defined
    # (32767; the engine's planar world carries no EPSG code) and
    # GTRasterType = 2 (PixelIsPoint: tiepoint maps the pixel CENTER).
    keys = struct.pack("<12H", 1, 1, 0, 2, 1024, 0, 1, 32767, 1025, 0, 1, 2)
    # layout: header(8) | IFD | scale(24) | tiepoint(48) | geokeys | strip
    n_entries = 13
    ifd_size = 2 + n_entries * 12 + 4
    off_scale = 8 + ifd_size
    off_tie = off_scale + 24
    off_keys = off_tie + 48
    off_strip = off_keys + len(keys)
    # TIFF requires ascending tag order — the list below is sorted.
    entries = [
        _ifd_entry(256, _LONG, 1, w),                 # ImageWidth
        _ifd_entry(257, _LONG, 1, h),                 # ImageLength
        _ifd_entry(258, _SHORT, 1, bits),             # BitsPerSample
        _ifd_entry(259, _SHORT, 1, comp),             # Compression
        _ifd_entry(262, _SHORT, 1, 1),                # Photometric: BlackIsZero
        _ifd_entry(273, _LONG, 1, off_strip),         # StripOffsets
        _ifd_entry(277, _SHORT, 1, 1),                # SamplesPerPixel
        _ifd_entry(278, _LONG, 1, h),                 # RowsPerStrip: 1 strip
        _ifd_entry(279, _LONG, 1, len(strip)),        # StripByteCounts
        _ifd_entry(339, _SHORT, 1, sfmt),             # SampleFormat
        _ifd_entry(33550, _DOUBLE, 3, off_scale),     # ModelPixelScale
        _ifd_entry(33922, _DOUBLE, 6, off_tie),       # ModelTiepoint
        _ifd_entry(34735, _SHORT, 12, off_keys),      # GeoKeyDirectory
    ]
    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd = struct.pack("<H", n_entries) + b"".join(entries) + struct.pack("<I", 0)
    scale = struct.pack("<3d", sx, sy, 0.0)
    tie = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y_top, 0.0)
    return header + ifd + scale + tie + keys + strip


def parse_tif(buf: bytes) -> tuple[np.ndarray, float, float, float, float]:
    """Decode a tile written by :func:`tile_tif_bytes` (or any single-strip
    grayscale little-endian TIFF — 16-bit unsigned or 32-bit IEEE float,
    uncompressed or Deflate — with GeoTIFF scale + tiepoint).
    Returns (pixels[h,w], x0, y_top, sx, sy)."""
    if buf[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        tag, typ, count, val = struct.unpack_from(
            "<HHII", buf, ifd_off + 2 + 12 * i
        )
        if typ == _SHORT and count == 1:
            val &= 0xFFFF
        tags[tag] = (typ, count, val)
    w = tags[256][2]
    h = tags[257][2]
    comp = tags.get(259, (0, 0, 1))[2]
    if comp not in (1, 8):
        raise ValueError(f"unsupported TIFF compression {comp}")
    bits = tags.get(258, (0, 0, 16))[2]
    sfmt = tags.get(339, (0, 0, 1))[2]
    if (bits, sfmt) == (16, 1):
        dtype = "<u2"
    elif (bits, sfmt) == (32, 3):
        dtype = "<f4"
    else:
        raise ValueError(f"unsupported sample type bits={bits} fmt={sfmt}")
    strip_off = tags[273][2]
    nbytes = tags[279][2]
    raw = buf[strip_off:strip_off + nbytes]
    if comp == 8:
        import zlib

        raw = zlib.decompress(raw)
    pix = np.frombuffer(raw, dtype=dtype, count=w * h).reshape(h, w)
    sx, sy, _ = struct.unpack_from("<3d", buf, tags[33550][2])
    tie = struct.unpack_from("<6d", buf, tags[33922][2])
    x0, y_top = tie[3], tie[4]
    return pix, x0, y_top, sx, sy


# ---------------------------------------------------------------------------
# Spark sink / source over the synthetic value raster
# ---------------------------------------------------------------------------


def write_raster_tif(
    pixels: DataFrame,
    path: str,
    tile: int = 125,
    sx: float = 2.0,
    sy: float = 2.0,
    dtype: str = "uint16",
    compress: bool = False,
) -> DataFrame:
    """Shard a pixel frame (ix, iy, px, py, v) into ``tile x tile`` GeoTIFF
    tiles under ``path``. One applyInPandas task per tile; returns the
    lineage manifest (file, rows, bytes). ``dtype`` 'uint16' (integer
    rasters) or 'float32' (DEMs); ``compress`` writes Deflate strips."""
    if dtype not in ("uint16", "float32"):
        raise ValueError(f"unsupported tile dtype {dtype}")

    def burn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        col = (pdf["ix"] % tile).to_numpy()
        row_up = (pdf["iy"] % tile).to_numpy()  # 0 = southmost inside tile
        v = pdf["v"].to_numpy()
        # silent wraparound / fabricated zero-fill would corrupt the
        # round-trip without failing it — fail loudly.
        if len(pdf) != tile * tile:
            raise ValueError(
                f"tile ({tx},{ty}) has {len(pdf)} pixels, expected "
                f"{tile * tile}: input raster is not a dense "
                f"multiple-of-{tile} grid"
            )
        if dtype == "uint16":
            if v.min() < 0 or v.max() > 0xFFFF:
                raise ValueError(
                    f"tile ({tx},{ty}) values [{v.min()},{v.max()}] "
                    "exceed uint16"
                )
            grid = np.zeros((tile, tile), dtype=np.uint16)
            grid[tile - 1 - row_up, col] = v.astype(np.uint16)
        else:
            grid = np.zeros((tile, tile), dtype=np.float32)
            grid[tile - 1 - row_up, col] = v.astype(np.float32)
        # top-left pixel center of this tile in world coords
        x0 = (tx * tile) * sx + sx / 2.0
        y_top = (ty * tile + tile - 1) * sy + sy / 2.0
        buf = tile_tif_bytes(grid, x0, y_top, sx, sy, compress=compress)
        os.makedirs(path, exist_ok=True)
        fn = f"tile-{tx:03d}-{ty:03d}.tif"
        with open(os.path.join(path, fn), "wb") as f:
            f.write(buf)
        return pd.DataFrame({"file": [fn], "rows": [len(pdf)], "bytes": [len(buf)]})

    g = pixels.withColumn("_tx", (F.col("ix") / tile).cast("int")).withColumn(
        "_ty", (F.col("iy") / tile).cast("int")
    )
    return g.groupBy("_tx", "_ty").applyInPandas(burn, schema=_LINEAGE_SCHEMA)


def read_raster_tif(
    spark: SparkSession, path: str, value_type: str = "long"
) -> DataFrame:
    """Shard directory -> pixel frame (ix, iy, px, py, v); world coordinates
    reconstructed from each tile's GeoTIFF scale + tiepoint. ``value_type``
    'long' for integer rasters, 'double' for float DEMs (float32 samples
    widen exactly)."""
    schema = _PIXEL_SCHEMA if value_type == "long" else _PIXEL_SCHEMA_F
    np_t = np.int64 if value_type == "long" else np.float64

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for _, r in pdf.iterrows():
                pix, x0, y_top, sx, sy = parse_tif(bytes(r["content"]))
                h, w = pix.shape
                rows, cols = np.divmod(np.arange(h * w), w)
                px = x0 + cols * sx
                py = y_top - rows * sy
                ix = np.rint((px - sx / 2.0) / sx).astype(np.int64)
                iy = np.rint((py - sy / 2.0) / sy).astype(np.int64)
                yield pd.DataFrame(
                    {
                        "ix": ix,
                        "iy": iy,
                        "px": px,
                        "py": py,
                        "v": pix.reshape(-1).astype(np_t),
                    }
                )

    return (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "*.tif"))
        .select("content")
        .mapInPandas(parse, schema=schema)
    )


# ---------------------------------------------------------------------------
# Gate fixture: round-trip the synthetic value raster
# ---------------------------------------------------------------------------

_FIXED: set[str] = set()


def raster_fixture(spark: SparkSession, sf_dir: str) -> str:
    from . import raster, world

    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/root/repo/.scratch/tif", tag)
    if path not in _FIXED:
        import shutil

        # Clear stale shards (prior run with different tiling, or a crashed
        # write) before writing: the reader globs *.tif.
        shutil.rmtree(path, ignore_errors=True)
        world.register_tables(spark, sf_dir)
        pixels = spark.sql(raster.ZONAL_PIXELS_SQL_SPARK)
        write_raster_tif(pixels, path).collect()
        _FIXED.add(path)
    return path


def tif_roundtrip_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 500x500 synthetic value raster through GeoTIFF and back."""
    path = raster_fixture(spark, sf_dir)
    return read_raster_tif(spark, path)


def tif_roundtrip_oracle() -> str:
    from . import raster

    return (
        "SELECT CAST(ix AS BIGINT) AS ix, CAST(iy AS BIGINT) AS iy, px, py, "
        f"CAST(v AS BIGINT) AS v FROM ({raster.ZONAL_PIXELS_SQL_DUCK})"
    )


# ---------------------------------------------------------------------------
# Float DEM fixture: float32 samples + Deflate strips (the reference's
# sfdem.tif case — GT/storage/RasterExportOperation.java reads compressed
# float DEMs). Elevation values are exact float32 numbers (multiples of
# 1/8 under 1000) built from integer mods, so the round-trip is bit-exact
# and one SQL text serves both engines.
# ---------------------------------------------------------------------------

_DEM_EXPR = (
    "CAST(((ix * 7919 + iy * 104729) % 2000) * 0.25 "
    "+ ((ix * ix + iy * iy) % 797) * 0.125 AS DOUBLE)"
)
_DEM_PIX = (
    "SELECT ix, iy, "
    "CAST(ix AS DOUBLE) * 2.0 + 1.0 AS px, "
    "CAST(iy AS DOUBLE) * 2.0 + 1.0 AS py, "
    f"{_DEM_EXPR} AS v "
    "FROM (SELECT CAST(uid % 500 AS BIGINT) AS ix, "
    "CAST(FLOOR(uid / 500) AS BIGINT) AS iy FROM ({src})) __g"
)
DEM_PIXELS_SQL_SPARK = _DEM_PIX.format(src="SELECT id AS uid FROM RANGE(250000)")
DEM_PIXELS_SQL_DUCK = _DEM_PIX.format(
    src="SELECT generate_series AS uid FROM generate_series(0, 249999)"
)


def dem_fixture(spark: SparkSession, sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/root/repo/.scratch/tif_dem", tag)
    if path not in _FIXED:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        pixels = spark.sql(DEM_PIXELS_SQL_SPARK)
        write_raster_tif(
            pixels, path, dtype="float32", compress=True
        ).collect()
        _FIXED.add(path)
    return path


def tif_roundtrip_dem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 500x500 synthetic float DEM through float32+Deflate GeoTIFF and
    back — bit-exact (all elevations are exact float32 values)."""
    path = dem_fixture(spark, sf_dir)
    return read_raster_tif(spark, path, value_type="double")


def tif_roundtrip_dem_oracle() -> str:
    return (
        "SELECT CAST(ix AS BIGINT) AS ix, CAST(iy AS BIGINT) AS iy, "
        f"px, py, v FROM ({DEM_PIXELS_SQL_DUCK}) __d"
    )
