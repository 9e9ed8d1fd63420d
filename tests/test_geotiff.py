"""GeoTIFF interchange: TIFF-6.0 conformance + bit-exact Spark round-trip."""

from __future__ import annotations

import struct

import numpy as np

from opengxt_spark import geotiff, raster


def test_tif_header_and_tags():
    pix = np.arange(12, dtype=np.uint16).reshape(3, 4)
    buf = geotiff.tile_tif_bytes(pix, x0=7.0, y_top=11.0, sx=2.0, sy=2.0)
    assert buf[:4] == b"II\x2a\x00"
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    tags = []
    for i in range(n):
        tag, typ, cnt, _ = struct.unpack_from("<HHII", buf, ifd_off + 2 + 12 * i)
        tags.append(tag)
    assert tags == sorted(tags)  # TIFF mandates ascending tag order
    for required in (256, 257, 258, 259, 273, 279, 33550, 33922, 34735):
        assert required in tags
    back, x0, yt, sx, sy = geotiff.parse_tif(buf)
    assert (back == pix).all()
    assert (x0, yt, sx, sy) == (7.0, 11.0, 2.0, 2.0)


def test_tif_rejects_foreign():
    try:
        geotiff.parse_tif(b"MM\x00\x2a" + b"\x00" * 16)
    except ValueError:
        pass
    else:
        raise AssertionError("big-endian TIFF should be rejected")


def test_raster_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    pixels = spark.sql(raster.ZONAL_PIXELS_SQL_SPARK)
    path = str(tmp_path / "tif")
    lineage = geotiff.write_raster_tif(pixels, path).collect()
    assert len(lineage) == 16  # 4x4 tiles of 125x125
    assert sum(r["rows"] for r in lineage) == 250_000
    back = geotiff.read_raster_tif(spark, path)
    assert back.count() == 250_000
    # sample-free exact check: anti-join both ways is empty
    diff1 = pixels.exceptAll(back).count()
    diff2 = back.exceptAll(pixels.select("ix", "iy", "px", "py", "v")).count()
    assert (diff1, diff2) == (0, 0)
