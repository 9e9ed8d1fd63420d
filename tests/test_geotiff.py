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


def test_float32_deflate_tile_codec():
    """Codec-level: float32 + Deflate tile round-trips bit-exact and is
    actually smaller than the raw strip; mixed-type guards reject."""
    import numpy as np
    import pytest

    grid = (np.arange(64 * 64, dtype=np.float32).reshape(64, 64) * 0.125
            + 7.25)
    buf = geotiff.tile_tif_bytes(grid, 1.0, 127.0, 2.0, 2.0, compress=True)
    assert len(buf) < grid.nbytes  # Deflate actually compressed
    pix, x0, y_top, sx, sy = geotiff.parse_tif(buf)
    assert pix.dtype == np.dtype("<f4")
    assert np.array_equal(pix, grid)
    assert (x0, y_top, sx, sy) == (1.0, 127.0, 2.0, 2.0)
    # uncompressed float32 also parses
    buf2 = geotiff.tile_tif_bytes(grid, 0.0, 0.0)
    assert np.array_equal(geotiff.parse_tif(buf2)[0], grid)
    with pytest.raises(ValueError):
        geotiff.tile_tif_bytes(grid.astype(np.float64), 0.0, 0.0)


def test_dem_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    pixels = spark.sql(geotiff.DEM_PIXELS_SQL_SPARK)
    path = str(tmp_path / "dem")
    lineage = geotiff.write_raster_tif(
        pixels, path, dtype="float32", compress=True
    ).collect()
    assert len(lineage) == 16
    raw_tile_bytes = 125 * 125 * 4
    assert all(r["bytes"] < raw_tile_bytes + 400 for r in lineage)
    back = geotiff.read_raster_tif(spark, path, value_type="double")
    assert back.count() == 250_000
    diff1 = pixels.exceptAll(back).count()
    diff2 = back.exceptAll(pixels.select("ix", "iy", "px", "py", "v")).count()
    assert (diff1, diff2) == (0, 0)
