"""Shapefile interchange: format conformance + bit-exact round-trip.

The writer/reader are built from the public ESRI Shapefile Technical
Description (1998) and dBASE III layouts; these tests check the headers the
spec mandates, then the end-to-end Spark round-trip the gate relies on.
"""

from __future__ import annotations

import glob
import os
import struct

import numpy as np
import pandas as pd

from opengxt_spark import shapefile, world


def test_point_shp_header_and_records():
    x = np.array([1.5, -2.25, 1000.0])
    y = np.array([0.5, 3.75, -8.0])
    shp, shx = shapefile._points_shp_bytes(x, y)
    assert struct.unpack_from(">i", shp, 0)[0] == 9994
    assert struct.unpack_from("<i", shp, 28)[0] == 1000  # version
    assert struct.unpack_from("<i", shp, 32)[0] == shapefile.SHP_POINT
    # file length in 16-bit words
    assert struct.unpack_from(">i", shp, 24)[0] * 2 == len(shp)
    assert struct.unpack_from("<4d", shp, 36) == (-2.25, -8.0, 1000.0, 3.75)
    # record 2: header (num=2, clen=10 words) then (type, x, y)
    off = 100 + 28
    assert struct.unpack_from(">ii", shp, off) == (2, 10)
    assert struct.unpack_from("<idd", shp, off + 8) == (1, -2.25, 3.75)
    # shx entry 2 points at record 2
    assert struct.unpack_from(">ii", shx, 100 + 8) == (off // 2, 10)


def test_rect_shp_ring_closed_clockwise():
    shp, _ = shapefile._rects_shp_bytes(
        np.array([0.0]), np.array([0.0]), np.array([2.0]), np.array([1.0])
    )
    nparts, npts = struct.unpack_from("<ii", shp, 100 + 8 + 4 + 32)
    assert (nparts, npts) == (1, 5)
    pts = struct.unpack_from("<10d", shp, 100 + 8 + 4 + 32 + 8 + 4)
    ring = list(zip(pts[0::2], pts[1::2]))
    assert ring[0] == ring[-1]  # closed
    # shoelace signed area < 0 => clockwise (spec: outer rings CW)
    area = sum(
        ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
        for i in range(4)
    )
    assert area < 0


def test_dbf_roundtrip_unit():
    pdf = pd.DataFrame({"pid": [7, 123456], "w": [0, -42], "cat": ["view", "click"]})
    buf = shapefile._dbf_bytes(
        pdf, [("pid", "N", 18), ("w", "N", 18), ("cat", "C", 16)]
    )
    back = shapefile._parse_dbf(buf)
    assert back["pid"].tolist() == [7, 123456]
    assert back["w"].tolist() == [0, -42]
    assert back["cat"].tolist() == ["view", "click"]


def test_points_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    src = world.points_events(spark, sf_dir).select("pid", "x", "y", "w", "cat")
    path = str(tmp_path / "pts")
    lineage = shapefile.write_points_shp(src.repartition(4, "pid"), path).collect()
    assert sum(r["rows"] for r in lineage) == src.count()
    assert len(glob.glob(os.path.join(path, "*.shp"))) == len(lineage)
    back = shapefile.read_points_shp(spark, path)
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b  # doubles bit-exact through the .shp record


def test_rects_roundtrip_corners_exact(spark, sf_dir, tmp_path):
    src = world.rects_customer(spark, sf_dir)
    path = str(tmp_path / "rects")
    shapefile.write_rects_shp(
        src.select("rid", "cx", "cy", "hw", "hh", "seg").repartition(2, "rid"), path
    ).collect()
    back = shapefile.read_rects_shp(spark, path)
    exp = {
        (r["rid"], r["cx"] - r["hw"], r["cy"] - r["hh"],
         r["cx"] + r["hw"], r["cy"] + r["hh"], r["seg"])
        for r in src.collect()
    }
    got = {tuple(r) for r in back.collect()}
    assert exp == got


def test_multi_ring_polygon_roundtrip_bytes():
    """Format-level: variable-length records with NumParts in {1,2,3}
    round-trip exactly through _polys_shp_bytes + the reader's record walk."""
    import struct

    import numpy as np

    from opengxt_spark import shapefile as S

    g0 = [np.array([[0.0, 4.0], [4.0, 4.0], [4.0, 0.0], [0.0, 0.0],
                    [0.0, 4.0]])]
    g1 = [np.array([[10.0, 20.0], [20.0, 20.0], [20.0, 10.0], [10.0, 10.0],
                    [10.0, 20.0]]),
          np.array([[12.0, 18.0], [12.0, 12.0], [18.0, 12.0], [18.0, 18.0],
                    [12.0, 18.0]])]
    g2 = [np.array([[0.0, 100.0], [100.0, 100.0], [50.0, 0.0], [0.0, 100.0]]),
          np.array([[10.0, 80.0], [20.0, 80.0], [15.0, 70.0], [10.0, 80.0]]),
          np.array([[60.0, 80.0], [70.0, 80.0], [65.0, 70.0], [60.0, 80.0]])]
    shp, shx = S._polys_shp_bytes([g0, g1, g2])
    # walk the records back
    off, geoms = 100, []
    while off < len(shp):
        (clen,) = struct.unpack_from(">i", shp, off + 4)
        c = off + 8
        nparts, npts = struct.unpack_from("<ii", shp, c + 36)
        parts = np.frombuffer(shp, "<i4", nparts, c + 44)
        pts = np.frombuffer(shp, "<f8", npts * 2, c + 44 + 4 * nparts)
        pts = pts.reshape(npts, 2)
        ends = np.append(parts[1:], npts)
        geoms.append([pts[p0:p1] for p0, p1 in zip(parts, ends)])
        off += 8 + clen * 2
    assert len(geoms) == 3
    for orig, back in zip([g0, g1, g2], geoms):
        assert len(orig) == len(back)
        for ro, rb in zip(orig, back):
            assert np.array_equal(ro, rb)
    # shx record count
    assert (len(shx) - 100) // 8 == 3


def test_donut_roundtrip_spark(spark, sf_dir):
    """Spark sink/source: every donut comes back with 2 rings x 5 vertices
    and the hole strictly inside the outer ring."""
    from opengxt_spark import shapefile as S

    flat = S.shp_roundtrip_donuts(spark, sf_dir)
    pdf = flat.toPandas()
    n_polys = pdf["gid"].nunique()
    assert len(pdf) == n_polys * 10
    per = pdf.groupby(["gid", "ring"]).size()
    assert (per == 5).all()
    for gid, g in pdf.groupby("gid"):
        outer = g[g.ring == 0]
        inner = g[g.ring == 1]
        assert inner.x.min() > outer.x.min() and inner.x.max() < outer.x.max()
        assert inner.y.min() > outer.y.min() and inner.y.max() < outer.y.max()


def test_polyline_roundtrip_spark(spark, sf_dir):
    """Type-3 PolyLine sink/source: every line comes back with 2 parts of
    UNEQUAL lengths (3 + 2 vertices), part 0 passes through the exact
    midpoint, and a polygon reader pointed at the line layer fails loudly."""
    import pytest

    from opengxt_spark import shapefile as S

    path = S.lines_fixture(spark, sf_dir)
    pdf = S.read_lines_shp(spark, path).toPandas()
    n_lines = pdf["gid"].nunique()
    assert len(pdf) == n_lines * 5
    per = pdf.groupby(["gid", "part"]).size().unstack()
    assert (per[0] == 3).all() and (per[1] == 2).all()
    for gid, g in pdf.groupby("gid"):
        p0 = g[g.part == 0].sort_values("seq")
        assert p0.iloc[1].x == (p0.iloc[0].x + p0.iloc[2].x) / 2.0
        assert p0.iloc[1].y == (p0.iloc[0].y + p0.iloc[2].y) / 2.0
    with pytest.raises(Exception, match="shapefile type"):
        S.read_polys_shp(spark, path).collect()
