"""Independent brute-force check of the hex/rect binning math.

Transcribed directly from HexagonalBinningVisitor.java (with sqrt distances,
as the reference computes them) — NOT from binning.py's fragments — so a
shared transcription error in the SQL would be caught here.
"""

from __future__ import annotations

import math

import duckdb

from opengxt_spark import binning, world
from tests import worldref as W

BBOX = (0.0, 0.0, 1000.0, 1000.0)


def hex_assign_java(x, y, size, bbox):
    minx0, miny0, maxx, maxy = bbox
    yoffset = size * 1.5
    xoffset = math.sqrt(3.0) * size
    hx = xoffset * 0.5
    minx = minx0 - hx
    miny = miny0 - yoffset
    width = maxx - minx
    height = maxy - miny
    columns = int(math.floor(width / xoffset + 0.5))
    rows = int(math.floor(height / yoffset + 0.5))
    columns = columns + 1 if columns * xoffset < width else columns
    rows = rows + 1 if rows * yoffset < height else rows
    y_origin = miny + size * 0.25

    row = int(math.floor((y - y_origin) / yoffset))
    even = (row % 2) == 1
    if even:
        col = int(math.floor((x - minx - hx) / xoffset))
        cx = (minx + xoffset) + col * xoffset
    else:
        col = int(math.floor((x - minx) / xoffset))
        cx = (minx + hx) + col * xoffset
    cy = (miny + size) + row * yoffset

    d0 = math.hypot(x - cx, y - cy)
    if d0 > hx:
        ux = cx - hx if x <= cx else cx + hx
        du = math.hypot(x - ux, y - (cy + yoffset))
        dl = math.hypot(x - ux, y - (cy - yoffset))
        if du < d0 or dl < d0:
            if x <= cx:
                col = col if even else col - 1
            else:
                col = col + 1 if even else col
            row = row - 1 if du > dl else row + 1
    if col < 0 or row < 0 or col >= columns or row >= rows:
        return None
    return col, row


def test_hex_binning_bruteforce(spark, sf_dir):
    con = duckdb.connect()
    events = con.execute(
        f"SELECT event_id, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    expected: dict[tuple[int, int], int] = {}
    for eid, v in events:
        cell = hex_assign_java(W.px(eid), W.py(eid), 12.0, BBOX)
        if cell is not None:
            expected[cell] = expected.get(cell, 0) + W.int_weight(v)
    out = binning.hex_binning(
        world.points_events(spark, sf_dir), BBOX, size=12.0
    ).collect()
    assert {(r.col, r.row): r.val for r in out} == expected


def test_rect_binning_total_weight(spark, sf_dir):
    """Binning conserves total weight (all world points are in range)."""
    pts = world.points_events(spark, sf_dir)
    total = pts.groupBy().sum("w").collect()[0][0]
    out = binning.rect_binning(pts, BBOX, columns=50, rows=40)
    assert out.groupBy().sum("val").collect()[0][0] == total


def test_fishnet_covers_bbox(spark):
    grid = binning.fishnet_grid(spark, BBOX, 25.0, 25.0).collect()
    assert len(grid) == 1600
    assert min(r.xmin for r in grid) == 0.0
    assert max(r.xmax for r in grid) == 1000.0
    # cells tile exactly: each cell's area is (25 x 25)
    for r in grid[:5]:
        assert r.xmax - r.xmin == 25.0 and r.ymax - r.ymin == 25.0
