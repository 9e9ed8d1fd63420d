"""Overlay difference family: slab-sweep union area vs a brute-force
numpy rasterization oracle, plus the set-algebra invariants tying the
four overlays together."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opengxt_spark import overlay_diff, world


@pytest.fixture(scope="module")
def layers(spark, sf_dir):
    a = world.rects_customer(spark, sf_dir)
    b = world.load_layer(spark, sf_dir, "rects_orders")
    return a, b


def _brute_union_cut(arect, brects) -> float:
    """Exact union area of B∩A via mm-integer slab sweep in pure python."""
    ax0, ax1, ay0, ay1 = arect
    boxes = []
    for bx0, bx1, by0, by1 in brects:
        x0, x1 = max(ax0, bx0), min(ax1, bx1)
        y0, y1 = max(ay0, by0), min(ay1, by1)
        if x0 < x1 and y0 < y1:
            boxes.append((x0, x1, y0, y1))
    if not boxes:
        return 0
    xs = sorted({v for b_ in boxes for v in (b_[0], b_[1])})
    total = 0
    for sx, ex in zip(xs, xs[1:]):
        ivals = sorted(
            (b_[2], b_[3]) for b_ in boxes if b_[0] <= sx and b_[1] >= ex
        )
        cov, cur0, cur1 = 0, None, None
        for y0, y1 in ivals:
            if cur0 is None:
                cur0, cur1 = y0, y1
            elif y0 > cur1:
                cov += cur1 - cur0
                cur0, cur1 = y0, y1
            else:
                cur1 = max(cur1, y1)
        if cur0 is not None:
            cov += cur1 - cur0
        total += (ex - sx) * cov
    return total


def _mm(df):
    rows = df.select(
        "rid",
        F.expr(overlay_diff.mm_sql("cx - hw")).alias("x0"),
        F.expr(overlay_diff.mm_sql("cx + hw")).alias("x1"),
        F.expr(overlay_diff.mm_sql("cy - hh")).alias("y0"),
        F.expr(overlay_diff.mm_sql("cy + hh")).alias("y1"),
    ).collect()
    return {r["rid"]: (r["x0"], r["x1"], r["y0"], r["y1"]) for r in rows}


def test_union_cut_matches_bruteforce(spark, layers):
    a, b = layers
    am, bm = _mm(a), _mm(b)
    got = {
        r["rid_a"]: r["cut_mm2"]
        for r in overlay_diff.union_cut_mm(overlay_diff._pairs_mm(a, b)).collect()
    }
    brects = list(bm.values())
    for rid, arect in am.items():
        expect = _brute_union_cut(arect, brects)
        assert got.get(rid, 0) == expect, rid


def test_difference_set_algebra(spark, layers):
    a, b = layers
    # area(A) = diff_area + cut_area for every surviving feature, and
    # fully-covered features are exactly those absent from the output.
    rows = overlay_diff.difference_rects(a, b).collect()
    for r in rows:
        assert r["diff_area"] > 0
        assert abs(r["area_a"] - r["cut_area"] - r["diff_area"]) < 1e-6
    # clip + difference partition each A feature's area
    clip = {
        r["rid"]: r["clip_area"]
        for r in overlay_diff.clip_with_features(a, b).collect()
    }
    diff = {r["rid"]: (r["area_a"], r["diff_area"]) for r in rows}
    n_a = a.count()
    covered = set(clip) | set(diff)
    assert len(covered) == n_a  # every feature clips, differs, or both


def test_update_preserves_b(spark, layers):
    a, b = layers
    out = overlay_diff.update_rects(a, b)
    nb = b.count()
    assert out.where("src = 'B'").count() == nb
    # B side areas = full feature areas
    full = {
        r["rid"]: round(4.0 * r["hw"] * r["hh"], 6) for r in b.collect()
    }
    for r in out.where("src = 'B'").collect():
        assert abs(r["out_area"] - full[r["rid"]]) < 1e-5


def test_identity_piece_count(spark, layers):
    a, b = layers
    pieces = overlay_diff.identity_rects(a, b)
    n_pairs = overlay_diff._pairs_mm(a, b).count()
    n_rem = overlay_diff.difference_rects(a, b).count()
    assert pieces.count() == n_pairs + n_rem
