"""Weights-matrix variants: brute-force parity of the generalized Moran
reduction, kNN weight pairs, and contiguity predicates."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opengxt_spark import weights, world
from opengxt_spark.autocorr import global_morans_i


@pytest.fixture(scope="module")
def pts(spark, sf_dir):
    return world.points_part(spark, sf_dir).withColumn(
        "v", F.expr("CAST(FLOOR(val) AS BIGINT) % 97")
    )


def _brute_moran(rows, weight_fn):
    """O(n^2) Moran's I with arbitrary weights in pure python — the
    formula the distributed reduction must reproduce."""
    n = len(rows)
    mu = sum(r["v"] for r in rows) / n
    z = {r["pid"]: r["v"] - mu for r in rows}
    zi2 = sum(zz * zz for zz in z.values()) / n
    s0 = num = 0.0
    for a in rows:
        for b in rows:
            if a["pid"] == b["pid"]:
                continue
            w = weight_fn(a, b)
            if w:
                s0 += w
                num += w * z[a["pid"]] * z[b["pid"]]
    return num / (zi2 * s0)


def test_idw_moran_matches_bruteforce(spark, pts):
    band = 40.0
    out = weights.general_moran(
        weights.idw_band_pairs(pts, band), pts
    ).collect()[0]
    rows = pts.select("pid", "x", "y", "v").collect()

    def wfn(a, b):
        d2 = (a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2
        if d2 > band * band:
            return 0.0
        # same quantization as the engine: min(1, 1/d) at Q=1e6
        return math.floor(min(weights.Q / math.sqrt(d2), weights.Q)) / weights.Q

    expect = _brute_moran(rows, wfn)
    assert abs(out["moran_i"] - expect) < 1e-6


def test_general_moran_binary_equals_closed_form(spark, pts):
    """With wq == Q (binary weights) the generalized reduction must equal
    the specialized binary implementation exactly."""
    band = 40.0
    from opengxt_spark.joins import distance_band_join

    pairs = distance_band_join(
        pts, pts, band, left_extra={"vi": "v"}, right_extra={"vj": "v"}
    ).where(F.col("pid_l") != F.col("pid_r")).select(
        "pid_l", "pid_r", "vi", "vj",
        F.lit(weights.Q).cast("long").alias("wq"),
    )
    gen = weights.general_moran(pairs, pts).collect()[0]
    ref = global_morans_i(pts, band).collect()[0]
    for c in ("moran_i", "expected_i", "z_var", "z_score", "p_value"):
        assert abs(gen[c] - ref[c]) < 1e-6, c


def test_knn_pairs_shape(spark, pts):
    k, radius = 4, 100.0
    pairs = weights.knn_pairs(pts, k=k, radius=radius).collect()
    by_i = {}
    for r in pairs:
        by_i.setdefault(r["pid_l"], []).append(r)
    # bounded-radius contract: points see min(k, neighbors within radius)
    assert all(len(v) <= k for v in by_i.values())
    # full brute-force parity within the radius cap
    rows = pts.select("pid", "x", "y").collect()
    for p0 in rows[:25]:
        dists = sorted(
            (((p0["x"] - r["x"]) ** 2 + (p0["y"] - r["y"]) ** 2), r["pid"])
            for r in rows
            if r["pid"] != p0["pid"]
            and ((p0["x"] - r["x"]) ** 2 + (p0["y"] - r["y"]) ** 2)
            <= radius * radius
        )
        expect = {pid for _, pid in dists[:k]}
        got = {r["pid_r"] for r in by_i.get(p0["pid"], [])}
        assert got == expect, p0["pid"]


def test_queen_rook_contiguity(spark, sf_dir):
    rects = world.rects_customer(spark, sf_dir)
    v_sql = "CAST(FLOOR(ABS(bal) * 100.0) AS BIGINT) % 97"
    queen = weights.queen_pairs(rects, v_sql)
    rook = weights.rook_pairs(rects, v_sql)
    nq, nr = queen.count(), rook.count()
    assert nr <= nq
    # symmetry: (i, j) present iff (j, i) present
    q = {(r["pid_l"], r["pid_r"]) for r in queen.collect()}
    assert all((j, i) in q for (i, j) in q)
    # brute-force the predicate on a sample
    rows = rects.collect()
    boxes = {
        r["rid"]: (r["cx"] - r["hw"], r["cx"] + r["hw"],
                   r["cy"] - r["hh"], r["cy"] + r["hh"])
        for r in rows
    }
    expect = set()
    ids = list(boxes)
    for i in ids:
        x0, x1, y0, y1 = boxes[i]
        for j in ids:
            if i == j:
                continue
            u0, u1, v0, v1 = boxes[j]
            if x0 <= u1 and u0 <= x1 and y0 <= v1 and v0 <= y1:
                expect.add((i, j))
    assert q == expect


def test_adaptive_band_guarantees_neighbors(spark, pts):
    band = weights.adaptive_band(pts)
    from opengxt_spark.joins import band_stats_join

    st = band_stats_join(pts, pts, band)
    # every point has at least itself + 1 neighbor within the band
    n = pts.count()
    assert st.where("cnt >= 2").count() == n
