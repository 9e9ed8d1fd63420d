"""Property tests for the autocorrelation stack (sf0.001)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opengxt_spark import autocorr, world

BAND = 10.0


def _pts(spark, sf_dir):
    return world.points_events(spark, sf_dir).withColumn("v", F.expr("w % 97"))


def test_global_moran_random_field_near_zero(spark, sf_dir):
    """v = w % 97 is spatially random, so I should be near E[I] (|z| small-ish)
    and the variance positive."""
    row = autocorr.global_morans_i(_pts(spark, sf_dir), BAND).collect()[0]
    assert row.z_var > 0
    assert abs(row.moran_i) < 0.2
    assert 0.0 <= row.p_value <= 1.0


def test_global_moran_clustered_field_positive(spark, sf_dir):
    """A smooth gradient field v = floor(x/10) must give strongly positive I
    (known-sign golden, SURVEY.md §5.2)."""
    pts = world.points_events(spark, sf_dir).withColumn(
        "v", F.expr("CAST(FLOOR(x / 10.0) AS BIGINT)")
    )
    row = autocorr.global_morans_i(pts, BAND).collect()[0]
    assert row.moran_i > 0.5
    assert row.z_score > 3.0
    assert row.p_value < 0.01


def test_local_moran_bruteforce_one_feature(spark, sf_dir):
    """Recompute LMi for one feature from first principles."""
    pts_df = _pts(spark, sf_dir)
    pts = [(r.pid, r.x, r.y, r.v) for r in pts_df.collect()]
    n = len(pts)
    mu = sum(p[3] for p in pts) / n
    m2 = sum((p[3] - mu) ** 2 for p in pts) / (n - 1)
    out = {r.pid: r for r in autocorr.local_morans_i(pts_df, BAND).collect()}
    # pick the first feature that has neighbors
    for pid, x, y, v in pts:
        nbrs = [
            q for q in pts
            if q[0] != pid and (q[1] - x) ** 2 + (q[2] - y) ** 2 <= BAND * BAND
        ]
        if nbrs:
            expected = ((v - mu) / m2) * sum(q[3] - mu for q in nbrs)
            assert math.isclose(out[pid].lmi_index, expected, abs_tol=1e-4)
            break


def test_gi_star_zscores_zero_mean(spark, sf_dir):
    """Gi* z-scores over a random field should average near 0."""
    rows = autocorr.local_g(_pts(spark, sf_dir), BAND).collect()
    zs = [r.gi_z for r in rows if r.gi_z is not None]
    assert len(zs) > 0
    assert abs(sum(zs) / len(zs)) < 0.5


def test_quadrat_and_ks(spark, sf_dir):
    q = autocorr.quadrat(
        world.points_events(spark, sf_dir), (0.0, 0.0, 1000.0, 1000.0), 40, 40
    ).collect()[0]
    assert q.n_points == 1000  # sf0.001 events
    assert q.qmean == 1000 / 1600
    assert q.vmr > 0
    counts = [1] * q.n_points  # degenerate histogram still computes
    ks = autocorr.quadrat_ks(counts, q.n_quadrats)
    assert 0 <= ks["ks_d"] <= 1
    assert math.isclose(ks["critical_5pct"], 1.36 / math.sqrt(1600))


def test_geary_c_random_field_near_one(spark, sf_dir):
    """Geary's C on a spatially random field is ~1 (no autocorrelation)."""
    from opengxt_spark import world
    from pyspark.sql import functions as F

    pts = world.points_events(spark, sf_dir).withColumn("v", F.expr("w % 97"))
    row = autocorr.global_gearys_c(pts, 10.0).collect()[0]
    # band 10 at sf0.001 density gives few neighbors per point, so the
    # sampling spread of C is wide; the z bound is the real check.
    assert 0.75 < row["geary_c"] < 1.25
    assert abs(row["geary_z"]) < 4.0


def test_general_g_matches_bruteforce_ratio(spark, sf_dir):
    """General G observed value equals the brute-force pair ratio."""
    from opengxt_spark import world
    from pyspark.sql import functions as F

    pts = world.points_events(spark, sf_dir).withColumn("v", F.expr("w % 97"))
    rows = pts.select("pid", "x", "y", "v").collect()
    num = 0
    den = 0
    for a in rows:
        for b in rows:
            if a["pid"] == b["pid"]:
                continue
            den += a["v"] * b["v"]
            if (a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2 <= 100.0:
                num += a["v"] * b["v"]
    got = autocorr.global_g(pts, 10.0).collect()[0]
    assert got["g_obs_e6"] == pytest.approx(1e6 * num / den, abs=1e-4)


def test_join_counts_sum_to_total_joins(spark, sf_dir):
    """BB + WW + BW = total unordered joins J."""
    from opengxt_spark import world, joins
    from pyspark.sql import functions as F

    pts = world.points_events(spark, sf_dir).withColumn("v", F.expr("w % 97"))
    row = autocorr.join_count_stats(pts, 10.0).collect()[0]
    st = joins.band_stats_join(pts, pts, 10.0)
    total_j = (
        st.agg(F.sum(F.expr("cnt - 1")).alias("s")).collect()[0]["s"] / 2
    )
    assert row["bb_obs"] + row["ww_obs"] + row["bw_obs"] == pytest.approx(
        total_j
    )
