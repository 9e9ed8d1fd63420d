"""Quadkey hierarchy: Morton bijectivity + rollup conservation laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from opengxt_spark import quadkey, world

SF = "/root/testdata/sf0.001"


def _morton_py(cx: int, cy: int, bits: int) -> int:
    out = 0
    for j in range(bits):
        out |= ((cx >> j) & 1) << (2 * j + 1)
        out |= ((cy >> j) & 1) << (2 * j)
    return out


def test_morton_sql_matches_python(spark):
    rows = spark.sql(
        "SELECT cx, cy, " + quadkey.morton_sql("cx", "cy", 7) + " AS qk "
        "FROM (SELECT CAST(id % 128 AS BIGINT) AS cx, "
        "CAST(FLOOR(id / 128) % 128 AS BIGINT) AS cy FROM RANGE(4000))"
    ).collect()
    for r in rows[:500]:
        assert r["qk"] == _morton_py(r["cx"], r["cy"], 7)
    # bijective over the sampled domain
    assert len({r["qk"] for r in rows}) == len({(r["cx"], r["cy"]) for r in rows})


def test_rollup_conserves_mass(spark):
    pts = world.points_events(spark, SF).select("x", "y", "w")
    n = pts.count()
    wsum = pts.agg(F.sum("w")).collect()[0][0]
    out = quadkey.quadkey_rollup(pts, fine_level=7, coarse_levels=2)
    per_level = {
        r["level"]: (r["cnt"], r["sw"])
        for r in out.groupBy("level")
        .agg(F.sum("cnt").alias("cnt"), F.sum("sum_w").alias("sw"))
        .collect()
    }
    assert set(per_level) == {7, 6, 5}
    for lvl, (cnt, sw) in per_level.items():
        assert cnt == n, (lvl, cnt, n)
        assert sw == wsum, (lvl, sw, wsum)


def test_rollup_parent_is_sum_of_children(spark):
    pts = world.points_events(spark, SF).select("x", "y", "w")
    out = quadkey.quadkey_rollup(pts, fine_level=7, coarse_levels=1)
    fine = {r["qk"]: r["cnt"] for r in out.where("level = 7").collect()}
    coarse = {r["qk"]: r["cnt"] for r in out.where("level = 6").collect()}
    rebuilt: dict[int, int] = {}
    for qk, c in fine.items():
        rebuilt[qk // 4] = rebuilt.get(qk // 4, 0) + c
    assert rebuilt == coarse
