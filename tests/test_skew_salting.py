"""Skew handling: salted cell join correctness + plan shape.

north_rule: "partitioning / shuffle / skew handled explicitly". The salted
strategy spreads one pathologically hot cell over n_salt tasks by salting
the probe side and exploding the build side across salt values
(planner.cell_join strategy="salted").
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opengxt_spark import cells, joins, planner, world

SF = "/root/testdata/sf0.001"


def _skewed_points(spark):
    """All 5000 points inside a 2x2-unit blob — ONE hot cell at ANY cell
    size the planner's adaptive probe might pick (a 20-unit spread split
    across cells at cs=11, leaving the top cell under the 4x-average salt
    threshold: the auto-salt decision then correctly declines, which is
    not what these tests exercise)."""
    return spark.range(5000).selectExpr(
        "id AS pid",
        "5.0 + CAST((id * 2654435761) % 2000 AS DOUBLE) / 1000.0 AS x",
        "5.0 + CAST((id * 1597334677) % 2000 AS DOUBLE) / 1000.0 AS y",
        "id % 7 AS w",
    )


def _rects_over_hot_cell(spark):
    """20 rects overlapping the hot cell (and some empty space)."""
    return spark.range(20).selectExpr(
        "id AS rid",
        "CAST(5 + id * 2 AS DOUBLE) AS cx",
        "CAST(5 + (id * 7) % 25 AS DOUBLE) AS cy",
        "CAST(3 + id % 5 AS DOUBLE) AS hw",
        "CAST(3 + id % 4 AS DOUBLE) AS hh",
    )


def test_salted_join_equals_plain(spark):
    pts = _skewed_points(spark)
    rects = _rects_over_hot_cell(spark)
    plain = joins.pip_count_join(pts, rects, strategy="shuffle").collect()
    salted = joins.pip_count_join(pts, rects, strategy="salted").collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
    assert len(plain) > 0


def test_salted_plan_has_salt_key(spark):
    pts = _skewed_points(spark)
    rects = world.rects_customer(spark, SF)
    p = cells.with_point_cells(pts)
    r = cells.explode_extent_cells(world.rect_corners(rects))
    df = planner.cell_join(
        p, r, world.rect_contains_sql("x", "y"), strategy="salted", n_salt=8
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan


def test_salted_spreads_hot_cell(spark):
    """The hot cell's rows land in multiple salt buckets."""
    pts = _skewed_points(spark)
    p = cells.with_point_cells(pts)
    salted = p.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("pid")), F.lit(8)).cast("int")
    )
    n_buckets = (
        salted.groupBy("cell_x", "cell_y", "_salt").count().count()
    )
    # one cell, 8 salts -> 8 buckets
    assert n_buckets == 8


def test_auto_salt_fires_on_hot_cell(spark):
    """choose_strategy escalates shuffle -> salted from its own memoized
    top-cell pre-count (no caller-forced strategy), sizes n_salt from the
    hot-cell / per-task ratio, and stays on plain shuffle when the probe
    is uniform or the cell is under the floor."""
    pts = cells.with_point_cells(_skewed_points(spark))   # one hot cell
    big_build = cells.with_point_cells(
        spark.range(10_000).selectExpr(
            "id AS rid", "CAST(id % 997 AS DOUBLE) AS x",
            "CAST(id % 991 AS DOUBLE) AS y",
        )
    )
    plan = planner.choose_strategy(
        big_build, broadcast_limit=0, probe=pts, hot_min=1000
    )
    assert plan.strategy == "salted"
    assert 2 <= plan.n_salt <= planner.MAX_SALT

    # under the absolute floor: same shape, no salt
    plan2 = planner.choose_strategy(
        big_build, broadcast_limit=0, probe=pts, hot_min=100_000
    )
    assert plan2.strategy == "shuffle"

    # uniform probe: no hot cell, no salt
    uniform = cells.with_point_cells(
        spark.range(5000).selectExpr(
            "id AS pid", "CAST((id * 37) % 1000 AS DOUBLE) AS x",
            "CAST((id * 61) % 1000 AS DOUBLE) AS y",
        )
    )
    plan3 = planner.choose_strategy(
        big_build, broadcast_limit=0, probe=uniform, hot_min=1000
    )
    assert plan3.strategy == "shuffle"

    # small build still broadcasts regardless of skew
    plan4 = planner.choose_strategy(big_build, probe=pts, hot_min=1000)
    assert plan4.strategy == "broadcast"


def test_auto_salt_plan_and_result(spark):
    """End-to-end through cell_join: the auto-salted plan carries the salt
    key and returns the same rows as the plain shuffle join."""
    pts = _skewed_points(spark)
    rects = _rects_over_hot_cell(spark)
    auto = joins.pip_count_join(
        pts, rects, broadcast_limit=0, hot_min=1000
    )
    plan = auto._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan
    plain = joins.pip_count_join(pts, rects, strategy="shuffle").collect()
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, plain))
