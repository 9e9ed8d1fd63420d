"""Signed-zero gate normalization (gatenorm) — the round-2 densify_lines fix.

The driver's value hash stringifies cells, so an engine emitting ``-0.0``
where the other emits ``0.0`` flips the hash even though the doubles are
equal. These tests use a STRICT normalizer (plain ``repr``, which preserves
the zero sign) to prove the gate surfaces can no longer emit a signed zero
on either engine.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from opengxt_spark import gatenorm, world


def strict_cell(v) -> str:
    """Stricter than tools/check_oracle.norm_cell: repr keeps -0.0 distinct."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "nan" if v != v else repr(v)
    return str(v)


def test_dezero_df_scrubs_signed_zeros(spark):
    df = spark.createDataFrame(
        [(1, -0.0, float("nan"), [-0.0, 1.5, None])],
        "id bigint, d double, n double, arr array<double>",
    )
    out = gatenorm.dezero_df(df)
    assert out.columns == df.columns
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        f.dataType.simpleString() for f in df.schema.fields
    ]
    row = out.collect()[0]
    assert math.copysign(1.0, row["d"]) == 1.0
    assert row["n"] != row["n"]  # NaN passes through
    assert math.copysign(1.0, row["arr"][0]) == 1.0
    assert row["arr"][1] == 1.5 and row["arr"][2] is None
    # non-float frames pass through without an extra projection
    ints = spark.createDataFrame([(1,)], "id bigint")
    assert gatenorm.dezero_df(ints) is ints


def test_dezero_oracles_wraps_duckdb_side(sf_dir):
    oracles = {
        "neg": "SELECT 1 AS id, ROUND(-1e-9, 6) AS v, CAST(COUNT(*) AS BIGINT)"
               " AS cnt FROM events GROUP BY 1, 2",
        "ints": "SELECT event_id FROM events LIMIT 1",
    }
    wrapped = gatenorm.dezero_oracles(oracles, sf_dir)
    assert wrapped["ints"] == oracles["ints"]  # no float columns -> untouched
    con = duckdb.connect()
    for t in world.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    raw = con.execute(oracles["neg"]).fetchall()[0][1]
    fixed = con.execute(wrapped["neg"]).fetchall()[0][1]
    assert math.copysign(1.0, raw) == -1.0  # DuckDB really emits -0.0
    assert math.copysign(1.0, fixed) == 1.0


@pytest.mark.parametrize("name", ["densify_lines", "flip_lines", "trim_lines"])
def test_round_emitters_match_strict_hash(spark, sf_dir, name):
    """The ROUND(...,6) emitters match DuckDB under the repr-strict hash."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    srows = {tuple(strict_cell(v) for v in r) for r in sdf.collect()}
    con = duckdb.connect()
    for t in world.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(oracles[name])
    ocols = [d[0] for d in cur.description]
    # align DuckDB column order to Spark's before comparing tuples
    idx = [ocols.index(c) for c in sdf.columns]
    orows = {tuple(strict_cell(r[i]) for i in idx) for r in cur.fetchall()}
    assert srows == orows
    for row in srows:
        assert "-0.0" not in row
