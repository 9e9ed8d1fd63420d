"""Signed-zero normalization at the correctness-gate boundary.

IEEE doubles carry a sign bit on zero, and the two engines disagree on when
they emit it: DuckDB ``ROUND(-1e-9, 6)`` returns ``-0.0`` while Spark's
returns ``0.0`` (round 2's only red gate row, ``densify_lines``, was exactly
one such vertex). The values are equal as doubles, but the driver's value
hash stringifies them differently. Rather than chasing each ``ROUND``
emitter, both gate surfaces are normalized once here:

- ``dezero_df`` appends ``+ 0.0`` to every double/float (and array-of-double)
  output column of a Spark gate query — IEEE guarantees ``-0.0 + 0.0 = +0.0``
  and every other value (including NaN/inf) passes through unchanged.
- ``dezero_oracles`` wraps each DuckDB oracle in an equivalent projection.
  Column types come from a one-time ``DESCRIBE`` against views over the
  smallest driver parquet (binding only — nothing executes).

Cross-engine float equality elsewhere is untouched: the wrapper sits above
the final projection, so plans, pushdown, and join strategies are identical;
it is one extra codegen'd ``dadd`` per double cell.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: sf dir used only to DESCRIBE oracle column types (schema is sf-invariant).
DESCRIBE_SF_DIR = os.environ.get("SPARK_GRAFT_DESCRIBE_SF", "/root/testdata/sf0.001")


def dezero_df(df: DataFrame) -> DataFrame:
    """Normalize -0.0 to +0.0 in all top-level double/float output columns."""
    cols, changed = [], False
    for f in df.schema.fields:
        c = F.col(f"`{f.name}`")
        if isinstance(f.dataType, T.DoubleType):
            cols.append((c + F.lit(0.0)).alias(f.name))
            changed = True
        elif isinstance(f.dataType, T.FloatType):
            cols.append((c + F.lit(0.0)).cast("float").alias(f.name))
            changed = True
        elif isinstance(f.dataType, T.ArrayType) and isinstance(
            f.dataType.elementType, (T.DoubleType, T.FloatType)
        ):
            elem = f.dataType.elementType
            cols.append(
                F.transform(c, lambda v: (v + F.lit(0.0)).cast(elem)).alias(f.name)
            )
            changed = True
        else:
            cols.append(c)
    return df.select(*cols) if changed else df


_ORACLE_CACHE: dict[int, dict[str, str]] = {}


def dezero_oracles(
    oracles: dict[str, str], sf_dir: str | None = None
) -> dict[str, str]:
    """Wrap each oracle so DuckDB's double/float outputs are +0.0-normalized.

    ``DESCRIBE`` binds the query against parquet views (no execution) to find
    which columns need the ``+ 0.0``; non-SELECT or undescribable oracles pass
    through unchanged (the gate will surface them as before).
    """
    # Key on the full (name, sql) items so edited SQL misses the cache.
    cache_key = hash(tuple(sorted(oracles.items()))) ^ hash(sf_dir)
    if cache_key in _ORACLE_CACHE:
        return _ORACLE_CACHE[cache_key]
    import duckdb

    from . import world

    d = sf_dir or DESCRIBE_SF_DIR
    try:
        con = duckdb.connect()
        for t in world.TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    except Exception:
        # The DESCRIBE parquet dir is absent in this environment: fall back
        # to the unwrapped oracles (one potentially -0.0-sensitive query is
        # better than a broken oracle surface).
        return dict(oracles)
    out: dict[str, str] = {}
    for name, sql in oracles.items():
        try:
            desc = con.execute("DESCRIBE " + sql).fetchall()
        except Exception:
            out[name] = sql
            continue
        sel, changed = [], False
        for row in desc:
            col, typ = row[0], row[1].upper()
            q = f'"{col}"'
            if typ in ("DOUBLE", "FLOAT", "REAL"):
                expr = f"({q} + 0.0)"
                if typ != "DOUBLE":
                    expr = f"CAST({expr} AS {typ})"
                sel.append(f"{expr} AS {q}")
                changed = True
            elif typ in ("DOUBLE[]", "FLOAT[]", "REAL[]"):
                inner = "v + 0.0" if typ == "DOUBLE[]" else f"CAST(v + 0.0 AS {typ[:-2]})"
                sel.append(f"list_transform({q}, v -> {inner}) AS {q}")
                changed = True
            else:
                sel.append(q)
        out[name] = (
            f"SELECT {', '.join(sel)} FROM (\n{sql}\n) __gz" if changed else sql
        )
    con.close()
    if len(_ORACLE_CACHE) > 8:
        _ORACLE_CACHE.clear()
    _ORACLE_CACHE[cache_key] = out
    return out
