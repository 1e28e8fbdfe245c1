"""Local replica of the driver's DuckDB-oracle comparison: run a catalog
entry's Spark query and its oracle SQL on the same sf dir, compare
row-count + column names + order-insensitive values.

DRIVER-EXACT by design (round-1 lesson: a looser local compare let green
tests hide driver-red representation bugs):

- no float tolerance — the catalog convention is to round any arithmetic
  result identically on both sides, so exact equality must hold;
- Decimals compare by their string form (scale included) — a DECIMAL(18,2)
  vs DECIMAL(38,9) divergence is a representation bug even when the values
  are numerically equal;
- array/map/struct-typed output columns FAIL outright: the driver hashes
  serialized rows, and round 1 proved raw containers are
  representation-fragile — the catalog serializes them to sorted CSV
  strings before they reach the output.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from meeseeker_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return f"decimal:{v}"          # scale-sensitive on purpose
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def _container_cols(cols, rows) -> list[str]:
    bad = set()
    for r in rows[:100]:
        for c, v in zip(cols, r):
            if isinstance(v, (list, tuple, dict)) or hasattr(v, "asDict"):
                bad.add(c)
    return sorted(bad)


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if type(a) is not type(b) and not (
            isinstance(a, (int, bool)) and isinstance(b, (int, bool))):
        return False                    # int-vs-float etc. hash differently
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty list == pass."""
    problems: list[str] = []
    spark_cols = list(spark_df.columns)
    raw_spark = [tuple(r) for r in spark_df.collect()]
    spark_rows = [tuple(_norm(v) for v in r) for r in raw_spark]

    bad_cols = _container_cols(spark_cols, raw_spark)
    if bad_cols:
        problems.append(
            f"array/struct-typed output columns {bad_cols}: serialize to "
            "sorted CSV strings before output (driver hashes representations)")
        return problems

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(_norm(v) for v in r) for r in res.fetchall()]

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={spark_cols} duck={duck_cols}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    # reorder duck columns to spark order
    idx = [duck_cols.index(c) for c in spark_cols]
    duck_rows = [tuple(r[i] for i in idx) for r in duck_rows]

    spark_rows.sort(key=_sort_key)
    duck_rows.sort(key=_sort_key)
    n_bad = 0
    for i, (s, d) in enumerate(zip(spark_rows, duck_rows)):
        if len(s) != len(d) or not all(_values_equal(x, y)
                                       for x, y in zip(s, d)):
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={s!r} duck={d!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
