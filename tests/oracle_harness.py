"""Local replica of the driver's DuckDB-oracle comparison: run a catalog
entry's Spark query and its oracle SQL on the same sf dir, compare
row-count + column names + order-insensitive values.

Floats are compared with a tight tolerance (1e-9 relative) — the catalog's
convention is to round any arithmetic result identically on both sides, so
differences beyond rounding noise are real bugs.
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
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def _values_close(a, b, rel=1e-9, abs_tol=1e-9) -> bool:
    if isinstance(a, float) and isinstance(b, (float, int)):
        if math.isnan(a) and isinstance(b, float) and math.isnan(b):
            return True
        return math.isclose(a, float(b), rel_tol=rel, abs_tol=abs_tol)
    if isinstance(b, float) and isinstance(a, int):
        return math.isclose(float(a), b, rel_tol=rel, abs_tol=abs_tol)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_close(x, y, rel, abs_tol) for x, y in zip(a, b))
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty list == pass."""
    problems: list[str] = []
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(_norm(v) for v in r) for r in spark_df.collect()]

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
        if not _values_close(s, d):
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={s!r} duck={d!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
