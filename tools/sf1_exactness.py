#!/usr/bin/env python
"""One-shot sf1 exactness run (VERDICT r12 item 3; results in SCALING.md).

The driver's correctness gate runs at sf0.01 and the pytest parity sweep
at sf0.001; thresholds baked into the graded queries (screen_replay's
10,000 bucket cap, dedup_eval's max_df posting guard, domain_cap's slack
window, frequent_lines' HAVING floor, the unimax/temperature sampling
budgets) could in principle CROSS at a larger scale and change results in
a way the small-SF gates never see.  This harness runs graded entries
Spark-vs-DuckDB at the derived sf1 (tools/make_scaled_sf.py output — run
that first).

Comparison method: the Spark result is written to parquet (columns
sorted by name) and DuckDB diffs it against the oracle with EXCEPT ALL
both ways — bag equality on NATIVE types, entirely in-engine.  The r13
first cut collected both sides into Python tuples and sorted them; that
is exact but O(rows) in driver memory and Python-loop time, and on the
6M-row passthrough entries (flatten_ops/trx_index/header_enrich/
nai_amounts at sf1) one compare burned 44 CPU-minutes before it was
killed.  The parquet diff does the identical bag-equality check in
seconds (flatten_ops: 19 s Spark + 41 s DuckDB), with doubles compared
bit-for-bit as doubles — no string rendering in the loop.

Usage:
    python tools/make_scaled_sf.py             # once: builds bench_data/sf1
    python tools/sf1_exactness.py [sf_dir] [name ...]
                                               # default: every oracled entry

r13 record: ALL 50 frozen-window entries ran 50/50 EXACT at sf1
(SCALING.md).  Exits non-zero on any mismatch.
"""
from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# the entries whose semantics carry a scale-sensitive threshold/cap —
# the minimal set worth re-running after a catalog change (the full
# default sweep covers these plus every other oracled entry)
THRESHOLD_BEARING = [
    "near_dup_pairs", "dedup_components", "span_cleaned_docs",
    "decontaminated_spans", "screen_replay", "dedup_eval",
    "domain_cap", "frequent_lines", "heavy_hitters", "winnow_fps",
    "unimax_sample", "temperature_sample",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# legacy alias (the r13 first-cut harness exported NAMES)
NAMES = THRESHOLD_BEARING


def check_entry(spark, con, queries, oracles, name, sf_dir,
                tmp="/tmp/sf1_exactness_spark_out"):
    """One entry's Spark-vs-DuckDB bag-equality diff at ``sf_dir``:
    Spark writes the result to parquet (columns sorted by name), DuckDB
    EXCEPT-ALLs it against the oracle both ways — native-typed, in-
    engine, O(seconds) where the r13 collect-to-driver compare burned
    44 CPU-minutes.  Returns (ok, n_spark, n_oracle, n_diff, t_spark,
    t_duck).  Shared by the CLI sweep and the opt-in ``-m sf1`` pytest
    gate (VERDICT r13 item 5)."""
    t0 = time.time()
    sdf = queries[name](spark, sf_dir)
    cols = sorted(sdf.columns)
    shutil.rmtree(tmp, ignore_errors=True)
    sdf.select(*cols).write.mode("overwrite").parquet(tmp)
    t_spark = time.time() - t0
    t0 = time.time()
    order = ", ".join(f'"{c}"' for c in cols)
    n_spark, n_diff = con.execute(f"""
        WITH s AS (SELECT {order}
                   FROM read_parquet('{tmp}/*.parquet')),
             d AS (SELECT {order} FROM ({oracles[name]}))
        SELECT (SELECT count(*) FROM s),
               (SELECT count(*) FROM (
                    (SELECT * FROM s EXCEPT ALL SELECT * FROM d)
                    UNION ALL
                    (SELECT * FROM d EXCEPT ALL SELECT * FROM s)))
    """).fetchone()
    n_oracle = con.execute(
        f"SELECT count(*) FROM ({oracles[name]})").fetchone()[0]
    t_duck = time.time() - t0
    ok = (n_diff == 0) and (n_spark == n_oracle)
    return ok, n_spark, n_oracle, n_diff, t_spark, t_duck


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else str(
        REPO / "bench_data" / "sf1")

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as ent

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false").getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    q, o = ent.queries(), ent.oracle_sql()
    names = args if args else sorted(o)

    bad = []
    for name in names:
        try:
            ok, n_spark, n_oracle, n_diff, t_spark, t_duck = check_entry(
                spark, con, q, o, name, sf_dir)
        except Exception as e:  # report and keep sweeping
            bad.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        if not ok:
            bad.append(name)
        print(f"{name}: {'EXACT' if ok else 'MISMATCH'} "
              f"rows={n_spark}/{n_oracle} diff={n_diff} "
              f"spark={t_spark:.1f}s duck={t_duck:.1f}s", flush=True)
    print("TOTAL", len(names), "BAD", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
