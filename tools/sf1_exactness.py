#!/usr/bin/env python
"""One-shot sf1 exactness run (VERDICT r12 item 3; results in SCALING.md).

The driver's correctness gate runs at sf0.01 and the pytest parity sweep
at sf0.001; thresholds baked into the graded queries (screen_replay's
10,000 bucket cap, dedup_eval's max_df posting guard, domain_cap's slack
window, frequent_lines' HAVING floor, the unimax/temperature sampling
budgets) could in principle CROSS at a larger scale and change results in
a way the small-SF gates never see.  This harness runs the most
threshold-bearing graded entries Spark-vs-DuckDB at the derived sf1
(tools/make_scaled_sf.py output — run that first), with the driver's own
comparison convention: columns sorted by name, rows compared under a
None-safe sort key.

Usage:
    python tools/make_scaled_sf.py          # once: builds bench_data/sf1
    python tools/sf1_exactness.py [sf_dir]  # default bench_data/sf1

Exits non-zero on any mismatch and prints per-entry EXACT/MISMATCH with
both engines' walls (single-shot cold-session walls — exactness evidence,
not bench numbers).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# the entries whose semantics carry a scale-sensitive threshold/cap
NAMES = [
    "near_dup_pairs", "dedup_components", "span_cleaned_docs",
    "decontaminated_spans", "screen_replay", "dedup_eval",
    "domain_cap", "frequent_lines", "heavy_hitters", "winnow_fps",
    "unimax_sample", "temperature_sample",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
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

    def key(t):
        # None-safe: the driver sorts column-wise, which never compares
        # None against a value; a python tuple sort does, so lift each
        # cell to (is-null, value)
        return tuple((v is None, v) for v in t)

    bad = []
    for name in NAMES:
        t0 = time.time()
        sdf = q[name](spark, sf_dir)
        cols = sorted(sdf.columns)
        s = sorted((tuple(r) for r in sdf.select(*cols).collect()), key=key)
        t_spark = time.time() - t0
        t0 = time.time()
        order = ", ".join(f'"{c}"' for c in cols)
        d = sorted((tuple(r) for r in con.execute(
            f"SELECT {order} FROM ({o[name]})").fetchall()), key=key)
        t_duck = time.time() - t0
        ok = s == d
        if not ok:
            bad.append(name)
            ss, ds = set(s), set(d)
            print(f"  spark-only: {list(ss - ds)[:3]}")
            print(f"  oracle-only: {list(ds - ss)[:3]}")
        print(f"{name}: {'EXACT' if ok else 'MISMATCH'} "
              f"rows={len(s)}/{len(d)} "
              f"spark={t_spark:.1f}s duck={t_duck:.1f}s", flush=True)
    print("BAD:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
