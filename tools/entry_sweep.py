#!/usr/bin/env python
"""Full-catalog hot-spot sweep: per-entry DRIVER BUILD latency and
EXECUTION wall time (noop sink, warm best-of-N) — the r15/r16
measurement loop behind the per-operator checklists, committed so the
sweep is reproducible instead of ad hoc.

Build = constructing the DataFrame (py4j expression construction,
analysis, any bounded probe jobs a builder runs); exec = the noop-sink
save of an already-built frame.  Per entry: one discarded warmup
(build+exec), then N timed rounds; prints one JSON line per entry plus
a sorted summary, so a killed run still leaves usable rows.

Usage: python tools/entry_sweep.py [--reps N] [name ...]
       (default: every catalog entry, reps 2)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        # floor at 1 (r16 review): reps 0 left build/exec at inf, which
        # json.dumps renders as bare Infinity — invalid JSON downstream
        reps = max(1, int(args[i + 1]))
        del args[i:i + 2]

    from meeseeker_spark import catalog
    from meeseeker_spark.session import get_spark
    from meeseeker_spark.tables import warm_tables

    # validate names BEFORE any JVM spins up (r16 review: a typo used
    # to pay the full warm-up, then die on a raw KeyError)
    unknown = [n for n in args if n not in catalog.ENTRIES]
    if unknown:
        raise SystemExit(f"unknown catalog entries: {unknown}")

    spark = get_spark(app_name="entry-sweep")
    warm_tables(spark, SF_DIR)

    names = args or sorted(catalog.ENTRIES)
    rows = []
    for name in names:
        fn = catalog.ENTRIES[name].spark
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        except Exception as e:                     # noqa: BLE001
            print(json.dumps({"entry": name, "error": str(e)[:200]}))
            continue
        build = exec_ = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            build = min(build, t1 - t0)
            exec_ = min(exec_, t2 - t1)
        row = {"entry": name, "build_s": round(build, 3),
               "exec_s": round(exec_, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    rows.sort(key=lambda r: -(r["build_s"] + r["exec_s"]))
    print(json.dumps({
        "total_build_s": round(sum(r["build_s"] for r in rows), 1),
        "total_exec_s": round(sum(r["exec_s"] for r in rows), 1),
        "top10": [(r["entry"], r["build_s"], r["exec_s"])
                  for r in rows[:10]],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
