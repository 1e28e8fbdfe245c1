#!/usr/bin/env python
"""Time individual catalog queries with the noop sink (guide §1.4).

Usage: python tools/qtime.py <query> [<query> ...] [--reps N] [--plan]

Per query: one discarded warmup run, then N timed noop-sink runs;
prints min/median and (with --plan) the POST-EXECUTION adaptive plan —
the only place AQE's exchange reuse / join rewrites are visible
(pre-execution explain shows isFinalPlan=false).
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args = [a for a in args if a != str(reps)]
    show_plan = "--plan" in sys.argv

    from meeseeker_spark import catalog
    from meeseeker_spark.session import get_spark
    spark = get_spark(app_name="qtime")

    for name in args:
        fn = catalog.ENTRIES[name].spark
        spark.sparkContext.setJobDescription(f"qtime:{name}:warmup")
        df = fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}:{i}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        print(f"{name}: min={min(times):.3f} med={statistics.median(times):.3f} "
              f"all={[round(t, 3) for t in times]}")
        if show_plan:
            # the noop .save() executes a SEPARATE QueryExecution — this
            # df's own plan stays isFinalPlan=false until the df itself
            # runs, so collect() first (same trick as test_plans.py)
            df.collect()
            print(df._jdf.queryExecution().executedPlan().toString())
    spark.stop()


if __name__ == "__main__":
    main()
