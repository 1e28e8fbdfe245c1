#!/usr/bin/env python
"""A/B the `InferFiltersFromGenerate` exclusion on the bench headline
(VERDICT r9 item 4).

Round 9 excluded the rule in every session because it plants an
O(len²)-per-row re-tokenizing filter under every shingle/gram explode
(measured 8-52× on the ext/ text path — jaccard at sf1: 197→7 s).  The
r9 driver bench then moved +7.8% with the delta concentrated on the
LIGHT posexplode/agg queries (trx_index +38%, token_totals +24%,
flatten_ops +17%) — plausibly because the same rule also INSERTS cheap
pre-Generate null/size prunes that the flatten family benefited from.
This script adjudicates: one session, both arms warmed, arms
INTERLEAVED per pass (so slow box drift hits both equally), best-of-N
per query per arm.

Usage: python tools/ab_infer_gen.py [--reps 3] [--json OUT]
Arms: `excluded` = production conf (rule excluded), `stock` = vanilla
optimizer (measurement-only knob SPARK_GRAFT_STOCK_OPTIMIZER=1 keeps
tables.load from re-pinning the exclusion mid-arm).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RULE = ("org.apache.spark.sql.catalyst.optimizer."
        "InferFiltersFromGenerate")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from bench import HEADLINE, _consume
    from meeseeker_spark import catalog
    from meeseeker_spark.session import get_spark
    from meeseeker_spark.tables import warm_tables

    spark = get_spark(app_name="ab-infer-gen")
    warm_tables(spark, SF_DIR)

    def set_arm(stock: bool) -> None:
        if stock:
            os.environ["SPARK_GRAFT_STOCK_OPTIMIZER"] = "1"
            spark.conf.set("spark.sql.optimizer.excludedRules", "")
        else:
            os.environ.pop("SPARK_GRAFT_STOCK_OPTIMIZER", None)
            spark.conf.set("spark.sql.optimizer.excludedRules", RULE)

    def run_pass() -> dict[str, float]:
        out = {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            _consume(catalog.ENTRIES[name].spark(spark, SF_DIR))
            out[name] = round(time.perf_counter() - t0, 3)
        return out

    # one discarded warmup per arm (codegen differs per plan variant)
    set_arm(False)
    run_pass()
    set_arm(True)
    run_pass()

    arms: dict[str, list[dict[str, float]]] = {"excluded": [], "stock": []}
    for _ in range(args.reps):
        set_arm(False)
        arms["excluded"].append(run_pass())
        set_arm(True)
        arms["stock"].append(run_pass())
    set_arm(False)  # leave the process in the production conf

    best = {arm: {q: min(p[q] for p in passes) for q in HEADLINE}
            for arm, passes in arms.items()}
    deltas = {q: round((best["excluded"][q] - best["stock"][q])
                       / best["stock"][q] * 100, 1)
              for q in HEADLINE}
    report = {
        "sf": SF_DIR,
        "reps": args.reps,
        "best": best,
        "totals": {a: round(sum(v.values()), 3) for a, v in best.items()},
        "excluded_minus_stock_pct": deltas,
        "pass_totals": {a: [round(sum(p.values()), 3) for p in ps]
                        for a, ps in arms.items()},
    }
    print(json.dumps(report, indent=1))
    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
