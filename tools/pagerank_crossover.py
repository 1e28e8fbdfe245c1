#!/usr/bin/env python
"""Measure the pagerank driver/distributed regime crossover (VERDICT
r12 item 2).

The ``driver_threshold=100_000`` pin in ext/graph.py was argued from
one 69-node fixture point (the 7× job-launch win) plus a budget-class
analogy; house style is MEASURED thresholds.  This tool generates
web-like host graphs from a fixed generative class — Zipf(1.6)-drawn
endpoints over a node population of edges/10, duplicate (src, dst)
draws aggregated into weights, exactly the shape ``host_edges``
produces — at ~30k / 100k / 300k / 1M aggregated edges, and times BOTH
regimes (``driver_threshold=None`` forces the driver loop,
``0`` forces the distributed loop; both skip the count job, so the
arms time pure regime cost) at iters=20, best-of-N after a discarded
warmup of each arm at the smallest size.

Also reports the driver-path memory claim: the deep size of the
collected, sorted (src, dst, weight) edge list — the object the driver
regime actually holds (ranks/contrib dicts are node-sized, an order
smaller at edges/nodes = 10).

Usage: python tools/pagerank_crossover.py [reps]   (default 2)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SIZES = [30_000, 100_000, 300_000, 1_000_000]
ITERS = 20
ZIPF_A = 1.6


def gen_edges(spark, n_edges: int, seed: int):
    """~n_edges aggregated (src, dst, weight) rows over edges/10 hosts:
    uniform sources, 30% of links aimed at a 16-hub head (the in-degree
    skew real host graphs have; a pure-Zipf pair draw collapses under
    the groupBy and misses the target count by 20×), duplicate draws
    folded into weights like host_edges' groupBy."""
    rng = np.random.default_rng(seed)
    n_nodes = max(64, n_edges // 10)
    n_draws = int(n_edges * 2)
    src = rng.integers(0, n_nodes, n_draws)
    hubbed = rng.random(n_draws) < 0.3
    dst = np.where(hubbed, rng.integers(0, 16, n_draws),
                   rng.integers(0, n_nodes, n_draws))
    keep = src != dst
    pairs, weights = np.unique(
        np.stack([src[keep], dst[keep]]), axis=1, return_counts=True)
    order = rng.permutation(pairs.shape[1])[:n_edges]
    order = order[np.lexsort((pairs[1][order], pairs[0][order]))]
    rows = [(f"h{int(pairs[0][i])}", f"h{int(pairs[1][i])}",
             int(weights[i])) for i in order]
    return spark.createDataFrame(
        rows, "src string, dst string, weight bigint"), len(rows)


def deep_size(rows) -> int:
    seen: set[int] = set()

    def sz(o) -> int:
        if id(o) in seen:
            return 0
        seen.add(id(o))
        s = sys.getsizeof(o)
        if isinstance(o, (list, tuple)):
            s += sum(sz(x) for x in o)
        return s

    return sz(rows)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import functions as F  # noqa: F401

    from meeseeker_spark.ext.graph import pagerank
    from meeseeker_spark.session import get_spark

    spark = get_spark(app_name="pagerank-crossover")

    def run(edges, thr) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            pagerank(edges, iters=ITERS, driver_threshold=thr).count()
            best = min(best, time.monotonic() - t0)
        return best

    # warmup both arms once at the smallest size (JIT/codegen settle)
    w, _ = gen_edges(spark, SIZES[0], seed=99)
    w = w.localCheckpoint()
    pagerank(w, iters=2, driver_threshold=None).count()
    pagerank(w, iters=2, driver_threshold=0).count()

    print(f"| edges | nodes | driver (s) | distributed (s) | "
          f"winner | collected list MB |")
    print("|---|---|---|---|---|---|")
    for n in SIZES:
        edges, actual = gen_edges(spark, n, seed=7)
        edges = edges.localCheckpoint()  # arms time iteration, not gen
        n_nodes = edges.select("src").union(
            edges.select("dst")).distinct().count()
        t_drv = run(edges, None)
        t_dist = run(edges, 0)
        mem_mb = deep_size(
            sorted((r["src"], r["dst"], r["weight"])
                   for r in edges.collect())) / 2 ** 20
        winner = "driver" if t_drv < t_dist else "distributed"
        print(f"| {actual:,} | {n_nodes:,} | {t_drv:.2f} | {t_dist:.2f} "
              f"| {winner} | {mem_mb:.0f} |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
