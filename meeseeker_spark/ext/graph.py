"""Host-level link-graph analysis (beyond-reference LLM-pipeline
stage; the domain-curation family beside ext/urls).

Web-corpus pipelines rank DOMAINS, not pages: CommonCrawl publishes
host-level PageRank/harmonic ranks, and C4/CCNet/RefinedWeb-style
curation filters or weights by domain authority.  The 100 TB shape has
two parts with very different sizes, and the split is the whole design:

1. ``host_edges`` — reduce the corpus to a weighted host graph with ONE
   skinny aggregate: (citing source, cited host, n_links).  The text
   column never leaves the map side; the result is graph-sized (tens to
   millions of rows), not corpus-sized.
2. ``pagerank`` — iterate on the graph only.  Each iteration is one
   join + one aggregate over EDGE rows; corpus size never re-enters.
   This is the doremi/heavy-hitters budget class: corpus-scale work
   happens exactly once, the iterative part is bounded by the graph.

PageRank here is the standard damped power iteration with dangling-mass
redistribution (Page et al. 1999): ranks sum to 1 every iteration
(pinned by test); deterministic for a fixed iteration count.  Float
sums over a node's in-neighbors make the values machine-dependent in
the last ulps (libm-free, but row-order summation) — the catalog entry
is rows-only with a pure-Python replay parity test, per the r9 hash
rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_edges(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               source_col: str = "source") -> DataFrame:
    """Weighted citation edges (src, dst, weight): the doc's source
    cites every host extracted from its text, with multiplicity.

    Scale: regexp extract + explode inside codegen (the shared
    ``ext.urls.hosts_in_text`` projection), then one map-side combined
    count on the skinny (source, host) pair — the corpus reduces to
    the graph in a single pass."""
    from .urls import hosts_in_text

    return (hosts_in_text(docs, source_col, text_col)
            .select(F.col(source_col).alias("src"),
                    F.col("host").alias("dst"))
            .where(F.col("dst") != "")
            .groupBy("src", "dst")
            .agg(F.count("*").alias("weight")))


def pagerank(edges: DataFrame, damping: float = 0.85,
             iters: int = 20,
             driver_threshold: int | None = 300_000) -> DataFrame:
    """Damped PageRank with dangling-mass redistribution over weighted
    edges (src, dst, weight) → (node, rank) for every node on either
    side; Σ rank = 1 each iteration.

    Two regimes, measured (SCALING.md r11 + the r12 crossover sweep):
    a graph at or below ``driver_threshold`` edges iterates ON THE
    DRIVER — the doremi/heavy-hitters budget class (the corpus-scale
    work already happened in host_edges' aggregate; per-iteration JOB
    LAUNCH dominates the distributed loop at graph sizes, and a
    graph-sized repartition was measured NOT to help).  Fixed
    iteration order (edges sorted by (src, dst)) makes the driver
    ranks deterministic fixed-order IEEE arithmetic.  Past the
    threshold the distributed loop runs: each iteration is one
    edges⨝ranks join + one sum aggregate keyed on dst (graph-sized);
    the dangling mass is a 1-row aggregate attached by broadcast cross
    join, never a driver round-trip; lineage truncates per iteration
    with localCheckpoint (the connected_components idiom).  Both paths
    are pinned against the same pure-Python oracle in tests.

    The 300k default is MEASURED (tools/pagerank_crossover.py, r12,
    web-like hub graphs at 30k/100k/300k/1M edges, iters=20): the
    driver loop wins at every point (0.74 vs 17.4 s at 30k; 5.9 vs
    23.4 s at 300k; 18.6 vs 22.1 s at 1M — the distributed arm is
    job-launch-flat), so the TIME crossover extrapolates to ~1.5M
    edges on local[32]; the default sits an order below it because
    the driver regime's real bound is HEAP, not time — the collected
    edge list measures ~173 MB per 1M string-keyed edges (52 MB at
    the 300k pin), linear in edges, and past ~1M edges that claim
    belongs to the caller, not a default.

    A caller that already knows the regime can skip the edge-count job
    (ADVICE r11): ``driver_threshold=None`` forces the driver loop
    (collects the edges — the caller owns the memory claim),
    ``driver_threshold=0`` forces the distributed loop."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    edges = edges.localCheckpoint()
    spark = edges.sparkSession
    # the result schema derives from the edge key type, so integer-id
    # graphs get the same (node, rank) shape on BOTH regimes (r11
    # review: a hardcoded string schema made the driver path crash on
    # non-string ids while the distributed path accepted them)
    out_schema = StructType([
        StructField("node", edges.schema["src"].dataType, True),
        StructField("rank", DoubleType(), True)])
    if driver_threshold is None:
        use_driver = True
    elif driver_threshold <= 0:
        use_driver = False
    else:
        use_driver = edges.count() <= driver_threshold
    if use_driver:
        rows = sorted((r["src"], r["dst"], r["weight"])
                      for r in edges.collect())
        node_set = sorted({s for s, _, _ in rows}
                          | {d for _, d, _ in rows})
        n = len(node_set)
        if n == 0:
            return spark.createDataFrame([], out_schema)
        outw: dict = {}
        for s, _, w in rows:
            outw[s] = outw.get(s, 0) + w
        rank = {v: 1.0 / n for v in node_set}
        base = (1.0 - damping) / n
        for _ in range(iters):
            contrib = {v: 0.0 for v in node_set}
            for s, d, w in rows:
                contrib[d] += rank[s] * w / outw[s]
            dang = sum(rank[v] for v in node_set if v not in outw)
            rank = {v: base + damping * (contrib[v] + dang / n)
                    for v in node_set}
        return spark.createDataFrame(
            [(v, rank[v]) for v in node_set], out_schema)
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("_ow"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        # empty-graph guard (r15 review): the driver regime returns an
        # empty frame for this input; without the same guard here the
        # 1.0/n below raises ZeroDivisionError and the two documented
        # regimes diverge on the same (empty) edge set
        return spark.createDataFrame([], out_schema)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            edges.join(out_w, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") * F.col("weight") / F.col("_ow"))
                    .alias("_c"))
            .groupBy("node").agg(F.sum("_c").alias("_c")))
        dangling = (ranks.join(out_w,
                               ranks["node"] == out_w["src"], "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("_dang")))
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select("node",
                    (F.lit((1.0 - damping) / n)
                     + F.lit(damping)
                     * (F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dang") / F.lit(float(n))))
                    .alias("rank"))
        ).localCheckpoint()
    return ranks


def host_pagerank(docs: DataFrame, damping: float = 0.85,
                  iters: int = 20, round_dp: int = 4) -> DataFrame:
    """The catalog composition: corpus → host graph → PageRank →
    (node, rank) rounded for presentation.  On the fixture's spliced
    URL grid the shared mirror host (cited by every 5th doc from ALL
    sources) must out-rank every per-residue grid host — pinned by
    test.  The fixture text is URL-free, so the URLs splice in-plan via
    ``attach_urls`` (the house honesty device; byte-identical SQL
    twin)."""
    from .urls import attach_urls

    spliced = attach_urls(docs)
    ranks = pagerank(host_edges(spliced, text_col="text_urls"),
                     damping=damping, iters=iters)
    return ranks.select("node", F.round("rank", round_dp).alias("rank"))
