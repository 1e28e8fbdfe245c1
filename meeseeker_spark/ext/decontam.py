"""Benchmark decontamination (training-data pipeline extension, same
family as SURVEY §2 F — no reference counterpart by definition).

Before training, every corpus document is screened for n-gram overlap
with evaluation/benchmark text; contaminated documents are dropped or
flagged so eval numbers stay honest.  The standard recipe is exact
n-gram collision (13-grams in common practice; configurable here — the
fixture docs are short, so the catalog entry uses the same 3-gram
shingles as the dedup oracles).

Scale shape: the benchmark side is tiny by construction (eval sets are
KBs-to-MBs against a 100 TB corpus), so its distinct n-gram set is
broadcast and the whole screen is ONE map-side join over the exploded
corpus shingles + a per-doc count aggregate — no corpus-side shuffle
except the final doc-keyed count, which partial aggregation reduces to
one row per (partition, doc).  If the benchmark ever outgrows broadcast,
drop the hint and the same plan becomes a shuffle join keyed on the
shingle — nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingle_df


def contamination(docs: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13) -> DataFrame:
    """Per-document benchmark-overlap screen.

    Returns (doc_id, n_grams, n_hits, overlap_frac, contaminated): the
    document's distinct n-gram count, how many of those also occur
    anywhere in ``bench``, the fraction, and the ≥1-hit flag.  Every
    document appears — sub-n docs carry their whole text as one
    shingle, and docs whose text is NULL (so their shingle array is
    NULL) survive via explode_outer with n_grams = 0, n_hits = 0, NULL
    overlap_frac and contaminated = false (ADVICE r9: a plain explode
    silently dropped them from the "full screening report", and
    training_funnel/decontaminate inherited the hole — a NULL-text doc
    could neither be screened nor counted).

    Known n-gram-screen limitation (r15 review, standard to the
    method — GPT-3/PaLM-style n-gram decontamination shares it): a
    benchmark item SHORTER than ``n`` words emits its whole text as one
    shingle, which can only collide with an equally-short corpus
    document — verbatim paste of a sub-n item INSIDE a longer document
    is not detected.  If the benchmark has short items, lower ``n`` to
    its minimum item length (the knob the papers use); the semantic
    screen (``semantic_contamination``) is the paraphrase/short-item
    backstop.

    Plan shape (r9 rewrite, measured 16×): ONE corpus shingle explode
    feeding ONE aggregate that counts n_grams and n_hits together off a
    broadcast left join.  The previous two-subtree form (a size()
    projection joined to a hits aggregate) evaluated the shingle
    pipeline twice — and worse, any downstream WHERE on overlap_frac
    inferred isnotnull(n_grams) and pushed the ENTIRE shingle
    expression into a per-row Filter below the join (the SemDeDup
    isnotnull trap, ROUND_NOTES r4): flagged-set queries went 1.1 s →
    17 s at sf0.1.  With the single aggregate nothing can push below
    the groupBy, and the shingles are built once per row.
    """
    # A NULL/empty-token doc's shingle list is [""] (concat_ws coerces a
    # NULL token array to one empty string) — strip it on BOTH sides so
    # such docs report zero grams instead of one phantom gram that can
    # even collide with a benchmark side's own phantom.
    nonempty = lambda c: F.filter(c, lambda x: x != F.lit(""))  # noqa: E731
    bench_grams = (
        shingle_df(bench, id_col, text_col, n)
        .select(F.explode(nonempty(F.col("_sh"))).alias("_g")).distinct()
        .withColumn("_hit", F.lit(1))
    )
    report = (
        shingle_df(docs, id_col, text_col, n)
        .select("_id", F.explode_outer(nonempty(F.col("_sh"))).alias("_g"))
        .join(F.broadcast(bench_grams), "_g", "left")
        .groupBy("_id")
        # count(_g), not count(*): the explode_outer placeholder row of
        # a NULL/empty-shingle doc must tally zero grams, not one
        .agg(F.count("_g").alias("n_grams"),
             F.count("_hit").alias("n_hits"))
    )
    return report.select(
        F.col("_id").alias(id_col),
        "n_grams",
        "n_hits",
        F.round(F.when(F.col("n_grams") > 0,
                       F.col("n_hits") / F.col("n_grams")), 4)
        .alias("overlap_frac"),
        (F.col("n_hits") > 0).alias("contaminated"),
    )


def benchmark_coverage(docs: DataFrame, bench: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = 13,
                       max_df: int | None = 10_000) -> DataFrame:
    """The inverse report: per BENCHMARK document, how much of it leaks
    into the training corpus — the eval-integrity question ("is this
    benchmark still trustworthy against a model trained on this data?").

    Returns (bench_id, n_grams, n_covered, coverage_frac,
    n_corpus_docs): the benchmark doc's distinct n-gram count, how many
    of those occur anywhere in ``docs``, the fraction, and how many
    DISTINCT corpus documents share at least one n-gram with it.

    Scale shape: coverage reduces the corpus to its distinct-gram set
    first (aggregate ∝ distinct grams, partial-combined).  The distinct-
    doc count needs the gram→doc posting join — the same shape (and the
    same stop-gram hazard) as jaccard_ngram_pairs, so ``max_df`` drops
    grams whose posting list exceeds it before the join (n_corpus_docs
    becomes a lower bound; coverage_frac is unaffected).

    Same phantom-gram guard as ``contamination`` (r10 self-review): a
    NULL/empty-text doc's shingle list is [""], so without the filter a
    contentless benchmark doc would collide with every contentless
    corpus doc and report coverage 1.0.  Such bench docs stay in the
    report (explode_outer) with n_grams = 0 and NULL coverage_frac."""
    nonempty = lambda c: F.filter(c, lambda x: x != F.lit(""))  # noqa: E731
    bgrams = (
        shingle_df(bench, id_col, text_col, n)
        .select(F.col("_id").alias("bench_id"),
                F.explode_outer(nonempty(F.col("_sh"))).alias("_g"))
    )
    # r15: the corpus-side 13-gram shingle explode is the heavy narrow
    # stage (md5-free but gram-string concat per position) — serial on
    # an unsplittable small scan (guide §2.5); no-op branch at scale.
    # The bench side is a small fraction by contract and stays as-is.
    from ..tables import spread_scan
    postings = (
        shingle_df(spread_scan(docs.select(id_col, text_col)),
                   id_col, text_col, n)
        .select(F.col("_id").alias("_cid"),
                F.explode(nonempty(F.col("_sh"))).alias("_g"))
    )
    gram_set = postings.groupBy("_g").agg(F.count("*").alias("_df"))
    cov = (
        bgrams.join(gram_set, "_g", "left")
        .groupBy("bench_id")
        .agg(F.count("_g").cast("bigint").alias("n_grams"),
             F.count("_df").cast("bigint").alias("n_covered"))
    )
    if max_df is not None:
        postings = postings.join(
            gram_set.where(F.col("_df") <= max_df).select("_g"), "_g")
    touch = (
        bgrams.join(postings, "_g")
        .groupBy("bench_id")
        .agg(F.count_distinct("_cid").alias("n_corpus_docs"))
    )
    return (
        cov.join(touch, "bench_id", "left")
        .select(
            "bench_id", "n_grams", "n_covered",
            F.round(F.when(F.col("n_grams") > 0,
                           F.col("n_covered") / F.col("n_grams")), 4)
            .alias("coverage_frac"),
            F.coalesce(F.col("n_corpus_docs"), F.lit(0)).cast("bigint")
            .alias("n_corpus_docs"),
        )
    )


def decontaminate(docs: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13, max_overlap: float = 0.0) -> DataFrame:
    """Drop documents whose benchmark overlap exceeds ``max_overlap``
    (0.0 = any shared n-gram disqualifies — the conservative default).
    Anti-join on the flagged id set; docs pass through otherwise
    untouched.

    The drop decision compares ``n_hits > n_grams·max_overlap`` on the
    exact integers — NOT the report's 4-dp-rounded ``overlap_frac``
    (r10 self-review): at production scale a doc with 25k distinct
    13-grams and one benchmark collision has overlap 4e-5, which
    rounds to 0.0000 and would survive a 0.0 threshold that promises
    "any shared n-gram disqualifies"."""
    flagged = (
        contamination(docs, bench, id_col, text_col, n)
        .where(F.col("n_hits") > F.col("n_grams") * F.lit(float(max_overlap)))
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")


def semantic_contamination(corpus_emb: DataFrame, bench_emb: DataFrame,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.5) -> DataFrame:
    """Embedding-space benchmark screen: n-gram collision
    (``contamination``) misses PARAPHRASED eval leakage, so this flags
    corpus items whose embedding is cosine-close to any benchmark item —
    the semantic-dedup idea (ext.semdedup) pointed at decontamination.

    Returns one row per corpus vector: (id_col, max_sim, n_bench_hits,
    contaminated) — the highest benchmark similarity, how many benchmark
    items clear ``threshold``, and the flag.  Per-pair similarities are
    rounded to 4 dp BEFORE the max/threshold compare so every decision
    is reproducible bit-for-bit by the DuckDB oracle (same convention as
    knn_topk); a count (not an argmax) is reported because argmax under
    exact similarity ties is engine-order-dependent.

    Scale shape: the benchmark side is tiny by construction (an eval
    suite vs a 100 TB corpus), so it broadcasts and the screen is ONE
    pass over the corpus — BroadcastNestedLoopJoin × |bench| per row,
    then a map-side-combined per-id aggregate; no corpus shuffle beyond
    ``normalized``'s one linear barrier (which prevents the
    CollapseProject re-evaluation trap on the join side).  If the bench
    ever outgrows broadcast, swap the hint for the LSH bucket join in
    ext.similarity — the report schema is unchanged.
    """
    from .similarity import dot, normalized

    if bench_emb.isEmpty():
        # an empty benchmark side must still report every corpus vector
        # as screened-clean (r15 review: the unconditioned cross join
        # returned ZERO rows — 'never screened' masquerading as absent,
        # the same silent-row-loss the text screen was hardened against
        # in r9)
        return corpus_emb.select(
            F.col(id_col),
            F.lit(None).cast("double").alias("max_sim"),
            F.lit(0).cast("bigint").alias("n_bench_hits"),
            F.lit(False).alias("contaminated"))

    # narrow barriers (r15): corpus streams once into the broadcast
    # join, bench is built once into the broadcast — neither needs an
    # exchange reuse point, and the corpus-side shuffle disappears
    corpus = normalized(corpus_emb, id_col, vec_col, barrier="narrow")
    bench = (normalized(bench_emb, id_col, vec_col, barrier="narrow")
             .select(F.col(id_col).alias("_bid"),
                     F.col("_nv").alias("_bv")))
    sim = F.round(dot(F.col("_nv"), F.col("_bv")), 4)
    return (
        corpus.join(F.broadcast(bench))
        .select(id_col, sim.alias("_s"))
        .groupBy(id_col)
        .agg(F.max("_s").alias("max_sim"),
             F.sum((F.col("_s") >= F.lit(threshold)).cast("bigint"))
             .alias("n_bench_hits"))
        .withColumn("contaminated", F.col("n_bench_hits") > 0)
    )


def strip_contaminated_spans(docs: DataFrame, bench: DataFrame,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             n: int = 13) -> DataFrame:
    """Surgical decontamination: instead of dropping whole documents
    (``decontaminate``), strip ONLY the passages whose n-grams collide
    with benchmark text — the eval-leakage fix that keeps the rest of
    an otherwise-good document.

    Word spans covered by any benchmark-colliding n-gram are removed
    and the text rebuilt (same interval-union + rebuild machinery as
    ext.spans — single definition via apply_drop_spans, so the two
    rewrites cannot diverge).  Tokenization is the rebuildable plain
    space split (ext.spans convention), not ext.text.tokens.

    Returns all input columns plus (clean_text, n_removed_words,
    n_spans_removed).

    Same sub-n limitation as ``contamination`` (r15 review), one step
    stricter: position-gram extraction yields NOTHING for a benchmark
    item shorter than ``n`` words (no whole-text fallback here), so
    such items strip no spans at all — lower ``n`` to the benchmark's
    minimum item length when that matters.

    Scale shape: the benchmark gram-hash set is tiny by construction
    and broadcasts; the corpus side is the skinny (id, pos, 16-hex h)
    gram stream, so the screen is one map-side join + the per-doc
    interval union (windows bounded by document length)."""
    from .spans import _merge_spans, apply_drop_spans, gram_positions

    g = gram_positions(docs, id_col, text_col, n)
    bg = (gram_positions(bench, id_col, text_col, n)
          .select("h").distinct())
    hits = g.join(F.broadcast(bg), "h").select("_id", "pos")
    return apply_drop_spans(docs, _merge_spans(hits, n), id_col, text_col)
