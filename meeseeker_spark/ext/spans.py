"""Exact-substring (span) deduplication + context-window chunking
(SURVEY §2 F2/F4 extensions, driver north star).

Doc-level dedup (ext.dedup) removes whole near-duplicate documents; this
module removes *repeated passages* — the "ExactSubstr" operator of
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" (arXiv:2107.06499), re-expressed for Spark:

- a duplicated n-word gram anywhere in the corpus marks the words it
  covers; maximal runs of marked words are the repeated SPANS
  (``repeated_spans``);
- ``strip_repeated_spans`` rewrites the corpus keeping only the globally
  FIRST occurrence of each duplicated gram (first = min (doc_id, pos)),
  dropping every word covered by a non-first occurrence.

Scale shape (the 100 TB story):

- the gram stream is skinny — (doc_id BIGINT, pos INT, 16-hex-char hash)
  — one md5 per position, same one-crypto-hash budget as the MinHash
  path in ext.dedup;
- duplicate detection is groupBy(h) + semi-join back, NOT a window over
  h: groupBy gets map-side partial aggregation, so a degenerate
  boilerplate gram (df in the millions at 100 TB) is absorbed by
  combiners instead of serializing one window partition.  The join back
  reuses the groupBy's exchange (same key);
- ``max_df`` drops ultra-common grams from consideration *before* the
  per-occurrence ranking, so the row_number window partitions are
  bounded by the cap — without it, one boilerplate sentence would put
  its whole posting list in a single window task.  Dropping a too-common
  gram is conservative for ``strip`` (text is kept, not removed);
- span merging is a per-document interval union (windows partitioned by
  doc_id, bounded by document length) — never a corpus-wide sort.

Hashes are md5 prefixes, so the DuckDB oracle reproduces every decision
bit-for-bit (tests/test_ext.py pins exact parity; the graded
``repeated_spans`` catalog entry mirrors the pipeline in SQL).

Tokenization here is a plain single-space split — NOT ext.text.tokens —
so ``strip_repeated_spans`` can rebuild the surviving text exactly
(join(' ') is the inverse of split(' ')).  Production would split on the
model tokenizer's pretokens; the plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def gram_positions(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 8) -> DataFrame:
    """(_id, pos, h): 64-bit (16 hex chars) md5 prefix of each n-word
    gram, with its word offset.  Documents shorter than n words emit
    nothing (they cannot contain an n-gram; doc-level dedup owns them).

    The word array is projected in a separate select so the split runs
    once per row (same bound-column rule as ext.dedup.shingles_from_tokens
    — an inlined split would re-tokenize at every element_at site).

    r15: the per-position md5 construction is the span family's heavy
    NARROW stage — on an unsplittable small scan it ran serial; the
    whole family shares this builder, so ``spread_scan`` here
    parallelizes repeated_spans / span_cleaned_docs /
    decontaminated_spans / chunk_windows at once (measured +0.25-0.6 s
    each at sf0.1; no-op branch at scale — guide §2.5)."""
    if n < 1:
        raise ValueError("gram width n must be >= 1")
    from ..tables import spread_scan
    w = (
        spread_scan(df.select(F.col(id_col).alias("_id"),
                              F.split(F.col(text_col), " ").alias("_w")))
        .where(F.size("_w") >= n)
    )
    hashes = F.transform(
        F.sequence(F.lit(0), F.size(F.col("_w")) - n),
        lambda i: F.substring(
            F.md5(F.concat_ws(
                " ", *[F.element_at(F.col("_w"), i + j + 1)
                       for j in range(n)])),
            1, 16),
    )
    return w.select("_id", F.posexplode(hashes).alias("pos", "h"))


def _dup_hits(g: DataFrame, min_count: int, max_df: int | None) -> DataFrame:
    """Occurrences of duplicated grams: groupBy(h) posting counts
    (map-side combined — skew-safe), then join back on h.  Catalyst
    reuses the groupBy exchange for the join side."""
    counts = g.groupBy("h").agg(F.count("*").alias("df"))
    keep = counts.where(F.col("df") >= min_count)
    if max_df is not None:
        keep = keep.where(F.col("df") <= max_df)
    return g.join(keep, "h")


def _merge_spans(hits: DataFrame, n: int) -> DataFrame:
    """Per-document interval union of the word ranges [pos, pos+n-1]:
    the island trick — all intervals have length n, so sorted by pos a
    gap of more than n words starts a new span."""
    wd = Window.partitionBy("_id").orderBy("pos")
    return (
        hits
        .withColumn(
            "_new",
            F.when(F.col("pos") - F.lag("pos").over(wd) <= n, F.lit(0))
            .otherwise(F.lit(1)))
        .withColumn("_span", F.sum("_new").over(wd))
        .groupBy("_id", "_span")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + F.lit(n - 1)).alias("span_end"),
             F.count("*").alias("n_dup_grams"))
        .drop("_span")
    )


def repeated_spans(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 8,
                   min_count: int = 2,
                   max_df: int | None = None) -> DataFrame:
    """Maximal repeated spans per document: every maximal run of words
    covered by at least one duplicated n-gram.

    Returns (id_col, span_start, span_end, span_words, n_dup_grams),
    offsets in words, both ends inclusive."""
    g = gram_positions(df, id_col, text_col, n)
    spans = _merge_spans(_dup_hits(g, min_count, max_df).select("_id", "pos"), n)
    return spans.select(
        F.col("_id").alias(id_col), "span_start", "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_words"),
        "n_dup_grams")


def strip_repeated_spans(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 8,
                         max_df: int | None = None) -> DataFrame:
    """Lee-et-al. corpus rewrite: keep the globally first occurrence of
    every duplicated n-gram (first = min (doc_id, pos)); drop each word
    covered by any NON-first occurrence, then rebuild the text.

    A word covered by both a first and a non-first occurrence (the two
    grams overlap inside one document) is dropped — removal wins, same
    rule for every position, so reruns are deterministic.  Grams with
    df > ``max_df`` are left untouched (conservative: too-common ≈
    boilerplate the quality filters own; and the cap bounds the
    per-gram ranking window, see module docstring).

    Returns all input columns plus (clean_text, n_removed_words,
    n_spans_removed); documents without duplicated grams pass through
    with clean_text == text."""
    g = gram_positions(df, id_col, text_col, n)
    hits = _dup_hits(g, 2, max_df)
    who = Window.partitionBy("h").orderBy("_id", "pos")
    losers = (
        hits.withColumn("_rn", F.row_number().over(who))
        .where(F.col("_rn") > 1)
        .select("_id", "pos")
    )
    return apply_drop_spans(df, _merge_spans(losers, n), id_col, text_col)


def apply_drop_spans(df: DataFrame, spans: DataFrame, id_col: str,
                     text_col: str) -> DataFrame:
    """Rebuild text with every word inside a drop span removed.

    ``spans`` is (_id, span_start, span_end, ...) word intervals (both
    ends inclusive, as produced by ``_merge_spans``).  Shared tail of
    ``strip_repeated_spans`` and the surgical decontamination strip
    (ext.decontam.strip_contaminated_spans) — one definition so the two
    rewrites can never diverge.  Returns all input columns plus
    (clean_text, n_removed_words, n_spans_removed); rows with no spans
    pass through with clean_text == text."""
    drop = (
        spans
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list(
            F.struct(F.col("span_start").alias("s"),
                     F.col("span_end").alias("e")))).alias("_drop"))
    )
    out = df.join(drop, df[id_col] == drop["_id"], "left").drop("_id")
    words = F.split(F.col(text_col), " ")
    kept = F.filter(
        words,
        lambda x, i: ~F.exists(
            F.col("_drop"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])))
    return (
        out
        .withColumn(
            "clean_text",
            F.when(F.col("_drop").isNull(), F.col(text_col))
            .otherwise(F.concat_ws(" ", kept)))
        .withColumn(
            "n_removed_words",
            F.when(F.col("_drop").isNull(), F.lit(0))
            .otherwise(F.size(words) - F.size(kept)))
        .withColumn(
            "n_spans_removed",
            F.coalesce(F.size("_drop"), F.lit(0)))
        .drop("_drop")
    )


def chunk_windows(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", size: int = 32,
                  stride: int = 24) -> DataFrame:
    """Context-window chunking: split each document into word windows of
    ``size`` words starting every ``stride`` words (overlap when
    stride < size) — the standard pre-tokenization step that turns
    variable-length documents into model-context-sized training rows
    (complement of ext.pack, which concatenates SHORT docs up to the
    context length; this splits LONG ones).

    Purely narrow — a per-row sequence + slice, no shuffle at all: the
    chunk stream partitions exactly like the document scan, which is the
    plan you want feeding a tokenizer at 100 TB.

    Returns (id_col, chunk_id, chunk_start, n_words, chunk_text); the
    final window is short when the tail has fewer than ``size`` words;
    empty docs yield a single empty chunk with n_words = 0 (kept so
    chunk counts reconcile with doc counts).  stride > size is rejected
    — it would silently drop the words between consecutive windows."""
    if stride <= 0:
        raise ValueError("stride must be positive")
    if stride > size:
        raise ValueError(
            f"stride ({stride}) > size ({size}) would leave words "
            "covered by no chunk")
    w = df.select(F.col(id_col),
                  F.split(F.col(text_col), " ").alias("_w"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_w") - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_id"),
            s.alias("chunk_start"),
            F.slice(F.col("_w"), s + 1, size).alias("_cw")))
    return (
        w.select(id_col, F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.chunk_start").alias("chunk_start"),
            # count NON-EMPTY tokens (r15 review): irregular whitespace
            # splits to empty strings ('a  b' → ['a','','b']) which are
            # slice positions but not words — a raw size() over-counted
            # token budgets on real-world text (and the empty doc's ['']
            # needed a special case this filter now subsumes)
            F.size(F.filter("_c._cw", lambda x: x != F.lit("")))
            .alias("n_words"),
            F.concat_ws(" ", "_c._cw").alias("chunk_text"))
    )
