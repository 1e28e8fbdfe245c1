"""Line/paragraph-hash deduplication (SURVEY §2 F2/F4 extension, driver
north star) — the CCNet preprocessing step (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", arXiv:1911.00359): web boilerplate (cookie banners, nav menus,
"subscribe" footers) repeats *per line* across unrelated pages, so the
unit of dedup is the normalized LINE, not the document (ext.dedup) or
the word-gram span (ext.spans).

- ``doc_lines``        — explode docs into (id, line_no, line, h) rows;
                         h = md5 of the lowercased, whitespace-collapsed
                         line, the identity CCNet hashes on.
- ``frequent_lines``   — the boilerplate table: normalized lines that
                         occur in >= min_df DISTINCT documents.
- ``strip_frequent_lines`` — corpus rewrite dropping boilerplate lines,
                         preserving original line order exactly.

Scale shape (the 100 TB story):

- line-frequency counting moves only (doc_id, 16-hex h) pairs — the
  line text never enters the count shuffle; the distinct-doc step is a
  groupBy with map-side partial aggregation, so a line shared by a
  billion pages is absorbed by combiners, never one hot task;
- the strip decision joins docs' line hashes against the (filtered)
  frequent-hash set on h — the same key as the count's exchange, which
  Catalyst reuses; the frequent side after min_df filtering is tiny
  (boilerplate vocabulary, not corpus) and broadcastable;
- the rebuild is ONE shuffle partitioned by doc_id (sort_array over the
  per-doc struct list — bounded by document length, never a global
  sort).

Everything is md5 + integer arithmetic, so the DuckDB oracle reproduces
every keep/drop decision bit-for-bit
(tests/test_ext.py::test_frequent_lines_vs_duckdb /
test_strip_frequent_lines_vs_duckdb).

Fixture honesty: the synthetic documents fixture is single-line (no
newlines), so on driver tables line-dedup degenerates to whole-doc
exact-dup detection — still a valid exactness gate; the multi-line
semantics (planted boilerplate across distinct docs) are pinned by the
synthetic-corpus tests alongside the parity tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Split pattern for "lines". CCNet splits on newline; callers doing
#: sentence-level dedup can pass a sentence-boundary regex instead.
DEFAULT_DELIM = "\n"


def line_hash(col: Column) -> Column:
    """Normalized line identity: md5 prefix (16 hex chars = 64 bits) of
    the lowercased, whitespace-collapsed, trimmed line.  Same
    64-bit-prefix budget as the span/minhash paths; DuckDB twin is
    ``substr(md5(...), 1, 16)``."""
    return F.substring(
        F.md5(F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))), 1, 16)


def doc_lines(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text",
              delim: str = DEFAULT_DELIM) -> DataFrame:
    """(_id, line_no, line, h): one row per non-blank line, with its
    0-based position among the doc's non-blank lines and its normalized
    hash.  Blank/whitespace-only lines are dropped on BOTH the stats and
    the rebuild path (CCNet discards them), which keeps ``line_no``
    dense and the rebuild's join(delim) well-defined."""
    lines = (
        df.select(F.col(id_col).alias("_id"),
                  F.split(F.col(text_col), delim).alias("_ls"))
        .select("_id", F.posexplode(
            F.filter("_ls", lambda x: F.trim(x) != F.lit(""))
        ).alias("line_no", "line"))
    )
    return lines.withColumn("h", line_hash(F.col("line")))


def frequent_lines(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 2,
                   delim: str = DEFAULT_DELIM) -> DataFrame:
    """The boilerplate table: (h, line, df_docs, n_occurrences) for every
    normalized line occurring in >= min_df distinct documents.

    ``line`` is the lexicographically-smallest raw witness (min() — a
    deterministic representative, since raw lines under one hash differ
    only in case/whitespace).  df_docs counts distinct docs; a line
    repeated inside ONE page is self-repetition (ext.text
    repetition_scores' domain), not cross-page boilerplate, and does not
    reach min_df on its own."""
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    ls = doc_lines(df, id_col, text_col, delim)
    per_doc = (ls.groupBy("h", "_id")
               .agg(F.count("*").alias("_occ"), F.min("line").alias("_wl")))
    return (
        per_doc.groupBy("h")
        .agg(F.min("_wl").alias("line"),
             F.count("*").alias("df_docs"),
             F.sum("_occ").alias("n_occurrences"))
        .where(F.col("df_docs") >= min_df)
    )


def strip_frequent_lines(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", min_df: int = 2,
                         delim: str = DEFAULT_DELIM,
                         join_sep: str = "\n") -> DataFrame:
    """Corpus rewrite: drop every line whose normalized hash occurs in
    >= min_df distinct documents; keep original line order.

    Returns the input schema with ``text`` rebuilt plus
    (n_lines, n_lines_kept).  Docs whose every line was boilerplate stay
    in the output with empty text and n_lines_kept = 0 — dropping whole
    documents is doc-level dedup's decision (compose with ext.dedup /
    ext.mix downstream), not a side effect of line cleanup.  Blank lines
    are dropped unconditionally (see doc_lines).

    Plan: count shuffle on h (partial-agg), hash-join back on h
    (exchange reused), one doc_id shuffle for the rebuild, left join to
    re-attach untouched passthrough columns.
    """
    if min_df < 2:
        # r15 review: every line occurs in >= 1 document (its own), so
        # min_df=1 keeps every hash in the frequent set and the
        # left_anti rewrite empties EVERY document — the same total loss
        # the old >= 1 guard claimed only min_df=0 could cause
        raise ValueError(
            "min_df must be >= 2 (every line occurs in >= 1 document — "
            "its own — so min_df <= 1 would drop every line)")
    ls = doc_lines(df, id_col, text_col, delim)
    freq = (ls.groupBy("h", "_id").count()
            .groupBy("h").agg(F.count("*").alias("df_docs"))
            .where(F.col("df_docs") >= min_df)
            .select("h"))
    kept = ls.join(freq, "h", "left_anti")
    rebuilt = (
        ls.groupBy("_id").agg(F.count("*").alias("n_lines"))
        .join(
            kept.groupBy("_id").agg(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(
                            F.struct("line_no", "line"))),
                        lambda s: s["line"]),
                    join_sep).alias("_new_text"),
                F.count("*").alias("n_lines_kept")),
            "_id", "left")
    )
    passthrough = [c for c in df.columns if c != text_col]
    return (
        df.join(rebuilt.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            *passthrough,
            F.coalesce(F.col("_new_text"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            F.coalesce(F.col("n_lines_kept"), F.lit(0))
            .alias("n_lines_kept"),
        )
    )
