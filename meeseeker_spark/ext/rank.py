"""BM25 ranked retrieval over the corpus (SURVEY §2 F4 extension,
driver north star): the lexical half of retrieval-based data selection —
"give me the training documents most relevant to this target query" —
complementing the embedding-side kNN (ext.similarity) and DSIR's
distributional matching (ext.dsir).  Scoring is Okapi BM25 in the
Lucene idf form (always-positive):

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    s(d, t) = idf(t) · tf · (k1+1) / (tf + k1·(1 - b + b·|d|/avgdl))

Scale shape (the 100 TB story):

- ONE corpus pass: the tokenized doc is projected once, its length
  taken there, and only QUERY-TERM occurrences survive the explode —
  the (doc, term, tf, dl) stream the aggregate shuffles is bounded by
  the posting mass of the query's terms, not the corpus token count;
- per-term document frequencies aggregate from that same stream
  (|query| rows) and come back as a broadcast join; N and avgdl are
  in-plan scalar aggregates (1-row broadcast), never driver actions;
- the final top-k is an order-by-limit the optimizer plans as
  TakeOrderedAndProject — per-partition heaps, no global sort.

Every operation is ln/arithmetic over exact integer counts, so the
DuckDB oracle reproduces scores to the 4-dp rounding
(tests/test_ext.py::test_bm25_topk_vs_duckdb); ties order by doc id so
the top-k SET is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-k documents by BM25 relevance to ``query_terms``
    (lowercased, matched against the standard tokenizer's output).

    Returns (id_col, n_hits, bm25) — distinct matched terms and the
    4-dp score — ordered by (bm25 desc, id asc), limited to k.  Only
    documents matching at least one term can appear (BM25 of a
    no-match doc is 0 and unranked)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    terms = sorted({t.lower() for t in query_terms})
    lit_terms = F.array(*[F.lit(t) for t in terms])

    toked = df.select(F.col(id_col).alias("_id"),
                      tokens(F.col(text_col)).alias("_w"))
    # corpus stats as an in-plan 1-row broadcast (never a driver action)
    stats = toked.agg(
        F.count("*").alias("_n_docs"),
        # nullif(-1): a NULL-text doc must not drag avgdl negative under
        # legacy sizeOfNull configs (ANSI already yields NULL, which avg
        # skips — same value both ways; r15 review)
        F.avg(F.nullif(F.size("_w"), F.lit(-1))).alias("_avgdl"))
    # only query-term occurrences survive into the shuffle; dl rides along
    hits = (
        toked.select(
            "_id", F.size("_w").alias("_dl"),
            F.explode(F.filter(
                "_w", lambda t: F.array_contains(lit_terms, t)))
            .alias("_t"))
        .groupBy("_id", "_t")
        .agg(F.count("*").alias("_tf"), F.max("_dl").alias("_dl"))
    )
    dfreq = hits.groupBy("_t").agg(F.count("*").alias("_df"))
    scored = (
        hits.join(F.broadcast(dfreq), "_t")
        .join(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log((F.col("_n_docs") - F.col("_df") + 0.5)
                  / (F.col("_df") + 0.5) + 1.0))
        .withColumn(
            "_s",
            F.col("_idf") * F.col("_tf") * (k1 + 1)
            / (F.col("_tf")
               + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))))
        .groupBy("_id")
        .agg(F.count("*").alias("n_hits"),
             F.round(F.sum("_s"), 4).alias("bm25"))
    )
    return (
        scored.select(F.col("_id").alias(id_col), "n_hits", "bm25")
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_batch_topk(df: DataFrame, queries: DataFrame, k: int = 10,
                    k1: float = 1.2, b: float = 0.75,
                    id_col: str = "doc_id", text_col: str = "text",
                    q_id_col: str = "q_id",
                    q_terms_col: str = "terms") -> DataFrame:
    """Batched BM25: top-k documents for EVERY query in ``queries``
    (q_id, terms array) — the retrieval-at-scale shape (N queries ×
    corpus in one job, like ext.similarity's batched knn).

    Returns (q_id_col, id_col, n_hits, bm25, rk) with rk 1..k per
    query, ordered within each query by (bm25 desc, id asc).

    Scale shape: the UNION of all query terms is a broadcast semi-join
    against the exploded corpus tokens, so the corpus is tokenized and
    scanned ONCE regardless of query count; per-(doc, term) tfs then
    fan out to queries through a second broadcast join (query lists are
    KBs), and per-query top-k is a rank window the optimizer bounds
    with WindowGroupLimit — per-partition heaps per query, no global
    sort.  idf/df/avgdl math matches ``bm25_topk`` exactly."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    qt = (queries.select(F.col(q_id_col).alias("_q"),
                         F.explode(q_terms_col).alias("_raw"))
          .select("_q", F.lower(F.col("_raw")).alias("_t"))
          .distinct())
    vocab = qt.select("_t").distinct()

    toked = df.select(F.col(id_col).alias("_id"),
                      tokens(F.col(text_col)).alias("_w"))
    stats = toked.agg(
        F.count("*").alias("_n_docs"),
        # nullif(-1): a NULL-text doc must not drag avgdl negative under
        # legacy sizeOfNull configs (ANSI already yields NULL, which avg
        # skips — same value both ways; r15 review)
        F.avg(F.nullif(F.size("_w"), F.lit(-1))).alias("_avgdl"))
    hits = (
        toked.select("_id", F.size("_w").alias("_dl"),
                     F.explode("_w").alias("_t"))
        .join(F.broadcast(vocab), "_t")
        .groupBy("_id", "_t")
        .agg(F.count("*").alias("_tf"), F.max("_dl").alias("_dl"))
    )
    dfreq = hits.groupBy("_t").agg(F.count("*").alias("_df"))
    scored = (
        hits.join(F.broadcast(dfreq), "_t")
        .join(F.broadcast(qt), "_t")            # fan out to queries
        .join(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log((F.col("_n_docs") - F.col("_df") + 0.5)
                  / (F.col("_df") + 0.5) + 1.0))
        .withColumn(
            "_s",
            F.col("_idf") * F.col("_tf") * (k1 + 1)
            / (F.col("_tf")
               + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))))
        .groupBy("_q", "_id")
        .agg(F.count("*").alias("n_hits"),
             F.round(F.sum("_s"), 4).alias("bm25"))
    )
    w = Window.partitionBy("_q").orderBy(F.col("bm25").desc(),
                                         F.col("_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col("_q").alias(q_id_col), F.col("_id").alias(id_col),
                "n_hits", "bm25", "rk")
    )
