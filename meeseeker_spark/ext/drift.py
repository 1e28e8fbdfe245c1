"""Token-distribution drift monitoring (training-data pipeline
extension, ops/quality family): "does this batch look like the corpus
it is joining?" — the data-quality gate a continuous-ingest pipeline
runs beside the dedup screen.  A recrawl that silently switched
language, a scraper that started emitting boilerplate, or an upstream
filter change all show up as unigram-distribution drift long before
they show up in spot checks.

Statistic: smoothed KL divergence KL(batch ‖ baseline) over the UNION
vocabulary, with add-a smoothing on both sides so novel tokens (the
interesting case — P>0, Q≈0) contribute large finite terms instead of
infinities:

    P(t) = (c_b(t)+a) / (N_b+a·V),  Q(t) = (c_q(t)+a) / (N_q+a·V)
    KL   = Σ_t P(t) · ln(P(t)/Q(t))        (V = |union vocab|)

``drift_report`` returns the top-k tokens by |contribution| — the
actionable view: WHICH tokens moved, not just that something did.
``drift_summary`` returns the one-row total.

Scale shape: two vocabulary-sized count aggregates with map-side
partials (never corpus-sized shuffles), one full-outer join on token
(union vocab), scalar totals attached via a 1-row broadcast crossJoin,
top-k planned as TakeOrderedAndProject.  Per micro-batch the baseline
table can be precomputed once and reused; the batch side is
batch-sized.  ln is libm ⇒ machine-dependent: the catalog entry is
rows-only (r9 hash rule) with exact local DuckDB parity in
tests/test_ext.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n) unigram counts — the baseline/batch input tables.
    Token stream shared with ext.heavy so "the token stream" has one
    definition across the drift and heavy-hitter surfaces."""
    from .heavy import token_stream

    return (token_stream(docs, text_col)
            .groupBy("token").agg(F.count("*").alias("n")))


def _joined(batch_counts: DataFrame, base_counts: DataFrame,
            smoothing: float) -> DataFrame:
    """Union-vocab join with smoothed P/Q columns attached."""
    if smoothing <= 0:
        # r15 review: smoothing=0 turns exactly the novel-token terms
        # this module exists to surface (q≈0) into NULL log/division
        # results that sum() silently DROPS — a quietly truncated KL,
        # not an error.  The additive smoothing is what makes every
        # term finite; loud beats truncated.
        raise ValueError("smoothing must be positive")
    both = (batch_counts.withColumnRenamed("n", "n_batch")
            .join(base_counts.withColumnRenamed("n", "n_base"),
                  "token", "full_outer")
            .select("token",
                    F.coalesce("n_batch", F.lit(0)).alias("n_batch"),
                    F.coalesce("n_base", F.lit(0)).alias("n_base")))
    totals = both.agg(
        F.sum("n_batch").cast("double").alias("_nb"),
        F.sum("n_base").cast("double").alias("_nq"),
        F.count("*").cast("double").alias("_v"))
    a = F.lit(smoothing)
    p = (F.col("n_batch") + a) / (F.col("_nb") + a * F.col("_v"))
    q = (F.col("n_base") + a) / (F.col("_nq") + a * F.col("_v"))
    return (both.crossJoin(F.broadcast(totals))
            .withColumn("_contrib", p * F.log(p / q)))


def drift_report(batch: DataFrame, baseline: DataFrame, k: int = 20,
                 smoothing: float = 0.5, text_col: str = "text",
                 round_dp: int = 4) -> DataFrame:
    """Top-k drift contributors: (token, n_batch, n_base, kl_contrib),
    ordered by (|contribution| desc, token) — positive contribution =
    over-represented in the batch, negative = the batch lost mass the
    baseline carries.  ``baseline`` may be a docs DataFrame or a
    precomputed (token, n) table (reuse it across micro-batches)."""
    bc = token_counts(batch, text_col)
    qc = (baseline if set(baseline.columns) == {"token", "n"}
          else token_counts(baseline, text_col))
    j = _joined(bc, qc, smoothing)
    contrib = F.round(F.col("_contrib"), round_dp)
    return (j.select("token", "n_batch", "n_base",
                     contrib.alias("kl_contrib"))
            .orderBy(F.abs(F.col("kl_contrib")).desc(), "token")
            .limit(k))


def drift_summary(batch: DataFrame, baseline: DataFrame,
                  smoothing: float = 0.5, text_col: str = "text",
                  round_dp: int = 4) -> DataFrame:
    """One row: (kl_divergence, n_batch_tokens, n_base_tokens,
    union_vocab) — the scalar to threshold/alert on per batch."""
    bc = token_counts(batch, text_col)
    qc = (baseline if set(baseline.columns) == {"token", "n"}
          else token_counts(baseline, text_col))
    j = _joined(bc, qc, smoothing)
    return j.agg(
        F.round(F.sum("_contrib"), round_dp).alias("kl_divergence"),
        F.sum("n_batch").alias("n_batch_tokens"),
        F.sum("n_base").alias("n_base_tokens"),
        F.count("*").alias("union_vocab"))
