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
    anywhere in ``bench``, the fraction, and the ≥1-hit flag.  Documents
    with zero hits are kept (left join) — the output is a full screening
    report, not just the contaminated subset.
    """
    corpus = shingle_df(docs, id_col, text_col, n)
    bench_grams = (
        shingle_df(bench, id_col, text_col, n)
        .select(F.explode("_sh").alias("_g")).distinct()
    )
    hits = (
        corpus.select("_id", F.explode("_sh").alias("_g"))
        .join(F.broadcast(bench_grams), "_g")
        .groupBy("_id").agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select("_id", F.size("_sh").cast("bigint").alias("n_grams"))
        .join(hits, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint")
            .alias("n_hits"),
            F.round(F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.col("n_grams"), 4).alias("overlap_frac"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(docs: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13, max_overlap: float = 0.0) -> DataFrame:
    """Drop documents whose benchmark overlap exceeds ``max_overlap``
    (0.0 = any shared n-gram disqualifies — the conservative default).
    Anti-join on the flagged id set; docs pass through otherwise
    untouched."""
    flagged = (
        contamination(docs, bench, id_col, text_col, n)
        .where(F.col("overlap_frac") > max_overlap)
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")
