"""Sequence packing: concat-and-chunk documents into fixed-token bins.

The standard pretraining data layout — documents are concatenated in a
deterministic global order and sliced every ``max_tokens`` — needs one
global running token offset per document.  A bare
``Window.orderBy(...)`` (no partition) computes that on ONE task — the
classic Spark scale trap.  This module does the distributed version:

1. range-shard by id (driver holds only the n_shards-1 quantile bounds),
2. per-shard window cumsum (parallel, one shuffle),
3. driver-side prefix over the n_shards per-shard totals (tiny),
4. global offset = shard prefix + in-shard cumsum.

Driver state is O(n_shards) numbers — the same "codebook-sized by
construction" budget as the IVF centroids.  Everything row-scaled stays
distributed and JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens


def pack_sequences(docs: DataFrame, max_tokens: int,
                   id_col: str = "doc_id", text_col: str = "text",
                   tokens_col: str | None = None,
                   n_shards: int = 32) -> DataFrame:
    """Assign every document its packed position under concat-and-chunk.

    Documents are ordered by ``id_col`` (deterministic — retries, resumes
    and the pure-Python oracle in tests all see the same layout),
    concatenated, and chunked every ``max_tokens``.  Returns one row per
    document: (id, n_tokens, start_offset, first_bin, last_bin) where
    bins are the ``max_tokens``-sized chunks the doc's tokens land in —
    a doc straddling a boundary spans multiple bins, exactly like the
    pretraining loader that will re-slice the stream.

    ``tokens_col`` uses a precomputed token count; otherwise whitespace
    tokens of ``text_col`` are counted.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if tokens_col is not None:
        d = docs.select(F.col(id_col).alias("_id"),
                        F.col(tokens_col).cast("long").alias("_tok"))
    else:
        d = docs.select(F.col(id_col).alias("_id"),
                        F.size(tokens(F.col(text_col))).cast("long")
                        .alias("_tok"))

    # 1. range shards: quantile bounds are the only driver-held structure
    #    (n_shards-1 doubles).  Shard boundaries respect id order, so
    #    shard index is monotone in id — required for a valid prefix.
    qs = [i / n_shards for i in range(1, n_shards)]
    bounds = d.approxQuantile("_id", qs, 0.001) if n_shards > 1 else []
    bounds = sorted(set(bounds))
    if bounds:
        blit = F.array(*[F.lit(float(b)) for b in bounds])
        shard = F.size(F.filter(blit, lambda b: F.col("_id").cast("double") > b))
    else:
        shard = F.lit(0)
    d = d.withColumn("_shard", shard)

    # 2. per-shard running totals (parallel window, one shuffle)
    w = (Window.partitionBy("_shard").orderBy("_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = d.withColumn("_cum", F.sum("_tok").over(w))

    # 3. tiny driver prefix over shard totals
    totals = {r["_shard"]: r["_t"] for r in
              d.groupBy("_shard").agg(F.sum("_tok").alias("_t")).collect()}
    prefix, acc = {}, 0
    for s in range(len(bounds) + 1):
        prefix[s] = acc
        acc += totals.get(s, 0)
    pexpr = F.element_at(
        F.array(*[F.lit(int(prefix[s])) for s in range(len(bounds) + 1)]),
        F.col("_shard") + 1)

    # 4. global offsets → bin span
    start = (pexpr + F.col("_cum") - F.col("_tok")).alias("start_offset")
    out = d.select(
        F.col("_id").alias(id_col),
        F.col("_tok").alias("n_tokens"),
        start,
    )
    return out.select(
        id_col, "n_tokens", "start_offset",
        F.floor(F.col("start_offset") / max_tokens).alias("first_bin"),
        F.floor((F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1))
                 - 1) / max_tokens).alias("last_bin"),
    )
