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


def _token_count(text_col: str, tokens_col: str | None):
    """Per-doc token count as a LONG named ``_tok``; NULL for a NULL
    text/count (r15 review).  ``nullif(-1)`` makes the NULL portable:
    under ANSI (Spark 4 default) ``size(NULL)`` is already NULL, but
    with ``spark.sql.legacy.sizeOfNull`` it is -1 — which would silently
    DECREMENT pack offsets and bin fills instead of poisoning the row."""
    if tokens_col is not None:
        return F.col(tokens_col).cast("long").alias("_tok")
    return F.nullif(F.size(tokens(F.col(text_col))).cast("long"),
                    F.lit(-1)).alias("_tok")


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
    tokens of ``text_col`` are counted.  A NULL text/count poisons only
    its own row (NULL n_tokens/offset/bins — window and total sums skip
    NULLs, so every other document's layout is unaffected).
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    d = docs.select(F.col(id_col).alias("_id"),
                    _token_count(text_col, tokens_col))

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
        # `or 0`: a shard holding only NULL-token rows sums to NULL
        acc += totals.get(s) or 0
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


BIN_SCHEMA = ("doc_id LONG, n_tokens LONG, shard INT, bin LONG, "
              "oversize BOOLEAN")


def pack_bins_ffd(docs: DataFrame, max_tokens: int,
                  id_col: str = "doc_id", text_col: str = "text",
                  tokens_col: str | None = None,
                  n_shards: int = 32) -> DataFrame:
    """No-split packing: assign whole documents to fixed-capacity bins
    by first-fit-decreasing — the SFT/instruction-tuning layout where a
    document must never straddle a bin boundary (contrast
    ``pack_sequences``, which slices the concatenated stream).

    Returns (id, n_tokens, shard, bin, oversize): ``bin`` is globally
    unique (shard-offset), Σ n_tokens per bin <= max_tokens; a doc
    LONGER than max_tokens gets its own bin flagged ``oversize=True``
    (truncation is the caller's policy decision, not the packer's).

    Distribution strategy: docs hash-shard by md5(id) (uniform,
    deterministic, oracle-replayable), each shard runs exact FFD over
    its own docs (tokens desc, id asc — fully deterministic), bin ids
    offset by shard.  FFD is inherently sequential, so the sequential
    unit is the SHARD, sized corpus/n_shards: the Python stage sees
    only (id, n_tokens) pairs via applyInPandas — text never crosses.
    Waste bound: FFD <= 11/9·OPT + 6/9 bins per shard, and sharding
    adds at most one partially-filled bin's slack per shard — at
    corpus scale the overhead is n_shards partial bins against millions,
    noise.  A length-sorted global FFD would pack marginally tighter
    but needs a global sort + sequential scan: the wrong trade at
    100 TB.

    Parity: tests/test_ext.py::test_pack_bins_ffd_vs_python pins exact
    equality against a per-shard pure-Python FFD, plus capacity/
    determinism/oversize invariants.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from .text import md5_int32

    d = docs.select(F.col(id_col).alias("_id"),
                    _token_count(text_col, tokens_col))
    d = d.withColumn(
        "_shard",
        (md5_int32(F.col("_id").cast("string")) % n_shards).cast("int"))
    # a NULL token count cannot be packed (r15 review: it reached the
    # pandas stage as NaN and int(NaN) killed the whole task — the
    # poisoned-row-never-kills-the-scan contract).  Route such rows
    # around the FFD with NULL bin/oversize; they occupy no capacity.
    d_null = d.where(F.col("_tok").isNull())
    d = d.where(F.col("_tok").isNotNull())

    cap = int(max_tokens)
    shards = int(n_shards)

    def ffd(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["_tok", "_id"],
                              ascending=[False, True])
        shard = int(pdf["_shard"].iloc[0]) if len(pdf) else 0
        fills: list[int] = []   # current fill per local bin
        out_bin, out_over = [], []
        for tok in pdf["_tok"]:
            t = int(tok)
            if t > cap:
                # cap+1 so a later zero-token doc's first-fit scan
                # (f + 0 <= cap) can never land in an oversize bin
                fills.append(cap + 1)       # own bin, never reused
                out_bin.append(len(fills) - 1)
                out_over.append(True)
                continue
            for i, f in enumerate(fills):   # first fit
                if f + t <= cap:
                    fills[i] = f + t
                    out_bin.append(i)
                    break
            else:
                fills.append(t)
                out_bin.append(len(fills) - 1)
            out_over.append(False)
        return pd.DataFrame({
            "doc_id": pdf["_id"].astype("int64"),
            "n_tokens": pdf["_tok"].astype("int64"),
            "shard": shard,
            # globally unique: local bin * n_shards + shard
            "bin": [b * shards + shard for b in out_bin],
            "oversize": out_over,
        })

    packed = d.groupBy("_shard").applyInPandas(ffd, BIN_SCHEMA)
    unpackable = d_null.select(
        F.col("_id").alias("doc_id"),
        F.lit(None).cast("long").alias("n_tokens"),
        F.col("_shard").alias("shard"),
        F.lit(None).cast("long").alias("bin"),
        F.lit(None).cast("boolean").alias("oversize"))
    return (packed.unionByName(unpackable)
            .withColumnRenamed("doc_id", id_col))
