"""Distributed BPE vocabulary induction (training-data pipeline
extension, same family as SURVEY §2 F — no reference counterpart).

Byte-pair-encoding training is the step that turns a corpus into a
tokenizer: repeatedly merge the most frequent adjacent symbol pair.
The scale insight is that after ONE corpus-sized aggregation (word →
frequency), every training iteration runs on the *word-frequency
table*, whose size is the distinct vocabulary — roughly fixed no matter
how many TB of text produced it.  Per iteration:

    words(symbols[], freq)
      → explode adjacent symbol pairs, weighted by freq   (narrow)
      → one partial-combined count aggregate              (∝ distinct pairs)
      → argmax pair to the driver                         (ONE row)
      → left-to-right merge rewrite of the symbol arrays  (narrow HOF)

Driver state is the merge list itself — the tokenizer artifact, same
"codebook-sized by construction" budget as the IVF centroids.
``localCheckpoint`` truncates the per-iteration lineage (the same idiom
as connected_components).  Ties break deterministically (count desc,
then lexicographic pair) so retries and the pure-Python oracle in tests
reproduce the identical merge sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the ONLY corpus-sized aggregation in BPE training."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word").agg(F.count("*").alias("freq"))
    )


def _split_chars(word: Column) -> Column:
    return F.filter(F.split(word, ""), lambda c: c != F.lit(""))


def _adjacent_pairs(sym: Column) -> Column:
    n = F.size(sym)
    return F.zip_with(
        F.slice(sym, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(sym, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _merge_once(sym: Column, a: str, b: str) -> Column:
    """Left-to-right BPE merge of pair (a, b) inside a symbol array:
    fold symbols into an accumulator; when the last accumulated symbol
    is ``a`` and the incoming one is ``b``, replace the tail with the
    concatenated symbol.  The merged token then continues the scan, so
    'aaa' + (a,a) → [aa, a] — the reference BPE behavior."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _merger(a: str, b: str):
    """Single-arg lambda factory — a multi-parameter lambda (even via
    the ``a=a`` defaults idiom) would make F.transform bind the array
    index to the extra parameter (the session-lambda-counter trap
    documented in ext.dedup.minhash_signatures)."""
    return lambda s: _merge_once(s, a, b)


def train_bpe(docs: DataFrame, n_merges: int = 32,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    application order as (left, right) symbol pairs."""
    words = word_freq_table(docs, text_col).select(
        _split_chars(F.col("word")).alias("sym"), "freq")
    words = words.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            words.select(F.explode(_adjacent_pairs(F.col("sym"))).alias("p"),
                         "freq")
            .groupBy("p").agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p.a"), F.col("p.b"))
            .first()
        )
        if top is None or top["c"] <= 0:
            break
        a, b = top["p"]["a"], top["p"]["b"]
        merges.append((a, b))
        words = words.select(
            _merge_once(F.col("sym"), a, b).alias("sym"), "freq"
        ).localCheckpoint()
    return merges


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]],
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Tokenize with a learned merge list: per word, apply the merges in
    training order (each is one narrow HOF pass; the merge count — not
    the corpus — bounds the plan depth).  Returns (id, tokens)."""
    sym_words = docs.select(
        F.col(id_col),
        F.transform(tokens(F.col(text_col)),
                    lambda w: _split_chars(w)).alias("_sw"))
    col = F.col("_sw")
    for a, b in merges:
        col = F.transform(col, _merger(a, b))
    return sym_words.select(id_col, F.flatten(col).alias("tokens"))
