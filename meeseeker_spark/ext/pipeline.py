"""End-to-end training-corpus preparation: the extension operators
composed in the order a real pretraining data pipeline runs them.

    raw docs
      → exact dedup            (hash-groupBy, controlled survivor)
      → near-dup dedup         (MinHash/LSH cluster survivors)
      → line strip [opt-in]    (CCNet boilerplate-line removal, ext.lines)
      → span strip [opt-in]    (ExactSubstr passage rewrite, ext.spans)
      → source cap [opt-in]    (zero-shuffle per-source dominance guard)
      → benchmark decontamination (broadcast n-gram screen)
      → quality filter         (composite score ≥ floor)
      → blocklist [opt-in]     (C4 word blocklist, narrow literal-array)
      → Gopher rules [opt-in]  (MassiveText rule battery, narrow)
      → repetition [opt-in]    (Gopher n-gram char-mass battery,
                                Table A1 threshold values on an
                                upward-biased mass statistic)
      → perplexity keep [opt-in] (CCNet head/middle/tail bucket screen)
      → classifier keep [opt-in] (distilled linear model, narrow scoring)
      → DSIR select [opt-in]   (importance resampling toward a target corpus)
      → PII redaction          (chained regexp, narrow)
      → mixture sampling       (target domain weights, multi-epoch)
      → sequence packing       (distributed prefix-sum layout)

Every stage is one of the individually-tested operators; this module
only sequences them, so the composition inherits their scale shapes
(the only driver-held state anywhere is the pack stage's O(n_shards)
quantile bounds).  The stage report makes the funnel auditable — the
first question asked of any corpus build is "where did the rows go?".
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from .decontam import decontaminate
from .dedup import cc_dedup, exact_dedup
from .mix import mixture_sample
from .pack import pack_sequences
from .pii import redact_pii_tags
from .text import quality_scores


@dataclass
class CorpusBuild:
    """Result of prepare_training_corpus: the packed corpus plus
    per-stage DataFrames whose counts report() computes on demand.
    Building a CorpusBuild is NOT free: the near-dup stage's connected-
    components loop and the pack stage's quantile probe execute jobs at
    construction time (both bounded — see their docstrings); the other
    stages stay lazy until consumed."""
    corpus: DataFrame                     # redacted, mixed rows + copy
    packed: DataFrame                     # (doc_id, copy) → bin layout
    stages: dict[str, DataFrame] = field(default_factory=dict)

    def report(self) -> dict[str, int]:
        return {name: df.count() for name, df in self.stages.items()}


def prepare_training_corpus(docs: DataFrame, bench: DataFrame,
                            weights: dict[str, float],
                            budget: int | None = None,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            domain_col: str = "lang",
                            near_dup_threshold: float = 0.5,
                            line_df: int | None = None,
                            span_ngram: int | None = None,
                            decontam_ngram: int = 13,
                            decontam_max_overlap: float = 0.0,
                            quality_floor: float = 0.25,
                            blocklist: list[str] | None = None,
                            blocklist_max_frac: float = 0.0,
                            source_cap: int | None = None,
                            source_col: str = "source",
                            gopher: bool = False,
                            repetition: bool = False,
                            ppl_keep: tuple[str, ...] | None = None,
                            logit_threshold: float | None = None,
                            dsir_target: DataFrame | None = None,
                            dsir_k: int | None = None,
                            max_tokens: int = 2048,
                            pack_mode: str = "chunk",
                            temperature: float | None = None,
                            doremi_eta: float | None = None) -> CorpusBuild:
    """Run the full preparation funnel; see module docstring for the
    stage order and scale rationale.  ``bench`` is the evaluation text
    to decontaminate against; ``weights`` the target domain mixture.

    ``decontam_max_overlap=0.0`` (any shared n-gram disqualifies) is the
    conservative production default for 13-grams — at short n-grams or
    over narrow-vocabulary corpora it can reject nearly everything, so
    pair a small ``decontam_ngram`` with a nonzero tolerance.

    ``line_df`` (opt-in) inserts CCNet boilerplate-line removal after
    doc-level dedup: lines shared by >= line_df surviving documents are
    stripped everywhere (ext.lines.strip_frequent_lines); n_chars is
    refreshed so downstream budgets see post-strip sizes.  Docs reduced
    to empty text flow on — the quality floor screens them out.

    ``span_ngram`` (opt-in) inserts the Lee-et-al. exact-substring
    rewrite between doc-level dedup and decontamination: passages
    duplicated across the SURVIVING documents are stripped down to their
    globally first occurrence (ext.spans.strip_repeated_spans,
    max_df=10_000 guard).  Row counts are unchanged — text shrinks —
    and n_chars is refreshed so the mixture stage budgets against the
    post-strip sizes.

    ``source_cap`` (opt-in) bounds any one source's document count with
    the zero-shuffle hash cap (ext.mix.domain_cap_hash — approximate by
    design; the funnel's caps are dominance guards, not quotas).
    ``ppl_keep`` (opt-in, e.g. ``("head", "middle")``) keeps only the
    named CCNet perplexity buckets (ext.lm.perplexity_buckets over the
    post-decontamination survivors).  ``logit_threshold`` (opt-in) adds
    the distilled linear classifier's keep decision at the given
    probability cut (ext.classifier.quality_logit_scores) — a second,
    model-based opinion alongside the rules-based floor.
    ``blocklist`` (opt-in) applies the C4 blocklist screen after the
    composite floor (ext.text.blocklist_screen; ``blocklist_max_frac``
    0.0 = C4's any-hit-drops policy).
    ``gopher=True`` (opt-in) applies the Gopher/MassiveText rule
    battery (ext.text.gopher_rules, default thresholds) after the
    composite floor.
    ``temperature`` (opt-in) replaces the hand-written ``weights`` with
    mT5-style temperature sampling (ext.mix.temperature_sample,
    p ∝ size^(1/T)); ``weights`` is ignored when set.
    ``doremi_eta`` (opt-in, takes precedence over both) learns the
    weights from the post-screen corpus itself via one DoReMi-style
    multiplicative-weights step on bigram-LM excess loss
    (ext.mix.doremi_sample) — hard domains up-weight, boilerplate
    bleeds weight.
    ``pack_mode`` selects the packed layout: ``"chunk"`` (default) is
    concat-and-chunk pretraining packing (ext.pack.pack_sequences);
    ``"ffd"`` is no-split first-fit-decreasing bin packing — the SFT
    layout (ext.pack.pack_bins_ffd; oversize docs flagged, never
    silently truncated).
    ``dsir_target`` + ``dsir_k`` (opt-in, both required together) apply
    DSIR importance resampling after all screens: keep the ``dsir_k``
    surviving documents whose hashed-n-gram profile best matches the
    target corpus (ext.dsir.dsir_select, deterministic Gumbel top-k)."""
    stages: dict[str, DataFrame] = {"raw": docs}

    d1 = exact_dedup(docs, [text_col], id_col)
    stages["exact_dedup"] = d1

    d2 = cc_dedup(d1, id_col, text_col, near_dup_threshold)
    stages["near_dedup"] = d2

    if line_df is not None:
        from .lines import strip_frequent_lines
        d2 = strip_frequent_lines(d2, id_col, text_col,
                                  min_df=line_df).drop(
            "n_lines", "n_lines_kept")
        if "n_chars" in d2.columns:
            d2 = d2.withColumn("n_chars", F.length(text_col).cast(
                dict(d2.dtypes)["n_chars"]))
        stages["line_stripped"] = d2

    if span_ngram is not None:
        from .spans import strip_repeated_spans
        stripped = strip_repeated_spans(d2, id_col, text_col,
                                        n=span_ngram, max_df=10_000)
        d2 = stripped.withColumn(text_col, F.col("clean_text")).drop(
            "clean_text", "n_removed_words", "n_spans_removed")
        if "n_chars" in d2.columns:
            d2 = d2.withColumn("n_chars", F.length(text_col).cast(
                dict(d2.dtypes)["n_chars"]))
        stages["span_stripped"] = d2

    if source_cap is not None:
        if source_col not in d2.columns:
            raise ValueError(
                f"source_cap={source_cap} set but column {source_col!r} "
                f"is not in the corpus (have: {d2.columns}) — the cap "
                "would silently no-op")
        from .mix import domain_cap_hash
        d2 = domain_cap_hash(d2, source_cap, domain_col=source_col,
                             id_col=id_col)
        stages["source_capped"] = d2

    # lazy lineage truncation: everything downstream (quality, redact,
    # mixture, pack, and each report() count) reuses the screened rows
    # instead of re-running dedup+decontam per consumer — the in-process
    # stand-in for the between-stage checkpoint a production run writes
    d3 = decontaminate(d2, bench, id_col, text_col, n=decontam_ngram,
                       max_overlap=decontam_max_overlap)
    d3 = d3.localCheckpoint(eager=False)
    stages["decontaminated"] = d3

    q = quality_scores(d3, id_col, text_col).where(
        F.col("quality") >= quality_floor).select(id_col)
    d4 = d3.join(q, id_col)
    stages["quality_filtered"] = d4

    if blocklist:
        from .text import blocklist_screen
        keep_ids = blocklist_screen(
            d4, blocklist, id_col, text_col,
            max_frac=blocklist_max_frac).where("keep").select(id_col)
        d4 = d4.join(keep_ids, id_col)
        stages["blocklist_kept"] = d4

    if gopher:
        from .text import gopher_rules
        keep_ids = gopher_rules(d4, id_col, text_col).where(
            "keep").select(id_col)
        d4 = d4.join(keep_ids, id_col)
        stages["gopher_kept"] = d4

    if repetition:
        # the Gopher Table A1 threshold VALUES — top 2/3/4-gram mass
        # <= .20/.18/.16, duplicated 5..10-gram mass <=
        # .15/.14/.13/.12/.11/.10 — applied to ngram_repetition's
        # UPWARD-BIASED mass statistic (overlapping occurrences' chars
        # count multiply; see its docstring), so this screen rejects
        # somewhat more aggressively than the paper's char-coverage
        # operating point
        from .text import ngram_repetition
        rep = ngram_repetition(d4, id_col, text_col)
        bars = {"top_2gram_char_frac": 0.20, "top_3gram_char_frac": 0.18,
                "top_4gram_char_frac": 0.16, "dup_5gram_char_frac": 0.15,
                "dup_6gram_char_frac": 0.14, "dup_7gram_char_frac": 0.13,
                "dup_8gram_char_frac": 0.12, "dup_9gram_char_frac": 0.11,
                "dup_10gram_char_frac": 0.10}
        cond = F.lit(True)
        for c, bar in bars.items():
            cond = cond & (F.col(c) <= bar)
        d4 = d4.join(rep.where(cond).select(id_col), id_col)
        stages["repetition_kept"] = d4

    if ppl_keep is not None:
        from .lm import perplexity_buckets
        keep_ids = perplexity_buckets(d4, id_col=id_col,
                                      text_col=text_col).where(
            F.col("ppl_bucket").isin(*ppl_keep)).select(id_col)
        d4 = d4.join(keep_ids, id_col)
        stages["ppl_kept"] = d4

    if logit_threshold is not None:
        from .classifier import quality_logit_scores
        keep_ids = quality_logit_scores(
            d4, id_col=id_col, text_col=text_col,
            threshold=logit_threshold).where("keep").select(id_col)
        d4 = d4.join(keep_ids, id_col)
        stages["logit_kept"] = d4

    if dsir_target is not None and dsir_k is not None:
        from .dsir import dsir_select
        keep_ids = dsir_select(d4, dsir_target, dsir_k, id_col=id_col,
                               text_col=text_col).select(id_col)
        d4 = d4.join(keep_ids, id_col)
        stages["dsir_selected"] = d4

    d5 = d4.withColumn(text_col, redact_pii_tags(F.col(text_col)))
    stages["redacted"] = d5

    if doremi_eta is not None:
        from .mix import doremi_sample
        mixed = doremi_sample(d5, None, doremi_eta, budget, domain_col,
                              id_col, text_col)
    elif temperature is not None:
        from .mix import temperature_sample
        mixed = temperature_sample(d5, temperature, budget, id_col,
                                   domain_col)
    else:
        mixed = mixture_sample(d5, weights, budget, id_col, domain_col)
    stages["mixed"] = mixed

    # pack on (doc_id, copy): repeats are distinct sequences in the
    # stream, ordered deterministically by (id, copy) via a derived key.
    # copy < 1000 is guaranteed by mixture's max_epochs clamp; ids must
    # stay ≤ ~9.2e15 for the ×1000 encode to fit int64.  Decode with
    # integer div — float /1000 loses exactness past 2^53 (same rule as
    # the nanos→micros conversion in tables.py).
    # cast BEFORE the ×1000 (r15 review): an IntegerType id column over
    # ~2.1M wraps in 32-bit arithmetic (non-ANSI), silently colliding
    # distinct documents on one _pack_id
    with_key = mixed.withColumn(
        "_pack_id", F.col(id_col).cast("long") * 1000 + F.col("copy"))
    decode = [F.expr("_pack_id div 1000").alias(id_col),
              F.pmod(F.col("_pack_id"), F.lit(1000)).alias("copy")]
    if pack_mode == "chunk":
        packed = pack_sequences(with_key, max_tokens, id_col="_pack_id",
                                text_col=text_col)
        packed = packed.select(*decode, "n_tokens", "start_offset",
                               "first_bin", "last_bin")
    elif pack_mode == "ffd":
        # SFT layout: whole documents per bin, never split
        from .pack import pack_bins_ffd
        packed = pack_bins_ffd(with_key, max_tokens, id_col="_pack_id",
                               text_col=text_col)
        packed = packed.select(*decode, "n_tokens", "shard", "bin",
                               "oversize")
    else:
        raise ValueError(f"pack_mode must be chunk|ffd, got {pack_mode!r}")
    return CorpusBuild(corpus=mixed, packed=packed, stages=stages)
