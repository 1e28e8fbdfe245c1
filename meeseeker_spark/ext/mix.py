"""Pretraining mixture materialization (training-data pipeline extension,
same family as SURVEY §2 F — no reference counterpart by definition).

A pretraining corpus is assembled to TARGET domain proportions (so much
web, so much code, so much reference text) against a token budget.  Each
domain's sampling factor = weight·budget / domain_size; factors > 1 mean
the domain is repeated for multiple epochs (the standard up-sampling of
small high-quality domains), factors < 1 mean hash-deterministic
down-sampling.

Scale shape: the plan is one partial-aggregated sum per domain (rows =
#domains, broadcast back onto the corpus), and materialization is a
narrow per-row explode of ⌈factor⌉ copies with a deterministic md5 keep
decision on the last fractional copy — no shuffle of corpus rows at any
scale, no RNG (retried tasks and the DuckDB oracle pick identical rows).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_HASH_MOD = 10_000


def _keep_hash(id_col: F.Column, copy_col: F.Column) -> F.Column:
    """Uniform [0, _HASH_MOD) hash of (id, copy) — first 8 md5 hex chars,
    the same oracle-reproducible idiom as stratified_sample."""
    from .text import md5_int32
    key = F.concat(id_col.cast("string"), F.lit(":"), copy_col.cast("string"))
    return F.pmod(md5_int32(key), F.lit(_HASH_MOD))


def mixture_plan(docs: DataFrame, weights: dict[str, float],
                 budget: int | None = None, domain_col: str = "lang",
                 size_col: str = "n_chars",
                 max_epochs: int = 100) -> DataFrame:
    """Per-domain sampling factors for a target mixture.

    Returns (domain, domain_size, target_size, factor, epochs, frac):
    ``factor`` = weight·budget / domain_size, split into ``epochs`` full
    passes and a fractional ``frac`` tail.  Domains absent from
    ``weights`` get weight 0 (dropped).  ``budget=None`` targets the
    full corpus size, computed IN-PLAN as a cross-joined scalar
    aggregate — never a driver-side action inside the builder (the
    job-in-builder wart).  One tiny aggregate either way — at 100 TB
    this is a metadata query.

    ``max_epochs`` clamps the factor: a near-empty domain carrying a
    large weight would otherwise demand an unbounded repeat count, and
    the materialization explodes ⌈factor⌉ copies PER ROW — the clamp
    bounds that blowup (and >~30 epochs of the same text is past any
    useful up-sampling anyway).  Clamped domains undershoot their target
    weight; the plan row shows it (factor == max_epochs)."""
    w = F.create_map(*[
        F.lit(x) for kv in weights.items() for x in kv])
    sizes = (
        docs.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.sum(size_col).cast("bigint").alias("domain_size"))
    )
    if budget is None:
        # aggregate over the D-row sizes table, not the corpus (r15
        # review): a docs-side total is a second full scan Spark cannot
        # share with the sizes groupBy; same exact value (Σ domain sums)
        total = sizes.agg(
            F.sum("domain_size").cast("double").alias("_budget"))
        sizes = sizes.crossJoin(F.broadcast(total))
        budget_col = F.col("_budget")
    else:
        budget_col = F.lit(float(budget))
    # a domain whose sizes sum to 0 would make weight·budget/0 NULL, and
    # F.least SKIPS nulls — the degenerate domain would silently get
    # factor == max_epochs and up-sample its zero-length rows max_epochs
    # times (ADVICE r3); guard to 0.0 instead (nothing to sample)
    factor = F.when(
        F.col("domain_size") > 0,
        F.least(
            F.coalesce(w[F.col("domain")], F.lit(0.0)) * budget_col
            / F.col("domain_size"),
            F.lit(float(max_epochs))),
    ).otherwise(F.lit(0.0))
    return sizes.select(
        "domain", "domain_size",
        F.round(factor * F.col("domain_size"), 4).alias("target_size"),
        F.round(factor, 6).alias("factor"),
        F.floor(factor).cast("bigint").alias("epochs"),
        F.round(factor - F.floor(factor), 6).alias("frac"),
    )


def sample_from_plan(docs: DataFrame, plan: DataFrame,
                     id_col: str = "doc_id",
                     domain_col: str = "lang") -> DataFrame:
    """Materialize any (domain, epochs, frac) plan: each document
    appears ``epochs`` times plus once more with probability ``frac``
    (decided by a deterministic hash of (id, copy), so the output is
    identical across retries/engines).  Output = input columns +
    ``copy`` (0-based epoch index).  Shared tail of mixture_sample and
    temperature_sample — the plan side is #domains rows → broadcast
    join; the explode is narrow."""
    # underscored internals (r15 review): unqualified 'domain'/'epochs'/
    # 'frac' collided with user columns of the same name (AMBIGUOUS_
    # REFERENCE on e.g. domain_col="domain") — the module's own
    # _-prefix convention, applied here
    p = plan.select(F.col("domain").alias("_mx_dom"),
                    F.col("epochs").alias("_mx_epochs"),
                    F.col("frac").alias("_mx_frac"))
    frac_scaled = F.floor(F.col("_mx_frac") * _HASH_MOD).cast("bigint")
    keep_last = _keep_hash(F.col(id_col), F.col("copy")) < frac_scaled
    return (
        docs.join(F.broadcast(p), docs[domain_col] == F.col("_mx_dom"))
        .select(*docs.columns, "_mx_epochs", "_mx_frac",
                F.explode(F.sequence(F.lit(0), F.col("_mx_epochs")))
                .alias("copy"))
        .where((F.col("copy") < F.col("_mx_epochs")) | keep_last)
        .drop("_mx_epochs", "_mx_frac")
    )


def mixture_sample(docs: DataFrame, weights: dict[str, float],
                   budget: int | None = None, id_col: str = "doc_id",
                   domain_col: str = "lang",
                   size_col: str = "n_chars",
                   max_epochs: int = 100) -> DataFrame:
    """Materialize the mixture (see sample_from_plan for the copy/keep
    semantics).  Expected output size per domain = weight·budget by
    construction."""
    plan = mixture_plan(docs, weights, budget, domain_col, size_col,
                        max_epochs)
    return sample_from_plan(docs, plan, id_col, domain_col)


def temperature_plan(docs: DataFrame, temperature: float,
                     budget: int | None = None,
                     domain_col: str = "lang",
                     size_col: str = "n_chars",
                     max_epochs: int = 100) -> DataFrame:
    """Temperature-based mixture plan (mT5/XLM-R sampling, Xue et al.
    2021 §3.3): target proportion p_i ∝ size_i^(1/T) — T=1 is
    proportional (every doc once at budget=None), T→∞ approaches
    uniform-over-domains, the standard knob for boosting low-resource
    domains without hand-writing weights.

    Returns (domain, domain_size, p, target_size, factor, epochs,
    frac), all computed IN-PLAN (#domains-row aggregate + one 1-row
    cross-joined scalar for the normalizer/budget — never a driver
    action).  ``factor`` is rounded to 6 dp before the epoch/frac split
    so the DuckDB oracle reproduces the hash keep decisions despite
    pow()'s last-ulp engine differences; the same ``max_epochs`` clamp
    as mixture_plan bounds near-empty-domain blowup."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    sizes = (
        docs.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.sum(size_col).cast("bigint").alias("domain_size"))
    )
    pw = F.when(
        F.col("domain_size") > 0,
        F.pow(F.col("domain_size").cast("double"),
              F.lit(1.0 / temperature))).otherwise(F.lit(0.0))
    sizes = sizes.withColumn("_pw", pw)
    tot = sizes.agg(F.sum("_pw").alias("_tot"),
                    F.sum("domain_size").cast("double").alias("_corpus"))
    sizes = sizes.crossJoin(F.broadcast(tot))
    budget_col = (F.col("_corpus") if budget is None
                  else F.lit(float(budget)))
    p = F.when(F.col("_tot") > 0,
               F.col("_pw") / F.col("_tot")).otherwise(F.lit(0.0))
    factor = F.round(
        F.when(F.col("domain_size") > 0,
               F.least(p * budget_col / F.col("domain_size"),
                       F.lit(float(max_epochs))))
        .otherwise(F.lit(0.0)), 6)
    return (
        sizes.select(
            "domain", "domain_size",
            F.round(p, 6).alias("p"),
            F.round(p * budget_col, 1).alias("target_size"),
            factor.alias("factor"),
            F.floor(factor).cast("int").alias("epochs"),
            F.round(factor - F.floor(factor), 6).alias("frac"))
    )


def temperature_sample(docs: DataFrame, temperature: float,
                       budget: int | None = None,
                       id_col: str = "doc_id",
                       domain_col: str = "lang",
                       size_col: str = "n_chars",
                       max_epochs: int = 100) -> DataFrame:
    """Materialize the temperature mixture (see sample_from_plan)."""
    plan = temperature_plan(docs, temperature, budget, domain_col,
                            size_col, max_epochs)
    return sample_from_plan(docs, plan, id_col, domain_col)


def _cap_rank(id_col: str) -> F.Column:
    """Deterministic per-row rank key for domain capping: uniform md5 of
    the id under a fixed salt (so it's independent of the hashes used by
    mixture_sample / stratified_sample on the same ids), id tie-break."""
    from .text import md5_int32
    return md5_int32(F.concat(F.lit("cap:"), F.col(id_col).cast("string")))


def domain_cap(docs: DataFrame, cap: int, domain_col: str = "source",
               id_col: str = "doc_id", prefilter_slack: float = 3.0,
               ) -> DataFrame:
    """Keep at most ``cap`` documents per domain — the standard guard
    against one crawl source (a single site, a single dump) dominating
    the corpus.  Survivors are the ``cap`` smallest deterministic hash
    ranks, NOT arrival order: stable across retries, partitionings, and
    the DuckDB oracle (which replays the same md5 rank).

    Scale shape: the naive form is one window over ``partitionBy(domain)``
    — a full shuffle of the corpus, and the over-cap mega-domain becomes
    a single straggling sort.  Instead: (1) per-domain counts (tiny agg,
    broadcast back); (2) domains at-or-under cap pass through with NO
    rank work; (3) over-cap domains are pre-filtered to rank-hash <
    ``slack·cap/count`` of the hash space BEFORE the window — because the
    filter keeps a *prefix* of the very hash order the window ranks by,
    the top-``cap`` rows are provably inside the surviving set whenever
    ≥ cap rows survive, so the result is exact, and the window now sorts
    ~``slack·cap`` rows per domain instead of the domain's full mass.

    The "≥ cap rows survive" condition is NOT left to chance: a second
    tiny aggregate counts each over-cap domain's pre-filter survivors,
    and a domain that came up short (P ≤ exp(-cap·(1-1/slack)²/2) per
    Chernoff — rare but ~1e-3 at cap 30, slack 3, i.e. real) falls back
    to ranking its full mass, in-plan, no driver action.  The operator
    is therefore unconditionally exact; the slack only tunes how often
    a domain pays the full-sort price (the hypothesis property test
    drives slack 1.5 where shortfalls actually happen).

    Rows with a NULL domain are DROPPED (inner-join semantics, mirrored
    by the oracle) — coalesce the domain to a sentinel upstream if NULL
    should count as its own domain.  Same for ``domain_cap_hash``.
    """
    from pyspark.sql import Window

    counts = (docs.groupBy(F.col(domain_col).alias("_dom"))
              .agg(F.count("*").alias("_dn")))
    rk_hash = _cap_rank(id_col)
    # hash space is [0, 2^32); keep the prefix that over-selects slack×cap
    threshold = F.ceil(F.lit(float(2 ** 32) * prefilter_slack * cap)
                       / F.col("_dn")).cast("bigint")
    joined = docs.join(F.broadcast(counts),
                       docs[domain_col] == F.col("_dom"))
    # shortfall guard: survivors-per-domain under the pre-filter (tiny
    # output, broadcast back; only over-cap domains matter — a domain
    # with ZERO survivors is absent here, the left join's NULL routes it
    # to the same full-mass fallback)
    pre_counts = (joined.where((F.col("_dn") > cap) & (rk_hash < threshold))
                  .groupBy(F.col(domain_col).alias("_pdom"))
                  .agg(F.count("*").alias("_kn")))
    small = joined.where(F.col("_dn") <= cap).select(*docs.columns)
    w = Window.partitionBy(domain_col).orderBy(rk_hash.asc(),
                                               F.col(id_col).asc())
    big = (
        joined.where(F.col("_dn") > cap)
        .join(F.broadcast(pre_counts),
              joined[domain_col] == F.col("_pdom"), "left")
        .where((rk_hash < threshold)
               | F.coalesce(F.col("_kn") < cap, F.lit(True)))
        .select(*docs.columns)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )
    return small.unionByName(big)


def domain_cap_hash(docs: DataFrame, cap: int, domain_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Approximate per-domain cap with ZERO corpus shuffle: keep rows
    whose rank-hash falls in the first ``cap/count`` of the hash space.
    Kept count per domain is Binomial(count, cap/count) — expectation
    ``cap``, relative deviation O(1/√cap) — which is what a 100 TB
    pipeline actually wants (the window variant's exactness costs a
    per-domain sort; a ±2% wobble on a cap is meaningless there).
    Deterministic: same fixture → same rows, DuckDB-replayable."""
    counts = (docs.groupBy(F.col(domain_col).alias("_dom"))
              .agg(F.count("*").alias("_dn")))
    threshold = F.when(
        F.col("_dn") <= cap, F.lit(2 ** 32)
    ).otherwise(F.ceil(F.lit(float(2 ** 32) * cap) / F.col("_dn"))
                .cast("bigint"))
    return (
        docs.join(F.broadcast(counts), docs[domain_col] == F.col("_dom"))
        .where(_cap_rank(id_col) < threshold)
        .select(*docs.columns)
    )


def unimax_plan(docs: DataFrame, budget: float | None = None,
                domain_col: str = "lang", size_col: str = "n_chars",
                max_epochs: float = 4.0) -> list[tuple]:
    """UniMax budget allocation (Chung et al. 2023): split the budget as
    EVENLY across domains as the per-domain epoch cap allows — the fair
    alternative to proportional/weighted sampling for multilingual
    corpora (high-resource languages stop crowding out the tail, no
    hand-tuned temperature).

    Water-filling, deterministic sorted closed form (r9 — VERDICT r8
    "What's missing" item 2): sort domains ascending by cap
    (max_epochs·size, domain tie-break); walking up, domain k freezes
    at its cap iff cap_k ≤ share_k = (B − Σ_{i<k} cap_i)/(n−k); the
    first NON-frozen k fixes the water level θ = share_k, and every
    later (larger-cap) domain gets exactly θ.  Mathematically this is
    the fixed point of the classic freeze-and-reshare loop, but unlike
    a loop over dict order it is ieee-exact AND independently
    SQL-expressible: sizes are exact integer sums, caps an exact ×4,
    the prefix sums run in one globally-agreed order (cap, domain), and
    θ is a single division of exact values — so a window-function
    DuckDB twin reproduces every allocation bit-for-bit (the
    test_unimax_sample_vs_duckdb oracle now SOLVES the water-filling in
    SQL instead of replaying injected factors, which was that entry's
    recorded ceiling).  Driver cost: one #domains-row collect plus an
    O(D log D) sort.

    Returns [(domain, size, allocation, factor), ...] sorted by domain;
    ``budget=None`` targets the total corpus size."""
    rows = (docs.groupBy(F.col(domain_col).alias("d"))
            .agg(F.sum(size_col).cast("double").alias("s"))
            .collect())
    # skip NULL domains AND NULL sums (r15 review: a domain whose every
    # size_col is NULL summed to None and crashed the sort/budget math;
    # mixture_plan's domain_size > 0 guard drops the same input)
    sizes = {r["d"]: r["s"] for r in rows
             if r["d"] is not None and r["s"] is not None}
    if budget is None:
        # sum of exact integer-valued doubles: order-independent
        budget = sum(sizes.values())
    items = sorted((s * max_epochs, d) for d, s in sizes.items())
    n = len(items)
    prefix, theta, ks = 0.0, None, n
    for k, (cap, _) in enumerate(items):
        share = (budget - prefix) / (n - k)
        if cap > share:
            theta, ks = share, k
            break
        prefix += cap
    alloc = {d: (cap if k < ks else theta)
             for k, (cap, d) in enumerate(items)}

    # half-away-from-zero rounding (allocs are >= 0): Python's builtin
    # round() is half-to-EVEN, DuckDB's round() half-away — on a factor
    # landing exactly on a representable 6-dp half (dyadic rationals
    # like 1/128 do occur in exact-arithmetic ratios) the two policies
    # split and the independent SQL oracle would diverge (r9 review)
    def _r(x: float, dp: int) -> float:
        s = 10.0 ** dp
        return math.floor(x * s + 0.5) / s

    return sorted(
        (d, sizes[d], _r(alloc[d], 4),
         _r(alloc[d] / sizes[d], 6) if sizes[d] else 0.0)
        for d in sizes)


def unimax_sample(docs: DataFrame, budget: float | None = None,
                  id_col: str = "doc_id", domain_col: str = "lang",
                  size_col: str = "n_chars",
                  max_epochs: float = 4.0) -> DataFrame:
    """Materialize a UniMax allocation with the same deterministic
    epoch-explode + md5 fractional keep as ``mixture_sample`` (same
    output shape: input columns + ``copy``).  The plan is a D-row
    broadcast; the explode is narrow — no corpus shuffle at any scale."""
    plan = unimax_plan(docs, budget, domain_col, size_col, max_epochs)
    spark = docs.sparkSession
    # explicit schema, typed from the caller's domain column (r15
    # review: a names-only createDataFrame cannot infer types from an
    # EMPTY plan — empty docs crashed instead of returning empty);
    # underscored internals for the same collision reason as
    # sample_from_plan
    import pyspark.sql.types as T
    pdf = spark.createDataFrame(
        [(d, float(f)) for d, _, _, f in plan],
        T.StructType([
            T.StructField("_mx_dom", docs.schema[domain_col].dataType),
            T.StructField("_mx_factor", T.DoubleType())]))
    frac_scaled = F.floor(
        F.round(F.col("_mx_factor") - F.floor(F.col("_mx_factor")), 6)
        * _HASH_MOD).cast("bigint")
    keep_last = _keep_hash(F.col(id_col), F.col("copy")) < frac_scaled
    return (
        docs.join(F.broadcast(pdf), docs[domain_col] == F.col("_mx_dom"))
        .select(*docs.columns,
                F.floor("_mx_factor").cast("bigint").alias("_mx_epochs"),
                frac_scaled.alias("_fs"),
                F.explode(F.sequence(
                    F.lit(0), F.floor("_mx_factor").cast("bigint")))
                .alias("copy"))
        .where((F.col("copy") < F.col("_mx_epochs")) | keep_last)
        .drop("_mx_epochs", "_fs")
    )


def doremi_weights(docs: DataFrame, ref_weights: dict[str, float] | None
                   = None, eta: float = 1.0, domain_col: str = "lang",
                   id_col: str = "doc_id", text_col: str = "text",
                   size_col: str = "n_chars") -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, adapted to a
    hermetic proxy): one multiplicative-weights step
    w'_d ∝ ref_d · exp(η · excess_d), normalized over domains, where
    excess_d = max(0, avg_xent_d − corpus_avg_xent) under the corpus
    bigram LM (ext.lm.bigram_lm_scores stands in for DoReMi's
    proxy-vs-reference loss gap: domains whose text the corpus-wide
    model finds HARD get up-weighted, easy/boilerplate domains bleed
    weight).  ``ref_weights=None`` starts from DoReMi's uniform α.

    Returns one row per domain: (domain, domain_size, n_scored,
    avg_xent, excess, ref_w, weight) — weights sum to 1, 6 dp.

    Scale shape: scoring is the LM's gram-keyed shuffle joins; this
    operator adds ONE per-domain aggregate over (xent, size) pairs.
    Everything after that aggregate — the corpus-wide mean, the
    exp/normalize step — runs as window functions over the D-row frame
    (D = #domains), so there is no driver action and no second corpus
    pass: the corpus average is derived from the SAME aggregate
    (Σ sum_d / Σ n_d), never a separate subtree (the r7/r9
    duplicated-subtree lessons applied at design time).  The unbounded
    windows DO emit Spark's single-partition warning — deliberately
    accepted: they run on the post-aggregate D-row frame, bounded by
    the domain vocabulary (thousands at most), never on corpus rows."""
    from pyspark.sql import Window

    from .lm import bigram_lm_scores

    if eta < 0:
        raise ValueError("eta must be non-negative")
    scores = bigram_lm_scores(docs, id_col, text_col, round_dp=None)
    per_doc = (docs.select(F.col(id_col).alias("_id"),
                           F.col(domain_col).alias("domain"),
                           F.col(size_col).cast("bigint").alias("_sz"))
               .join(scores.select(F.col(id_col).alias("_id"), "xent"),
                     "_id"))
    agg = (per_doc.groupBy("domain")
           .agg(F.sum("_sz").alias("domain_size"),
                F.count("xent").alias("n_scored"),
                F.sum("xent").alias("_sx")))
    w_all = Window.partitionBy()
    corpus_avg = (F.sum("_sx").over(w_all)
                  / F.sum("n_scored").over(w_all))
    avg_xent = F.col("_sx") / F.col("n_scored")
    excess = F.greatest(avg_xent - corpus_avg, F.lit(0.0))
    if ref_weights is None:
        ref_w = F.lit(1.0) / F.count("*").over(w_all)
    else:
        m = F.create_map(*[F.lit(x) for kv in ref_weights.items()
                           for x in kv])
        ref_w = F.coalesce(m[F.col("domain")], F.lit(0.0))
    raw = ref_w * F.exp(F.lit(float(eta)) * excess)
    weight = raw / F.sum(raw).over(w_all)
    return (agg.select(
        "domain", "domain_size", "n_scored",
        F.round(avg_xent, 4).alias("avg_xent"),
        F.round(excess, 4).alias("excess"),
        F.round(ref_w, 6).alias("ref_w"),
        F.round(weight, 6).alias("weight"))
        .orderBy("domain"))


def doremi_sample(docs: DataFrame, ref_weights: dict[str, float] | None
                  = None, eta: float = 1.0, budget: int | None = None,
                  domain_col: str = "lang", id_col: str = "doc_id",
                  text_col: str = "text", size_col: str = "n_chars",
                  max_epochs: int = 100) -> DataFrame:
    """Materialize a DoReMi-reweighted mixture: the D-row weight table
    from ``doremi_weights`` is a bounded driver collect (same budget
    class as unimax_plan's size table), then the standard
    mixture_plan → sample_from_plan tail runs with the learned weights
    — deterministic epoch-explode + md5 keep, identical across
    retries."""
    rows = doremi_weights(docs, ref_weights, eta, domain_col, id_col,
                          text_col, size_col).collect()
    weights = {r["domain"]: float(r["weight"]) for r in rows}
    return sample_from_plan(
        docs, mixture_plan(docs, weights, budget, domain_col, size_col,
                           max_epochs),
        id_col, domain_col)
