#!/usr/bin/env python
"""Rounding-boundary-distance audit for driver-graded oracle outputs
(VERDICT r8 item 3 — the gate CORRECTNESS_r08 proved was missing).

Why: the driver hashes every oracled entry's values after comparing a
LOCAL Spark run against the DRIVER's DuckDB.  Round 8 shipped two
entries whose 4-dp-rounded doubles sat on or within ~2e-8 of a rounding
half-boundary (perplexity_buckets doc 227; corpus_datacard (src17, zh)
avg_quality + two avg_tokens cells EXACTLY on representable halves).
Local parity passed — the local gate structurally cannot see
cross-machine/cross-build differences — and the driver hash flipped.
This audit converts that bug class from driver-red to preflight-red:
it measures, for EVERY round() call in EVERY oracle, how close the
unrounded value sits to its rounding half-boundary, and fails when an
entry's values are inside the fragile band for its drift class.

How: a DuckDB Python UDF ``audit_round(x, d)`` returns exactly what
round(x, d) returns (round-half-away-from-zero on the scaled value,
DuckDB's policy) and RECORDS |frac(|x|·10^d) − 0.5| — the scaled
distance to the nearest half-boundary — as a side effect.  Each oracle
is executed with ``round(`` textually swapped for ``audit_round(``:
semantics are unchanged (same values flow through thresholds, ORDER BY
and projections), so the audit sees every rounded value the oracle
produces anywhere in its plan, including CTE-internal rounds that feed
comparisons (the near-dup τ thresholds) — a surface a final-projection
rewrite would miss.

What the r8 evidence actually pins down (measured in r9, recorded in
ROUND_NOTES): on the shipped sf0.01 fixture NO rounding/drift mechanism
can flip any cell of the two failed entries — the old tertile
thresholds sit 0.38/0.45 (scaled) from their half-boundaries, zero docs
have rounded xent equal to a rounded threshold, cross-machine libm/
sum-order drift is bounded ~1e-13 value units (five orders short of the
closest 2.2e-8 cell), and exact-half outputs elsewhere (gopher_rules'
4.28125, jaccard's thresholds) stayed GREEN on the same driver, ruling
out round-half policy skew.  The single feature unique to exactly the
two red entries is percentile interpolation (Spark ``percentile`` /
DuckDB ``quantile_cont``) — every green entry lacks it, and
value_percentiles (the previous carrier) left the window in r8.  Hence
the audit's strongest rule is the INTERPOLATION BAN below; the distance
bars are defense-in-depth for the classic near-half class.

Checks, in decreasing strength:

1. **Interpolation ban** — any graded oracle whose SQL uses
   quantile_cont / quantile_disc / percentile_* FAILS.  Rank and
   integer forms replay across engine builds; interpolated percentiles
   are the one surface correlated with the r8 driver failures.
2. **Ordering ban** — any graded oracle that ranks (row_number / rank /
   dense_rank / ntile) or top-k-selects (ORDER BY … LIMIT) over a key
   that derives from libm (ln/log/exp/pow) or a float aggregate
   WITHOUT passing the key through round() FAILS.  An integer computed
   BY ORDERING machine-dependent doubles is itself machine-dependent:
   CORRECTNESS_r09 red-flagged `ppl_rank` (row_number over raw
   libm-`ln` xent sums) even though no double crossed the hash and the
   local min-adjacent-gap audit (1.07e-6 vs ~1e-13 "drift") passed —
   gap bars calibrated on local engine builds do not transfer to the
   driver's builds, so the rule is categorical, not a distance bar.
   (This check REPLACED r9's per-entry order-gap measurement, whose
   hand-copied oracle SQL and empirically-falsified 1e-9 bar were both
   flagged in ADVICE r9.)  Keys that pass through round() are allowed:
   rounding collapses the key to discrete audited values (check 3's
   distance bar), and every shipped ranked entry (tfidf/bm25/knn/dsir)
   adds a deterministic integer tie-break below the rounded key.
3. **machine-dep distance bar** — entries whose round() inputs can
   differ across machines (non-correctly-rounded libm: ln/pow/exp —
   sqrt IS correctly rounded; row-order-dependent float aggregation)
   must keep every rounded value's scaled distance > 1e-4.  Calibration:
   drift analysis bounds cross-machine differences at ~1e-13 value
   units (1e-9 scaled at 4 dp), and bm25's min of 1.4e-4 survived the
   r8 driver — the bar sits 10^5 above the physics and just under the
   tightest empirical survivor.
4. **ieee-exact record** — entries whose round() inputs are
   bit-identical on any IEEE 754 machine (integer ratios, fixed-order
   sums/products of unmodified parquet doubles, sqrt) are certified by
   LOCAL parity alone; the audit records their min distance and WARNS
   on exact-half hits (flip would require a round-half-even engine
   build — empirically excluded by gopher_rules' green exact halves)
   without failing.
5. **double-column coverage** — EVERY double output column of every
   graded oracle (not just the no-round entries, the r9 coverage hole)
   must either be produced by an audited round() site (resolved
   through one level of CTE/projection aliases) or be a registered raw
   passthrough in PASSTHROUGH_OK; otherwise the entry fails.

Every oracled entry whose SQL contains round() MUST appear in CLASSES —
an unregistered entry fails the audit, so a future rotation cannot slip
an unaudited double into the grading window.

Usage: python tools/boundary_audit.py [--sf DIR] [--json OUT]
Exit 0 = every bar cleared.  Run by tools/preflight.py.
"""

from __future__ import annotations

import argparse
import json
import math
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Entry -> drift class for its round() inputs (see module docstring).
# Entries absent from this map must have NO round() and NO double
# output columns, or the audit fails on coverage.
MACHINE_DEP = "machine-dep"
IEEE_EXACT = "ieee-exact"

CLASSES = {
    # libm ln / pow, or row-order float sums
    "bm25_batch_topk": MACHINE_DEP,    # ln in the idf term
    "dsir_select": MACHINE_DEP,        # ln ratios + Gumbel -ln(-ln(u))
    "label_centroids": MACHINE_DEP,    # avg over rows (merge order)
    "channel_volume": MACHINE_DEP,     # sum(value) over rows
    "pricing_summary": MACHINE_DEP,    # sums/avgs over rows
    "temperature_sample": MACHINE_DEP,  # pow(size, 1/T)
    # exact-integer / fixed-order arithmetic (cross-engine identical
    # inputs; only exact-half policy skew can flip)
    "asof_last_purchase": IEEE_EXACT,  # round of an unmodified parquet double
    "near_dup_pairs": IEEE_EXACT,
    "leakage_safe_split": IEEE_EXACT,
    "dedup_components": IEEE_EXACT,    # threshold-feeding jaccard rounds
    # NB keys must cover exactly the GRADED round()-bearing oracles:
    # test_full_audit_runs_at_sf0001 asserts CLASSES <= measured, so a
    # rotated-OUT entry's key leaves with it (r11 wave 7 removed
    # tfidf_top_terms, jaccard_ngram_pairs, dedup_weights — their
    # oracles live verbatim in parity pytests now).
    "screen_replay": IEEE_EXACT,       # rounds feed only >=0.5 thresholds
    #                                    on int/int shingle ratios (the
    #                                    near_dup_pairs class); graded
    #                                    columns are ints/strings (r11)
    "ngram_novelty": IEEE_EXACT,       # int/int ratio (r9 wave 5)
    "blocklist_screen": IEEE_EXACT,    # int/int ratio + threshold (r9 wave 5)
    "training_funnel": IEEE_EXACT,     # md5 keeps; 6-dp round of fixed-order
    #                                    factor arithmetic on exact inputs
    "unimax_sample": IEEE_EXACT,       # integer sizes, exact ×4 caps, one
    #                                    window-pinned summation order, a
    #                                    single division for θ (r10 wave 6)
    "gopher_rules": IEEE_EXACT,
    "dedup_eval": IEEE_EXACT,          # one round() of an int/int shingle
    #                                    ratio feeding a >=0.5 threshold
    #                                    (the near_dup_pairs class); the
    #                                    graded columns are pure integer
    #                                    counts (r12 wave 8)
    "knn_topk": IEEE_EXACT,            # sqrt is correctly rounded; dot is fixed-order
    "nai_amounts": IEEE_EXACT,         # round(parquet_double * 100)
}

BARS = {MACHINE_DEP: 1e-4}  # ieee-exact: warn-only (see module docstring)

# graded oracles must not interpolate percentiles (check 1 above)
_INTERPOLATION = re.compile(
    r"\b(quantile_cont|quantile_disc|percentile_cont|percentile_disc"
    r"|quantile|percentile|approx_quantile|median)\s*\(", re.I)

# --- check 2: the ordering ban (r10, closes the r9 hole) --------------
# Ranking window functions whose output (an integer!) encodes the order
# of machine-dependent doubles.
_RANKING = re.compile(r"\b(row_number|dense_rank|rank|ntile)\s*\(", re.I)
# Functions DuckDB/Spark evaluate through libm — NOT correctly rounded,
# so last-ulp results differ across builds.  sqrt is correctly rounded
# by IEEE 754 and deliberately absent.
_LIBM = re.compile(r"\b(ln|log|log2|log10|log1p|exp|exp2|pow|power)\s*\(",
                   re.I)
# Aggregates that are float-valued regardless of input type.
_FLOAT_AGG = re.compile(
    r"\b(avg|mean|stddev\w*|var_pop|var_samp|variance|covar\w*|corr)\s*\(",
    re.I)


def _skip_literal_back(sql: str, i: int) -> int:
    """i points at a closing quote while scanning BACKWARD; return the
    index just before the literal's opening quote ('' escapes stay
    inside the literal)."""
    j = i - 1
    while j >= 0:
        if sql[j] == "'":
            if j > 0 and sql[j - 1] == "'":
                j -= 2
                continue
            return j - 1
        j -= 1
    return -1


def _expr_before(sql: str, pos: int) -> str:
    """The SQL expression text ending at ``pos`` — scan backward to the
    enclosing top-level comma, open paren, or SELECT keyword.  Used to
    recover the defining expression of an ``<expr> AS alias`` item."""
    depth, i, start = 0, pos - 1, 0
    while i >= 0:
        c = sql[i]
        if c == "'":
            i = _skip_literal_back(sql, i)
            continue
        if c == ")":
            depth += 1
        elif c == "(":
            if depth == 0:
                start = i + 1
                break
            depth -= 1
        elif c == "," and depth == 0:
            start = i + 1
            break
        i -= 1
    expr = sql[start:pos]
    expr = re.sub(r"^\s*select\s+(distinct\s+)?", "", expr, flags=re.I)
    return expr.strip()


def _alias_defs(sql: str, ident: str) -> list[str]:
    """Every defining expression for ``<expr> AS ident`` in the SQL."""
    return [_expr_before(sql, m.start())
            for m in re.finditer(rf"\bAS\s+{re.escape(ident)}\b", sql, re.I)]


def _match_paren(sql: str, open_pos: int) -> int:
    """Index of the ')' matching the '(' at open_pos (string-literal
    aware, forward scan)."""
    depth, j, in_str = 0, open_pos + 1, False
    while j < len(sql):
        c = sql[j]
        if in_str:
            if c == "'":
                if j + 1 < len(sql) and sql[j + 1] == "'":
                    j += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                return j
            depth -= 1
        j += 1
    return len(sql)


def _split_top_commas(s: str) -> list[str]:
    parts, depth, cur, in_str = [], 0, [], False
    for c in s:
        if in_str:
            cur.append(c)
            if c == "'":
                in_str = False
            continue
        if c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(c)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


# SQL keywords/types that look like identifiers inside an ORDER BY key
# expression but never name a column
_NON_COLUMN_WORDS = frozenset("""
    as asc desc nulls first last cast try_cast case when then else end
    and or not in is null true false between like distinct select from
    where group by order limit over partition rows range unbounded
    preceding following current row interval
    bigint integer int smallint tinyint hugeint double float real
    decimal numeric varchar char text string boolean bool date
    timestamp time blob bytea
""".split())


def _key_idents(expr: str) -> list[str]:
    """Column-looking identifiers inside an ORDER BY key expression:
    word tokens that are not function calls (followed by '('), not SQL
    keywords/type names, and not string-literal content."""
    no_str = re.sub(r"'(?:[^']|'')*'", " ", expr)
    out = []
    for m in re.finditer(r"\b([A-Za-z_]\w*)\b", no_str):
        rest = no_str[m.end():]
        if re.match(r"\s*\(", rest):
            continue  # function call
        w = m.group(1).lower()
        if w in _NON_COLUMN_WORDS:
            continue
        out.append(m.group(1))
    return out


def _machine_dep_key(sql: str, expr: str, depth: int = 0) -> bool:
    """True when an ordering key derives from libm or a float aggregate
    WITHOUT passing through round().  EVERY column-looking identifier in
    the key expression resolves through ``AS`` aliases (CTE columns),
    bounded depth — a bare-identifier-only resolution would let
    ``-xent`` / ``abs(xent)`` / ``xent + 0.0`` smuggle a raw libm key
    past the ban (r10 self-review finding)."""
    e = expr.strip()
    if re.match(r"^\s*(audit_)?round\s*\(", e, re.I):
        return False  # rounded key: covered by the distance bars
    if _LIBM.search(e) or _FLOAT_AGG.search(e):
        return True
    # float-valued sums: sum(...) combined with division / double casts
    # / float literals in the same expression
    if (re.search(r"\bsum\s*\(", e, re.I)
            and re.search(r"::DOUBLE|/|\d\.\d", e)):
        return True
    if depth >= 5:
        return False
    for ident in _key_idents(e):
        for d in _alias_defs(sql, ident):
            if d.strip().lower() == e.strip().lower():
                continue  # self-referential (e.g. `x AS x`)
            if _machine_dep_key(sql, d, depth + 1):
                return True
    return False


def _strip_order_suffix(key: str) -> str:
    prev = None
    while prev != key:
        prev = key
        key = re.sub(r"\s+(asc|desc|nulls\s+(first|last))\s*$", "",
                     key.strip(), flags=re.I)
    return key


def ordering_violations(sql: str) -> list[str]:
    """Check 2: every ranking-window ORDER BY key and every global
    ORDER BY … LIMIT key must be machine-independent or round-wrapped."""
    bad: list[str] = []
    # ranking window functions
    for m in _RANKING.finditer(sql):
        args_close = _match_paren(sql, sql.index("(", m.end() - 1))
        m2 = re.match(r"\s*over\s*\(", sql[args_close + 1:], re.I)
        if not m2:
            continue
        over_open = args_close + 1 + m2.end() - 1
        over = sql[over_open + 1:_match_paren(sql, over_open)]
        om = re.search(r"\border\s+by\b(.*)$", over, re.I | re.S)
        if not om:
            continue
        for key in _split_top_commas(om.group(1)):
            key = _strip_order_suffix(key)
            if _machine_dep_key(sql, key):
                bad.append(f"{m.group(1)}() over machine-dependent key "
                           f"{key!r}")
    # global top-k selection: ORDER BY … LIMIT (window-internal ORDER
    # BYs are masked out first so the non-greedy span cannot start
    # inside an OVER clause)
    masked = sql
    for m in re.finditer(r"\bover\s*\(", masked, re.I):
        close = _match_paren(masked, m.end() - 1)
        masked = masked[:m.end()] + " " * (close - m.end()) + masked[close:]
    for m in re.finditer(r"\border\s+by\s+(.*?)\s+limit\s+\d", masked,
                         re.I | re.S):
        for key in _split_top_commas(m.group(1)):
            key = _strip_order_suffix(key)
            if _machine_dep_key(sql, key):
                bad.append(f"ORDER BY … LIMIT over machine-dependent key "
                           f"{key!r}")
    return bad


def _is_round_wrapped(expr: str) -> bool:
    """The expression IS one round(...) call (possibly inside
    coalesce/CAST shells) — not merely containing round somewhere:
    ``round(a,4) + ln(b)`` must NOT count as round-produced (r10
    self-review finding), or an unaudited raw-libm term rides a rounded
    sibling past check 5."""
    e = expr.strip()
    # peel transparent shells whose value IS their (first) argument
    while True:
        m = re.match(r"^(coalesce|cast|try_cast)\s*\(", e, re.I)
        if not m:
            break
        open_pos = m.end() - 1
        close = _match_paren(e, open_pos)
        if close != len(e.rstrip()) - 1:
            return False
        inner = e[m.end():close]
        # first top-level argument (coalesce fallbacks / CAST "AS t"
        # don't un-round a rounded value)
        first = _split_top_commas(inner)[0]
        e = re.sub(r"\s+AS\s+\w+\s*$", "", first, flags=re.I).strip()
    m = re.match(r"^(audit_)?round\s*\(", e, re.I)
    if not m:
        return False
    return _match_paren(e, e.index("(", m.start())) == len(e.rstrip()) - 1


def _round_produced(sql: str, col: str, depth: int = 0) -> bool:
    """True when every plausible definition of output column ``col`` IS
    a round() call (resolved through aliases, bounded depth)."""
    defs = _alias_defs(sql, col)
    if not defs:
        return False
    for e in defs:
        if _is_round_wrapped(e):
            continue
        m = re.match(r"^(?:\w+\.)?(\w+)$", e.strip())
        if m and m.group(1) != col and depth < 5 \
                and _round_produced(sql, m.group(1), depth + 1):
            continue
        return False
    return True

# No-round entries whose DOUBLE output columns are verified raw
# parquet passthroughs (bit-identical cross-engine by construction).
# A no-round entry with a double column NOT listed here fails the
# audit: computed-but-unrounded doubles (a bare ln()/float-sum
# projection) are exactly the machine-dependent surface the driver
# hash bans, and they must not slip through as "passthrough".
PASSTHROUGH_OK = {
    "flatten_ops": {"l_quantity"},
    "header_enrich": {"l_quantity"},
    "notified_blocks_semi": {"o_totalprice"},
    "point_lookup": {"value"},
    "scan_by_type": {"value"},
}


def connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def register_audit_round(con, holder: dict):
    """audit_round(x, d) == round(x, d) (half away from zero on the
    scaled value — DuckDB's documented policy), recording the scaled
    distance |frac(|x|·10^d) − 0.5| into holder["sink"] as a side
    effect.  Registered once per connection; swap holder["sink"]
    between entries."""
    from duckdb.typing import BIGINT, DOUBLE

    def _dist(x: float, d: int) -> None:
        scaled = abs(x) * (10.0 ** d)
        frac = scaled - math.floor(scaled)
        holder["sink"].append((abs(frac - 0.5), x, d))

    def _round2(x, d):
        if x is None or d is None:
            return None
        x, d = float(x), int(d)
        if math.isnan(x) or math.isinf(x):
            return x
        _dist(x, d)
        scaled = x * (10.0 ** d)
        r = math.floor(scaled + 0.5) if scaled >= 0 else math.ceil(scaled - 0.5)
        return r / (10.0 ** d)

    def _round1(x):
        return _round2(x, 0)

    con.create_function("audit_round", _round2, [DOUBLE, BIGINT], DOUBLE)
    con.create_function("audit_round1", _round1, [DOUBLE], DOUBLE)


def swap_rounds(sql: str) -> str:
    """Replace every round( call with the audit UDF, recursing into the
    argument text so nested round(round(x, 2), 4) forms are rewritten
    at every level.  Single-arg round(x) maps to audit_round1 —
    detected by scanning the argument list for a top-level comma.  The
    scanner is string-literal aware: parens/commas inside SQL
    '...'-quoted literals (with '' escapes) do not affect depth or arg
    counting, so an oracle like round(len(regexp_extract_all(t,
    '[(),]')), 4) rewrites correctly."""
    out, i = [], 0
    for m in re.finditer(r"\bround\s*\(", sql, flags=re.I):
        if m.start() < i:
            continue  # inside an outer round's args — handled recursively
        out.append(sql[i:m.start()])
        # find matching close paren, note top-level comma; skip quoted
        # literals ('' is the SQL escape for a quote inside a literal)
        depth, j, has_comma, in_str = 0, m.end(), False, False
        while j < len(sql):
            c = sql[j]
            if in_str:
                if c == "'":
                    if j + 1 < len(sql) and sql[j + 1] == "'":
                        j += 1  # escaped quote, stay in the literal
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                has_comma = True
            j += 1
        out.append(("audit_round(" if has_comma else "audit_round1(")
                   + swap_rounds(sql[m.end():j]) + ")")
        i = j + 1
    out.append(sql[i:])
    return "".join(out)


def double_cols(con, sql: str) -> list[str]:
    rows = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
    return [r[0] for r in rows
            if r[1] in ("DOUBLE", "FLOAT", "REAL") or r[1].startswith("DECIMAL")]


def audit(sf_dir: str) -> tuple[int, dict]:
    from meeseeker_spark import catalog

    con = connect(sf_dir)
    report, failures = {}, []
    holder: dict = {"sink": []}
    register_audit_round(con, holder)

    warnings: list = []
    for name, e in sorted(catalog.ENTRIES.items()):
        if e.sql is None:
            continue
        if _INTERPOLATION.search(e.sql):
            failures.append(
                f"{name}: graded oracle interpolates percentiles "
                f"({_INTERPOLATION.search(e.sql).group(1)}) — the surface "
                f"unique to the r8 driver failures; grade ranks or exact "
                f"integers instead")
        for v in ordering_violations(e.sql):
            failures.append(
                f"{name}: {v} — an integer that encodes the ordering of "
                f"libm/float-aggregate doubles is machine-dependent "
                f"(CORRECTNESS_r09's failure class); round the key (with "
                f"an integer tie-break) or grade a non-ordered surface")
        has_round = bool(re.search(r"\bround\s*\(", e.sql, flags=re.I))
        dcols = double_cols(con, e.sql)
        cls = CLASSES.get(name)
        # check 5: EVERY double output column — round-produced,
        # registered passthrough, or fail (runs regardless of has_round;
        # the r9 version skipped round-bearing entries, so a bare
        # ln()/float-sum column beside a rounded one went unaudited)
        uncovered = [c for c in dcols
                     if c not in PASSTHROUGH_OK.get(name, set())
                     and not _round_produced(e.sql, c)]
        if uncovered:
            failures.append(
                f"{name}: double column(s) {uncovered} are neither "
                f"produced by a round() site nor registered raw "
                f"passthroughs in PASSTHROUGH_OK — classify or redesign")
        if not has_round:
            if dcols:
                report[name] = {"class": "passthrough", "double_cols": dcols}
            continue
        if cls is None:
            failures.append(f"{name}: uses round() but has no registered "
                            f"drift class in tools/boundary_audit.py")
            continue
        sink: list = []
        holder["sink"] = sink
        con.execute(swap_rounds(e.sql)).fetchall()
        if not sink:
            failures.append(f"{name}: audit executed but no round() call "
                            f"was observed — swap_rounds missed it")
            continue
        min_d, min_x, min_dp = min(sink)
        exact_halves = sum(1 for d, _, _ in sink if d < 1e-12)
        report[name] = {
            "class": cls, "n_rounds": len(sink),
            "min_scaled_distance": min_d,
            "argmin": {"value": min_x, "dp": min_dp},
            "exact_half_hits": exact_halves,
            "double_cols": dcols,
        }
        if cls == MACHINE_DEP:
            bar = BARS[cls]
            report[name]["bar"] = bar
            if min_d <= bar:
                failures.append(
                    f"{name} [{cls}]: min scaled boundary distance "
                    f"{min_d:.3e} <= bar {bar:.0e} (value {min_x!r} at dp "
                    f"{min_dp})")
        elif exact_halves:
            warnings.append(
                f"{name} [{cls}]: {exact_halves} exact-half hit(s) "
                f"(e.g. {min_x!r} at dp {min_dp}) — safe while both engine "
                f"builds round half away from zero (empirically true "
                f"through r8); flag for review if a build changes")

    con.close()
    return (1 if failures else 0), {"failures": failures,
                                    "warnings": warnings,
                                    "entries": report}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", default=None,
                    help="write the full report to this path")
    args = ap.parse_args()
    rc, rep = audit(args.sf)
    for name, r in sorted(rep["entries"].items()):
        if "min_scaled_distance" in r:
            print(f"{name:28s} {r['class']:12s} n={r['n_rounds']:<7d} "
                  f"min_dist={r['min_scaled_distance']:.3e}")
        elif "min_gap" in r:
            print(f"{name:28s} {r['class']:12s} n={r['n_gaps']:<7d} "
                  f"min_gap={r['min_gap']:.3e}")
        else:
            print(f"{name:28s} {r['class']}")
    if args.json:
        Path(args.json).write_text(json.dumps(rep, indent=2))
    for w in rep["warnings"]:
        print("WARN:", w)
    if rep["failures"]:
        print("\nBOUNDARY AUDIT FAIL:")
        for f in rep["failures"]:
            print(" -", f)
        return 1
    print("\nBOUNDARY AUDIT PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
