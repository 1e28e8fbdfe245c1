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
2. **machine-dep distance bar** — entries whose round() inputs can
   differ across machines (non-correctly-rounded libm: ln/pow/exp —
   sqrt IS correctly rounded; row-order-dependent float aggregation)
   must keep every rounded value's scaled distance > 1e-4.  Calibration:
   drift analysis bounds cross-machine differences at ~1e-13 value
   units (1e-9 scaled at 4 dp), and bm25's min of 1.4e-4 survived the
   r8 driver — the bar sits 10^5 above the physics and just under the
   tightest empirical survivor.
3. **ieee-exact record** — entries whose round() inputs are
   bit-identical on any IEEE 754 machine (integer ratios, fixed-order
   sums/products of unmodified parquet doubles, sqrt) are certified by
   LOCAL parity alone; the audit records their min distance and WARNS
   on exact-half hits (flip would require a round-half-even engine
   build — empirically excluded by gopher_rules' green exact halves)
   without failing.
4. **Order-gap checks** — surfaces graded as integer ranks over raw
   doubles (the r9 perplexity redesign): ranks replay exactly iff no
   two distinct sort keys sit within cross-engine drift of each other,
   so the minimum adjacent gap must clear 1e-9 (drift is ~1e-13).

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
    "bm25_topk": MACHINE_DEP,          # ln in the idf term
    "bm25_batch_topk": MACHINE_DEP,    # ln in the idf term
    "tfidf_top_terms": MACHINE_DEP,    # ln(n/df)
    "dsir_select": MACHINE_DEP,        # ln ratios + Gumbel -ln(-ln(u))
    "label_centroids": MACHINE_DEP,    # avg over rows (merge order)
    "channel_volume": MACHINE_DEP,     # sum(value) over rows
    "pricing_summary": MACHINE_DEP,    # sums/avgs over rows
    "temperature_sample": MACHINE_DEP,  # pow(size, 1/T)
    # exact-integer / fixed-order arithmetic (cross-engine identical
    # inputs; only exact-half policy skew can flip)
    "asof_last_purchase": IEEE_EXACT,  # round of an unmodified parquet double
    "jaccard_ngram_pairs": IEEE_EXACT,
    "near_dup_pairs": IEEE_EXACT,
    "leakage_safe_split": IEEE_EXACT,
    "dedup_components": IEEE_EXACT,    # threshold-feeding jaccard rounds
    "dedup_weights": IEEE_EXACT,       # 1/integer cluster size (r9 wave 5)
    "ngram_novelty": IEEE_EXACT,       # int/int ratio (r9 wave 5)
    "blocklist_screen": IEEE_EXACT,    # int/int ratio + threshold (r9 wave 5)
    "training_funnel": IEEE_EXACT,     # md5 keeps; 6-dp round of fixed-order
    #                                    factor arithmetic on exact inputs
    "gopher_rules": IEEE_EXACT,
    "knn_topk": IEEE_EXACT,            # sqrt is correctly rounded; dot is fixed-order
    "nai_amounts": IEEE_EXACT,         # round(parquet_double * 100)
}

BARS = {MACHINE_DEP: 1e-4}  # ieee-exact: warn-only (see module docstring)

# graded oracles must not interpolate percentiles (check 1 above)
_INTERPOLATION = re.compile(
    r"\b(quantile_cont|quantile_disc|percentile_cont|percentile_disc"
    r"|quantile|percentile|approx_quantile|median)\s*\(", re.I)

# Ordering surfaces graded as integer ranks over raw (unrounded)
# doubles: min adjacent gap in the sort key must exceed the bar or two
# engines may disagree on the order.  SQL must return one column `gap`.
ORDER_GAP_CHECKS = {
    "perplexity_buckets": {
        "bar": 1e-9,
        "sql": """
            WITH words AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text),
                                   '[^a-z0-9]+'), x -> x <> '') AS w
                FROM documents),
            bi AS (
                SELECT doc_id, u.w1 AS w1, u.bg AS bg
                FROM (SELECT doc_id,
                             unnest(list_transform(range(1, greatest(len(w), 1)),
                                 i -> {'w1': w[i], 'bg': w[i] || ' ' || w[i+1]}))
                                 AS u
                      FROM words)),
            uni AS (SELECT w1, count(*) AS u
                    FROM (SELECT unnest(w) AS w1 FROM words) GROUP BY w1),
            bcounts AS (SELECT bg, count(*) AS b FROM bi GROUP BY bg),
            vocab AS (SELECT count(*)::DOUBLE AS v FROM uni),
            per_doc AS (SELECT doc_id, w1, bg, count(*) AS c
                        FROM bi GROUP BY doc_id, w1, bg),
            scored AS (
                SELECT p.doc_id,
                       -sum(c * (ln(b + 0.5) - ln(u + 0.5 * v))) / sum(c)
                           AS xent
                FROM per_doc p
                JOIN bcounts USING (bg) JOIN uni USING (w1), vocab
                GROUP BY p.doc_id)
            SELECT xent - lag(xent) OVER (ORDER BY xent) AS gap
            FROM scored QUALIFY gap IS NOT NULL
        """,
        # NB the filter keeps ZERO gaps: an exact tie is the single
        # most dangerous case for rank replay (bit-equal here, 1-ulp
        # split in the other engine's sum order → the doc_id tiebreak
        # and the value order can disagree).  gap == 0 must FAIL the
        # bar — a fixture with duplicate-xent docs cannot be graded by
        # rank without a tie-collapsing redesign.
    },
}

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
        has_round = bool(re.search(r"\bround\s*\(", e.sql, flags=re.I))
        dcols = double_cols(con, e.sql)
        cls = CLASSES.get(name)
        if not has_round:
            # doubles with no round must be REGISTERED passthroughs
            # (raw parquet values, bit-identical cross-engine) — a
            # computed-but-unrounded double (bare ln()/float-sum
            # projection) is machine-dependent and must not reach the
            # driver hash unaudited
            if dcols:
                unregistered = [c for c in dcols
                                if c not in PASSTHROUGH_OK.get(name, set())]
                if unregistered:
                    failures.append(
                        f"{name}: double column(s) {unregistered} have no "
                        f"round() and are not registered raw passthroughs "
                        f"in PASSTHROUGH_OK — classify or redesign")
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

    for name, spec in ORDER_GAP_CHECKS.items():
        gaps = [r[0] for r in con.execute(spec["sql"]).fetchall()]
        min_gap = min(gaps) if gaps else float("inf")
        report[f"{name}::order_gap"] = {
            "class": "order-gap", "bar": spec["bar"], "min_gap": min_gap,
            "n_gaps": len(gaps),
        }
        if min_gap <= spec["bar"]:
            failures.append(f"{name}: min adjacent sort-key gap {min_gap:.3e}"
                            f" <= bar {spec['bar']:.0e} — integer ranks may "
                            f"not replay across engines")

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
