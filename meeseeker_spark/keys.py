"""Composite keys and Redis-glob → Catalyst-predicate translation.

The reference's only index is the composite string key
``chain:block_num:trx_id:trx_index:op_type`` (mainnet, 5 segments;
/root/reference/lib/meeseeker/block_follower_job.rb:19,45) or
``chain:block_num:trx_id:trx_index:contract:action`` (sidechain, 6 segments;
steem_engine/follower_job.rb:57), scanned with Redis globs like
``hive:*:vote`` (README.md:250-309).

Here key segments are real columns; the glob becomes column predicates that
Catalyst pushes into the parquet scan (partition pruning on ``chain``,
min/max row-group pruning on ``block_num``).  Globs with intra-segment
wildcards fall back to an rlike residual on the derived ``key`` column —
still correct, just not prunable beyond whatever segment predicates were
extracted.
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import Column, functions as F

MAINNET_SEGMENTS = ("chain", "block_num", "trx_id", "trx_index", "op_type")
SIDECHAIN_SEGMENTS = ("chain", "block_num", "trx_id", "trx_index",
                      "contract", "action")

_HEX40 = re.compile(r"^[0-9a-f]{40}$")


def _fits_long(digits: str) -> bool:
    """True when a digit string fits a 64-bit signed column — a larger
    literal can't equal any bigint/int segment, and passing it through
    py4j as a Python int raises NumberFormatException server-side (r12
    review: a 40-digit middle crashed the translator instead of simply
    not matching numerically)."""
    return int(digits) <= 0x7FFF_FFFF_FFFF_FFFF


def key_column(sidechain: bool = False) -> Column:
    """Derived composite key, kept for wire-compat with reference consumers."""
    segs = SIDECHAIN_SEGMENTS if sidechain else MAINNET_SEGMENTS
    return F.concat_ws(":", *[F.col(s) for s in segs])


def parse_key(key: str) -> dict[str, str]:
    """Destructure a composite key (the reference's test invariant:
    ``n, b, t, i, o = key.split(':')``, meeseeker_test.rb:38)."""
    parts = key.split(":")
    if len(parts) == 5:
        names = MAINNET_SEGMENTS
    elif len(parts) == 6:
        names = SIDECHAIN_SEGMENTS
    else:
        raise ValueError(f"bad key (want 5 or 6 segments): {key!r}")
    return dict(zip(names, parts))


def _glob_to_regex(pattern: str) -> str:
    # Redis glob: * any chars (including ':'), ? one char, [..] class.
    # Spark RLIKE has Java find() substring semantics — fnmatch.translate
    # only \Z-anchors the end, so a bare residual could match mid-string
    # (pattern 'vote' inside key '...:unvote').  Anchor both ends.
    # Redis negates classes with [^..]; fnmatch only honors [!..] and
    # would treat '^' as a literal set member — matching exactly the
    # rows Redis excludes (r15 review).
    return "^(?:" + fnmatch.translate(pattern.replace("[^", "[!")) + ")$"


def _split_segments(pattern: str) -> list[str]:
    """Split a glob on ':' EXCEPT inside a [...] class (r15 review: a
    class body containing ':' — 'hive:*:[a:b]' — split naively, and the
    fragment after the class was bound as a bogus op_type equality that
    dropped every row the glob matches).

    Class scanning mirrors ``fnmatch.translate`` exactly — the dialect
    this module implements (see glob_to_filter's GLOB DIALECT note) —
    because the rlike residual IS fnmatch's regex and a positional
    predicate built from a DIFFERENT parse can contradict it (r15
    second review): in fnmatch a ']' directly after '[' / '[!' / '[^'
    is a literal class member, not the terminator — '[]:]' is a class
    matching ']' or ':', and closing it at the first ']' mis-counts the
    segments and binds trx_index against the literal ']7', lit(False)
    for keys the residual matches.  An unterminated '[' is a literal
    character (fnmatch again), so the ':'s after it are real
    separators."""
    segs: list[str] = []
    buf: list[str] = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "[":
            j = i + 1
            if j < n and pattern[j] in "!^":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1          # leading ']' is a literal member
            k = pattern.find("]", j)
            if k < 0:
                buf.append(ch)  # unterminated class: literal '['
                i += 1
            else:
                buf.append(pattern[i:k + 1])
                i = k + 1
            continue
        if ch == ":":
            segs.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    segs.append("".join(buf))
    return segs


def schedule_glob_filter(pattern: str) -> Column:
    """Glob filter for the 4-segment witness-schedule keys
    (``{chain}:witness:schedule:{n}`` — query.ScheduleStore).
    ``glob_to_filter``'s positional bindings assume 5/6-segment ops
    keys, so an anchored literal tail would bind ``op_type == tail``
    and drop every schedule row (their trx columns are NULL by design —
    r15 review: an exact-key scan of a schedule key returned empty).
    Here: chain prune when the head is literal + the exact anchored
    residual — correct for every glob over this key shape."""
    if "\\" in pattern:
        raise ValueError(_BACKSLASH_MSG)
    segs = _split_segments(pattern)
    residual = F.col("key").rlike(_glob_to_regex(pattern))
    head = segs[0] if segs else ""
    if head and not any(ch in head for ch in "*?["):
        return (F.col("chain") == head) & residual
    return residual


_BACKSLASH_MSG = (
    "Redis backslash escapes are not supported by this glob translator "
    "(fnmatch has no escape syntax — the pattern would be silently "
    "mis-translated); rewrite the literal as a [c] class instead")


def glob_to_filter(pattern: str) -> Column:
    """Translate a Redis key glob into a Catalyst predicate.

    Exact translation when every segment is a literal or a bare ``*``
    (the only shapes the reference README documents); otherwise extracts
    whatever segment predicates it can and ANDs an rlike residual on the
    stored ``key`` column so semantics stay glob-exact.

    Soundness note: a Redis ``*`` matches ``:`` too, so segment-count
    alignment is only knowable when the chain segment is a literal
    (mainnet names vs ``*_engine`` names). A wildcarded chain segment
    means a 5-segment pattern can match 6-segment engine keys with a
    ``*`` absorbing a colon — positional predicates would silently drop
    those rows — so that case degrades to a pure rlike on ``key``
    (matching the reference: a leading-* SCAN is a full scan anyway).

    GLOB DIALECT (the one home for this contract): the implemented
    semantics are Python ``fnmatch``'s, with Redis's ``[^..]`` negation
    spelling normalized to fnmatch's ``[!..]`` first — that normalized
    fnmatch regex IS the residual, and the segment splitter mirrors the
    same scanner, so the two can never contradict each other.  For the
    literal/bare-``*`` shapes the reference README documents (and every
    key alphabet the stores actually hold) this is exactly Redis.  The
    engines differ only in class corners, resolved in fnmatch's favor:
    real Redis (util.c ``stringmatchlen``) closes a class at the FIRST
    ``]`` — so a leading ``]`` leaves an empty class matching nothing —
    while fnmatch/POSIX treat a ``]`` directly after ``[`` / ``[!`` /
    ``[^`` as a literal member; Redis negates only with ``^`` (a ``!``
    is a literal member), fnmatch only with ``!``; Redis honors
    backslash escapes, which this translator REFUSES loudly (see
    _BACKSLASH_MSG) rather than mistranslate.
    """
    if "\\" in pattern:
        raise ValueError(_BACKSLASH_MSG)
    segs = _split_segments(pattern)
    residual = F.col("key").rlike(_glob_to_regex(pattern))

    head = segs[0]
    if any(ch in head for ch in "*?["):
        return residual
    sidechain = head.endswith("_engine")
    names = SIDECHAIN_SEGMENTS if sidechain else MAINNET_SEGMENTS
    if len(segs) > len(names):
        return residual

    preds: list[Column] = []
    exact = True

    if len(segs) == len(names):
        # chain literal + equal counts: no spare colons for a '*' to
        # absorb, so alignment is forced positional
        # positional: each glob segment lines up with one key segment
        for name, seg in zip(names, segs):
            if seg == "*":
                continue
            if any(ch in seg for ch in "*?["):
                exact = False
                continue
            col = F.col(name)
            if name in ("block_num", "trx_index"):
                if not seg.isdigit() or not _fits_long(seg):
                    # numeric key segments are always rendered as digits
                    # and fit int64, so a non-digit or oversized literal
                    # here matches NOTHING (found by the unified-surface
                    # fuzz: int() used to raise; oversized ints crash
                    # py4j server-side)
                    return F.lit(False)
                preds.append(col == int(seg))
            else:
                preds.append(col == seg)
    else:
        # fewer segments than the key: only a '*' can absorb the missing
        # ':' separators (Redis MATCH is full-string).  Without one, a
        # short pattern like 'hive:vote' matches NOTHING — '?' and [..]
        # eat exactly one char, so they can absorb at most one colon each;
        # a pure literal can absorb none.
        if not any("*" in s for s in segs):
            if not any(ch in pattern for ch in "?["):
                return F.lit(False)   # literal with too few segments
            return residual           # ?/[..] might still eat a ':'
        # '*' present: anchor literal head/tail segments, classify literal
        # middles by shape.
        exact = all(s == "*" or not any(ch in s for ch in "*?[") for s in segs)
        head, tail = segs[0], segs[-1]
        if head != "*" and not any(ch in head for ch in "*?["):
            preds.append(F.col("chain") == head)
        if tail != "*" and not any(ch in tail for ch in "*?["):
            if sidechain:
                preds.append(F.col("action") == tail)
            else:
                preds.append(F.col("op_type") == tail)
        # the PENULTIMATE literal is positionally certain — but ONLY when
        # the last segment is itself a literal: then the pattern tail
        # ':<penult>:<tail>' is end-anchored, and since segment values
        # contain no ':', a matching key's second-to-last segment IS the
        # penult — contract on the sidechain (any name: the design is
        # data-derived, new contracts must need no code change,
        # README.md:351), trx_index on mainnet (always digits; a non-digit
        # there can't bind positionally and falls to the residual).  A
        # wildcard tail un-anchors the penult (the '*' may absorb any
        # number of trailing segments), so it stays a plain middle.
        middles = segs[1:-1]
        tail_literal = tail != "*" and not any(ch in tail for ch in "*?[")
        if len(segs) >= 3 and tail_literal:
            penult = segs[-2]
            if penult != "*" and not any(c in penult for c in "*?["):
                if sidechain:
                    preds.append(F.col("contract") == penult)
                    middles = segs[1:-2]
                elif penult.isdigit():
                    if not _fits_long(penult):
                        # positionally certain trx_index, but no int
                        # column can hold it: the pattern matches nothing
                        return F.lit(False)
                    preds.append(F.col("trx_index") == int(penult))
                    middles = segs[1:-2]
                else:
                    # mainnet penult before a literal tail is
                    # positionally trx_index, which is ALWAYS digits —
                    # a literal non-digit here matches nothing (r15
                    # review: a 40-hex penult fell through to the
                    # middle loop, bound trx_id == hex with NO residual,
                    # and returned rows the glob cannot match)
                    return F.lit(False)
        for seg in middles:
            if seg == "*" or any(ch in seg for ch in "*?["):
                continue
            if seg.isdigit():
                # a bare digit middle is positionally ambiguous — the glob
                # matches it against block_num OR trx_index — so bind the
                # disjunction (still prunes: both are min/max-tracked) and
                # let the residual restore exactness; an int64-oversized
                # literal can't equal either numeric column, so its
                # disjunct is simply absent
                pred = F.lit(False)
                if _fits_long(seg):
                    pred = (F.col("block_num") == int(seg)) \
                        | (F.col("trx_index") == int(seg))
                if _HEX40.match(seg):
                    # 40 decimal digits is also a syntactically valid
                    # trx_id (hex with no a-f) — astronomically rare but
                    # the ANDed pred would DROP such a row, and the
                    # residual can't restore an over-constrained pred
                    # (r12 review)
                    pred = pred | (F.col("trx_id") == seg)
                if sidechain:
                    # contract/action names are DATA-DERIVED (new
                    # contracts must need no code change) — a contract
                    # literally named '123' would collide with the
                    # numeric binding, so the disjunction widens to the
                    # name columns; the residual keeps it glob-exact
                    pred = pred | (F.col("contract") == seg) \
                        | (F.col("action") == seg)
                preds.append(pred)
                exact = False
            elif _HEX40.match(seg):
                if sidechain:
                    # same data-derived-name hazard: a 40-hex contract/
                    # action name is legal, so the binding is a
                    # disjunction + residual, not a bare trx_id equality
                    preds.append((F.col("trx_id") == seg)
                                 | (F.col("contract") == seg)
                                 | (F.col("action") == seg))
                    exact = False
                else:
                    # mainnet is provably positional: op_type is a fixed
                    # protocol vocabulary (never 40-hex) and the numeric
                    # segments render as digits, so a non-all-digit
                    # 40-hex middle can only equal trx_id
                    preds.append(F.col("trx_id") == seg)
        # middles that are neither digits nor hex can't be positionally
        # resolved → need the residual
        unresolved = [s for s in middles
                      if s != "*" and not s.isdigit() and not _HEX40.match(s)
                      and not any(ch in s for ch in "*?[")]
        if unresolved:
            exact = False

    if not exact:
        preds.append(residual)

    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out
