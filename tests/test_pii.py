"""PII detection/redaction tests (ext/pii.py) — planted exactness, the
cross-engine regex contract, and corpus-level masking completeness.

The catalog entries' DuckDB-exact parity is swept by
tests/test_oracle_parity.py (pii_scan / pii_redacted_docs); these tests
pin the semantics the hash alone can't explain: which substrings hit,
what the masked text looks like, and that Spark's java.util.regex and
DuckDB's RE2 agree on the hostile inputs where dialects could diverge.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import Row, functions as F

from meeseeker_spark.ext.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    attach_pii,
    pii_counts,
    redact_pii,
)

SF = "/root/testdata/sf0.001"

PLANTED = [
    # (text, emails, ips, phones, redacted)
    ("mail a.b-c%d@sub.example.co.uk now", 1, 0, 0, "mail <EMAIL> now"),
    ("hosts 10.0.0.1 and 192.168.255.254", 0, 2, 0, "hosts <IP> and <IP>"),
    ("call 415-555-0142 or 415-555-0143.", 0, 0, 2, "call <PHONE> or <PHONE>."),
    ("none here: a@b (no tld dot), 1.2.3 (three octets), 12-345-6789", 0, 0, 0,
     "none here: a@b (no tld dot), 1.2.3 (three octets), 12-345-6789"),
    # syntactic over-match contract: invalid octets still flag (Dolma-style
    # scrub over-masks rather than leaks)
    ("bogus 999.999.999.999 ip", 0, 1, 0, "bogus <IP> ip"),
    # leftmost-first on a 5-octet run: the match is the first 4 octets
    ("run 1.2.3.4.5 end", 0, 1, 0, "run <IP>.5 end"),
    # mixed classes in one doc, order email -> ip -> phone
    ("u@example.com at 8.8.8.8 call 212-555-0100", 1, 1, 1,
     "<EMAIL> at <IP> call <PHONE>"),
    # STAGED counting: an IP-shaped local part is consumed by the email
    # mask and must NOT also count as an IP (counts == replacements)
    ("reach 1.2.3.4@example.com now", 1, 0, 0, "reach <EMAIL> now"),
    ("dial 555-123-4567@mail.example.org x", 1, 0, 0, "dial <EMAIL> x"),
]


def test_pii_counts_and_redaction_planted(spark):
    df = spark.createDataFrame(
        [Row(i=i, text=t) for i, (t, *_) in enumerate(PLANTED)])
    e, ip, p = pii_counts(F.col("text"))
    out = {
        r["i"]: r
        for r in df.select(
            "i", e.alias("e"), ip.alias("ip"), p.alias("p"),
            redact_pii(F.col("text")).alias("red")).collect()
    }
    for i, (_, ne, ni, np_, red) in enumerate(PLANTED):
        r = out[i]
        assert (r["e"], r["ip"], r["p"]) == (ne, ni, np_), PLANTED[i]
        assert r["red"] == red, PLANTED[i]


def test_cross_engine_regex_agreement(spark):
    """Spark (java.util.regex) and DuckDB (RE2) must agree on counts AND
    masked bytes for every planted case — the dialect-portability
    contract the module docstring claims."""
    con = duckdb.connect()
    for text, *_ in PLANTED:
        (de, di, dp, dred), = con.execute(
            f"""WITH t AS (
                  SELECT ? AS raw,
                         regexp_replace(?, '{EMAIL_RE}', '<EMAIL>', 'g')
                             AS after_email
                ),
                t2 AS (
                  SELECT raw, after_email,
                         regexp_replace(after_email, '{IPV4_RE}', '<IP>', 'g')
                             AS after_ip
                  FROM t
                )
                SELECT len(regexp_extract_all(raw, '{EMAIL_RE}')),
                       len(regexp_extract_all(after_email, '{IPV4_RE}')),
                       len(regexp_extract_all(after_ip, '{PHONE_RE}')),
                       regexp_replace(after_ip, '{PHONE_RE}', '<PHONE>', 'g')
                FROM t2""",
            [text, text]).fetchall()
        df = spark.createDataFrame([Row(text=text)])
        e, ip, p = pii_counts(F.col("text"))
        r = df.select(e.alias("e"), ip.alias("i"), p.alias("p"),
                      redact_pii(F.col("text")).alias("red")).collect()[0]
        assert (r["e"], r["i"], r["p"], r["red"]) == (de, di, dp, dred), text
    con.close()


def test_attach_pii_cycle_and_masking_completeness(spark):
    """attach_pii plants the documented 7-cycle (email+IP / IP / phone /
    clean) and redact_pii removes EVERY hit: re-scanning the masked
    corpus finds zero PII of any class."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t = attach_pii(docs)
    e, ip, p = pii_counts(F.col("text_pii"))
    per = t.select("doc_id", e.alias("e"), ip.alias("i"), p.alias("p"))
    rows = {r["doc_id"]: r for r in per.collect()}
    assert rows
    for doc_id, r in rows.items():
        m = doc_id % 7
        if m == 0:
            expected = (1, 1, 0)
        elif m <= 2:
            expected = (0, 1, 0)
        elif m <= 4:
            expected = (0, 0, 1)
        else:
            expected = (0, 0, 0)
        assert (r["e"], r["i"], r["p"]) == expected, (doc_id, tuple(r))

    re_, ri, rp = pii_counts(redact_pii(F.col("text_pii")))
    residue = t.select(
        (F.sum(re_) + F.sum(ri) + F.sum(rp)).alias("left")).collect()[0]
    assert residue["left"] == 0


def test_cross_engine_regex_fuzz(spark):
    """Seeded 300-case fuzz over hostile fragment compositions (@-runs,
    partial IPs, stray schemes, digit soup): Spark and DuckDB must agree
    on staged counts, masked bytes AND extracted URLs for every case —
    the arbitrary-text half of the dialect-portability contract the
    planted cases can't cover (precedent: the r1 keys.py fnmatch fuzz)."""
    import random

    from meeseeker_spark.ext.urls import URL_RE

    rng = random.Random(20260815)
    frags = ["@", ".", "-", " ", "..", "@@", "http://", "https://", "://",
             "example", "com", "org", "a", "Z", "9", "123", "4567", "55",
             "555-", "(", ")", "10.0", "0.1", "%", "+", "_", "/p/", "www.",
             "ex-a.b", "1.2.3.4", "user@", ".co.uk", "#", "!", "\t", "\n"]
    cases = ["".join(rng.choice(frags) for _ in range(rng.randint(1, 14)))
             for _ in range(300)]

    df = spark.createDataFrame(
        [Row(i=i, text=t) for i, t in enumerate(cases)])
    e, ip, p = pii_counts(F.col("text"))
    srows = {r["i"]: r for r in df.select(
        "i", e.alias("e"), ip.alias("i2"), p.alias("p"),
        redact_pii(F.col("text")).alias("red"),
        F.regexp_extract_all("text", F.lit(URL_RE), F.lit(0))
        .alias("urls")).collect()}

    con = duckdb.connect()
    for i, t in enumerate(cases):
        (de, di, dp, dred, durls), = con.execute(
            f"""WITH t AS (SELECT ? AS raw,
                  regexp_replace(?, '{EMAIL_RE}', '<EMAIL>', 'g') AS ae),
                t2 AS (SELECT raw, ae,
                  regexp_replace(ae, '{IPV4_RE}', '<IP>', 'g') AS ai FROM t)
                SELECT len(regexp_extract_all(raw, '{EMAIL_RE}')),
                       len(regexp_extract_all(ae, '{IPV4_RE}')),
                       len(regexp_extract_all(ai, '{PHONE_RE}')),
                       regexp_replace(ai, '{PHONE_RE}', '<PHONE>', 'g'),
                       regexp_extract_all(raw, '{URL_RE}')
                FROM t2""", [t, t]).fetchall()
        r = srows[i]
        assert (r["e"], r["i2"], r["p"], r["red"], r["urls"]) == \
            (de, di, dp, dred, durls), repr(t)
    con.close()


def test_attach_pii_matches_sql_fragment(spark):
    """attach_pii and ATTACH_PII_SQL must produce byte-identical spliced
    text for every doc — the exactness root the staged counts and the
    redacted-md5 hash both stand on."""
    from meeseeker_spark.ext.pii import ATTACH_PII_SQL

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s = {r["doc_id"]: r["text_pii"]
         for r in attach_pii(docs).select("doc_id", "text_pii").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    d = dict(con.execute(
        f"SELECT doc_id, {ATTACH_PII_SQL} FROM documents").fetchall())
    con.close()
    assert s == d and len(s) == 500


def test_attach_urls_matches_sql_fragment(spark):
    from meeseeker_spark.ext.urls import ATTACH_URLS_SQL, attach_urls

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s = {r["doc_id"]: r["text_urls"]
         for r in attach_urls(docs).select("doc_id", "text_urls").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    d = dict(con.execute(
        f"SELECT doc_id, {ATTACH_URLS_SQL} FROM documents").fetchall())
    con.close()
    assert s == d and len(s) == 500


def test_redacted_docs_excludes_clean(spark):
    from meeseeker_spark import catalog

    out = catalog.ENTRIES["pii_redacted_docs"].spark(spark, SF)
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert ids and all(i % 7 <= 4 for i in ids)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    expected = sum(1 for i in range(n_docs) if i % 7 <= 4)
    assert len(ids) == expected


def test_pii_redaction_streams(spark, tmp_path_factory):
    """The masking rewrite is stateless, so the identical plan serves
    Structured Streaming in append mode (the continuous-ingest scrub
    stage) and matches the batch entry row-for-row."""
    import os

    from meeseeker_spark import catalog
    from meeseeker_spark.ext.pii import pii_redacted_docs

    d = tmp_path_factory.mktemp("piistream")
    batch = sorted(
        tuple(r)
        for r in catalog.ENTRIES["pii_redacted_docs"].spark(spark, SF).collect())

    schema = spark.read.parquet(f"{SF}/documents.parquet").schema
    srcdir = d / "documents"
    os.makedirs(srcdir, exist_ok=True)
    os.symlink(f"{SF}/documents.parquet", srcdir / "documents.parquet")

    got = []
    q = (pii_redacted_docs(spark.readStream.schema(schema).parquet(str(srcdir)))
         .writeStream.outputMode("append")
         .foreachBatch(lambda bdf, _id: got.extend(bdf.collect()))
         .option("checkpointLocation", str(d / "ckpt"))
         .trigger(availableNow=True).start())
    try:
        # awaitTermination returns False on timeout without raising — a
        # partially-filled `got` must fail loudly, not as a row-diff
        assert q.awaitTermination(120), "streaming query did not finish"
    finally:
        q.stop()
    assert sorted(tuple(r) for r in got) == batch and batch


def test_pii_plan_is_narrow(spark):
    """pii_redacted_docs must stay a scan + codegen projection/filter:
    no exchange anywhere (the 100 TB claim in the module docstring)."""
    from meeseeker_spark import catalog

    plan = catalog.ENTRIES["pii_redacted_docs"].spark(
        spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
