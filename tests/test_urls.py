"""URL extraction tests (ext/urls.py) — planted exactness and the
cross-engine regex contract; catalog parity is swept by
tests/test_oracle_parity.py (url_host_counts)."""

from __future__ import annotations

import duckdb
from pyspark.sql import Row, functions as F

from meeseeker_spark.ext.urls import HOST_RE, URL_RE, attach_urls, url_host_counts

SF = "/root/testdata/sf0.001"

PLANTED = [
    # (text, [extracted hosts])
    ("see https://a.example.com/p/1 and http://b.example.org ok",
     ["a.example.com", "b.example.org"]),
    # trailing sentence punctuation: the dot joins the path chars but the
    # host capture backtracks to the real TLD
    ("cite https://a.example.com.", ["a.example.com"]),
    # syntactic contract: scheme-less and upper-case-scheme refs don't hit
    ("www.example.com and HTTPS://c.example.com", []),
    # no TLD dot -> not a URL
    ("http://localhost/p", []),
    ("dual https://x.example.net/a https://x.example.net/b",
     ["x.example.net", "x.example.net"]),
]


def test_url_extraction_planted(spark):
    df = spark.createDataFrame(
        [Row(i=i, text=t) for i, (t, _) in enumerate(PLANTED)])
    out = {
        r["i"]: r["hosts"]
        for r in df.select(
            "i",
            F.transform(
                F.regexp_extract_all("text", F.lit(URL_RE), F.lit(0)),
                lambda u: F.lower(F.regexp_extract(u, HOST_RE, 1)),
            ).alias("hosts")).collect()
    }
    for i, (_, hosts) in enumerate(PLANTED):
        assert out[i] == hosts, PLANTED[i]


def test_cross_engine_url_agreement(spark):
    con = duckdb.connect()
    for text, _ in PLANTED:
        (durls,), = con.execute(
            f"SELECT regexp_extract_all(?, '{URL_RE}')", [text]).fetchall()
        df = spark.createDataFrame([Row(text=text)])
        surls = df.select(
            F.regexp_extract_all("text", F.lit(URL_RE), F.lit(0))
            .alias("u")).collect()[0]["u"]
        assert surls == durls, text
    con.close()


def test_url_host_counts_structure(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = {r["host"]: r for r in url_host_counts(docs).collect()}
    n = docs.count()
    mirror = out.pop("mirror.example.com")
    assert mirror["n_urls"] == mirror["n_docs"] == sum(
        1 for i in range(n) if i % 5 == 0)
    # the 23x3 grid: every remaining host is h{k}.example.{tld} and the
    # per-host totals sum to one primary URL per doc
    assert all(h.startswith("h") and ".example." in h for h in out)
    assert sum(r["n_urls"] for r in out.values()) == n
    expected_hosts = {
        f"h{i % 23}.example.{['com', 'org', 'net'][i % 3]}" for i in range(n)}
    assert set(out) == expected_hosts
