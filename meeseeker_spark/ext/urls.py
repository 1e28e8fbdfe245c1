"""URL extraction and host-level stats over document text
(beyond-reference LLM-pipeline stage; SURVEY §2 F4 family).

Web-corpus pipelines (C4, CCNet, RefinedWeb §3.1) filter and cap by the
*domain* a page or citation points at; the prerequisite is pulling URLs
out of free text and normalizing them to a host.  This module provides

- ``URL_RE`` / ``HOST_RE`` — the extractor and the host capture;
- ``attach_urls`` — deterministic in-plan URL splice for the synthetic
  driver corpus (fixture text contains no URLs — same honesty device as
  ext/pii.attach_pii, with a byte-identical SQL twin);
- ``url_host_counts`` — the catalog query body: per normalized host,
  total URL mentions and distinct citing documents.

Dialect portability: same contract as ext/pii — only the regex subset
where java.util.regex (Spark) and RE2 (DuckDB) agree (character classes,
bounded repetition, one plain capture group; no backslashes, no
lookaround).  Extraction is *syntactic*: no IDN/percent-decoding — a
scrub-stage extractor over free text, not an RFC 3986 parser.

Scale shape (the 100 TB story): extraction is a regexp projection inside
whole-stage codegen; the explode multiplies rows only by URLs-per-doc
(small constant); the aggregate groups on the host — web-domain
distributions are Zipfian, but count+count_distinct over a skinny
(host, doc_id) projection is absorbed by map-side partial aggregation
before the one small exchange.  The text column never enters a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: URL extractor — scheme, dotted host with a TLD, optional path chars.
URL_RE = "https?://[A-Za-z0-9.-]+[.][A-Za-z]{2,}[A-Za-z0-9./_-]*"

#: Host capture (group 1) applied to an extracted URL.
HOST_RE = "https?://([A-Za-z0-9.-]+[.][A-Za-z]{2,})"


def attach_urls(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Append deterministic URLs to ``text`` in-plan → column ``text_urls``.

    Every doc cites one host from a 23×3 grid (coprime with the
    fixture's 20-source assignment) and every 5th doc additionally cites
    a shared mirror host — so host counts mix sources and some docs are
    multi-URL.  Must stay byte-identical to ``ATTACH_URLS_SQL``.
    """
    i = F.col(id_col)
    tld = (F.when(F.pmod(i, F.lit(3)) == 0, F.lit("com"))
           .when(F.pmod(i, F.lit(3)) == 1, F.lit("org"))
           .otherwise(F.lit("net")))
    primary = F.concat(
        F.lit(" see https://h"), F.pmod(i, F.lit(23)).cast("string"),
        F.lit(".example."), tld, F.lit("/p/"), i.cast("string"))
    mirror = F.when(
        F.pmod(i, F.lit(5)) == 0,
        F.concat(F.lit(" and http://mirror.example.com/d/"),
                 i.cast("string"))).otherwise(F.lit(""))
    return df.withColumn(
        "text_urls", F.concat(F.col(text_col), primary, mirror))


#: DuckDB twin of :func:`attach_urls` (expression over ``doc_id``/``text``).
ATTACH_URLS_SQL = """
    text || ' see https://h' || CAST(doc_id % 23 AS VARCHAR)
         || '.example.' || CASE doc_id % 3
              WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END
         || '/p/' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 5 = 0
                 THEN ' and http://mirror.example.com/d/'
                      || CAST(doc_id AS VARCHAR)
                 ELSE '' END
"""


def hosts_in_text(df: DataFrame, key_col: str,
                  text_col: str = "text") -> DataFrame:
    """(key, host) — one row per URL extracted from ``text_col``,
    normalized to a lowercase host.  THE shared extraction projection:
    ``url_host_counts`` and ``ext.graph.host_edges`` both build on it
    (r11 review — two copies of the regex pipeline would let an IDN or
    normalization fix silently diverge the two host universes).
    Codegen regexp extract + explode; the text column never leaves the
    map side."""
    urls = df.select(
        F.col(key_col),
        F.explode(
            F.regexp_extract_all(text_col, F.lit(URL_RE), F.lit(0))
        ).alias("_url"))
    return urls.select(
        key_col,
        F.lower(F.regexp_extract("_url", HOST_RE, 1)).alias("host"))


def url_host_counts(docs: DataFrame) -> DataFrame:
    """Per-host citation stats: total URL mentions and distinct citing
    docs.  Skinny (host, doc_id) shuffle; text never leaves the map side.

    Plan note (SCALE.md shows 2 exchanges — deliberate): the single
    distinct-agg plans as partial-agg on (host, doc_id) then on host,
    both map-side combined.  The 1-exchange alternative,
    size(collect_set(doc_id)), was REJECTED here: web-domain counts are
    Zipfian, so a head host would buffer millions of doc_ids in one
    aggregation buffer — the r1 collect_set trick (d3_ref_join) is only
    right when per-key sets are bounded-small."""
    return (
        hosts_in_text(attach_urls(docs), "doc_id", "text_urls")
        .groupBy("host")
        .agg(F.count("*").alias("n_urls"),
             F.count_distinct("doc_id").alias("n_docs"))
    )
