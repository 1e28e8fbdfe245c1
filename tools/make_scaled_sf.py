#!/usr/bin/env python
"""Derive sf0.5 / sf1 bench inputs from the driver's sf0.1 fixtures.

The driver ships fixtures up to sf0.1 only; the scaling sweep (SCALING.md,
VERDICT r3 item 3) needs two more scale points to measure growth exponents.
These derived tables are BENCH-ONLY inputs — correctness always runs on the
driver's own parquet (TESTDATA.md).

Methodology — K deterministic copies of sf0.1 with structure-preserving,
cross-copy-decorrelating transforms (plain replication would plant K-wide
exact-dup clusters and the dedup/ANN sweeps would measure a pathological
corpus, not scale):

- every primary/foreign key shifts by copy·(max_key+1), so within-copy
  join and grouping structure is EXACTLY the sf0.1 structure;
- document text gets a per-copy token-suffix bijection (every alnum run
  gets 'q<copy>'): token-set relationships inside a copy are preserved
  bit-for-bit (near-dup pairs stay near-dup), while cross-copy shingle
  overlap drops to zero;
- embeddings get a per-copy cyclic dimension rotation: within-copy cosine
  geometry is identical, cross-copy cosines decorrelate;
- dimension tables (region..part) copy through unchanged.

Usage: python tools/make_scaled_sf.py [out_root]   (default bench_data/)
Deterministic: same input → byte-stable row content (parquet metadata may
differ).  Output: out_root/sf0.5 and out_root/sf1.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DIMS = ("region", "nation", "customer", "supplier", "part")
TARGETS = {"sf0.5": 5, "sf1": 10}


def _offsets(con: duckdb.DuckDBPyConnection) -> dict[str, int]:
    off = {}
    for table, col in (("documents", "doc_id"), ("embeddings", "vec_id"),
                       ("orders", "o_orderkey"), ("orders", "o_custkey"),
                       ("events", "event_id"), ("events", "user_id")):
        off[col] = con.execute(
            f"SELECT max({col}) + 1 FROM "
            f"read_parquet('{SRC}/{table}.parquet')").fetchone()[0]
    return off


def build(out_root: str) -> None:
    con = duckdb.connect()
    off = _offsets(con)
    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet')"
        " LIMIT 1").fetchone()[0]

    for sf, k in TARGETS.items():
        out = os.path.join(out_root, sf)
        os.makedirs(out, exist_ok=True)

        for t in DIMS:
            con.execute(f"""
                COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
                TO '{out}/{t}.parquet' (FORMAT PARQUET)""")

        con.execute(f"""
            COPY (
                SELECT doc_id + i * {off['doc_id']} AS doc_id,
                       txt AS text, lang, source,
                       length(txt) AS n_chars
                FROM (
                    SELECT d.*, t.i,
                           CASE WHEN t.i = 0 THEN text
                                ELSE regexp_replace(text, '([A-Za-z0-9]+)',
                                                    '\\1q' || t.i, 'g')
                           END AS txt
                    FROM read_parquet('{SRC}/documents.parquet') d
                    CROSS JOIN (SELECT unnest(range({k})) AS i) t
                )
            ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")

        # cyclic rotation by 7·copy dims (7 coprime to any power-of-two
        # dim, so distinct copies get distinct rotations)
        con.execute(f"""
            COPY (
                SELECT vec_id + i * {off['vec_id']} AS vec_id,
                       CASE WHEN r = 0 THEN embedding
                            ELSE (embedding[r+1:{dim}] || embedding[1:r])
                                 ::FLOAT[]
                       END AS embedding,
                       label
                FROM (
                    SELECT e.*, t.i, (t.i * 7) % {dim} AS r
                    FROM read_parquet('{SRC}/embeddings.parquet') e
                    CROSS JOIN (SELECT unnest(range({k})) AS i) t
                )
            ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

        con.execute(f"""
            COPY (
                SELECT o_orderkey + i * {off['o_orderkey']} AS o_orderkey,
                       o_custkey + i * {off['o_custkey']} AS o_custkey,
                       o_orderstatus, o_totalprice, o_orderdate,
                       o_orderpriority
                FROM read_parquet('{SRC}/orders.parquet')
                CROSS JOIN (SELECT unnest(range({k})) AS i) t
            ) TO '{out}/orders.parquet' (FORMAT PARQUET)""")

        con.execute(f"""
            COPY (
                SELECT l_orderkey + i * {off['o_orderkey']} AS l_orderkey,
                       l_partkey, l_suppkey, l_linenumber, l_quantity,
                       l_extendedprice, l_discount, l_tax, l_returnflag,
                       l_linestatus, l_shipdate
                FROM read_parquet('{SRC}/lineitem.parquet')
                CROSS JOIN (SELECT unnest(range({k})) AS i) t
            ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")

        con.execute(f"""
            COPY (
                SELECT event_id + i * {off['event_id']} AS event_id, ts,
                       user_id + i * {off['user_id']} AS user_id,
                       event_type, value, props
                FROM read_parquet('{SRC}/events.parquet')
                CROSS JOIN (SELECT unnest(range({k})) AS i) t
            ) TO '{out}/events.parquet' (FORMAT PARQUET)""")

        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')"
        ).fetchone()[0]
        print(f"{out}: documents={n}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else
          os.path.join(os.path.dirname(os.path.dirname(
              os.path.abspath(__file__))), "bench_data"))
