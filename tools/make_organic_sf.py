#!/usr/bin/env python
"""Generate ORGANIC documents/embeddings scale points (VERDICT r5 item 7).

The sf0.5/sf1 sweep inputs under bench_data/ are derived from the
driver's sf0.1 by structure-preserving replication (make_scaled_sf.py).
Replication preserves within-copy structure exactly but fixes the
CROSS-copy relationship by construction, so a residual worry stands:
do the measured growth exponents reflect the generative process, or an
artifact of replication?  This tool answers it by generating fresh data
from the same generative CLASS as the driver fixtures — measured from
the shipped SFs, not copied from them:

- ``documents``: 30-word uniform vocabulary (the driver's own token
  list, read off sf0.1), doc length ~ U[10, 100] words, lang multinomial
  (en .41 / zh .15 / es .15 / fr .15 / de .14), source ~ U{src0..src19},
  5% of docs planted as a near-dup copy of an earlier doc with the
  ``" dup"`` suffix appended (the driver's own planting scheme — see the
  250/5000 marked docs at sf0.1 and their long-prefix partners), plus
  ~0.16% exact-dup copies (8 groups per 5000 at sf0.1).
- ``embeddings``: iid uniform-on-sphere float32 vectors, dim 64, label
  ~ U{0..9} (measured: within-label mean cosine ≈ cross-label ≈ 0 on
  the driver data — labels are NOT clustered there, and ~920 of 2M
  pairs exceed cosine 0.4, matching the N(0, 1/64) tail of random
  directions).

Row counts follow the driver's scaling (documents 50_000·sf floored at
500, embeddings 20_000·sf floored at 500).

Usage: python tools/make_organic_sf.py [sf ...]   (default: 0.1 0.5)
Writes bench_data/organic_sf{X}/{documents,embeddings}.parquet
(gitignored, deterministic for a given sf: seeded numpy Generator).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
DIM = 64
NEAR_DUP_RATE = 0.05
EXACT_DUP_RATE = 0.0016


def gen_documents(n: int, rng: np.random.Generator) -> dict:
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < EXACT_DUP_RATE:
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and r < EXACT_DUP_RATE + NEAR_DUP_RATE:
            texts.append(texts[int(rng.integers(0, i))] + " dup")
        else:
            ln = int(rng.integers(10, 101))
            idx = rng.integers(0, len(VOCAB), size=ln)
            texts.append(" ".join(VOCAB[j] for j in idx))
    langs = [LANGS[j] for j in rng.choice(len(LANGS), size=n, p=LANG_P)]
    sources = [f"src{j}" for j in rng.integers(0, 20, size=n)]
    return {
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }


def gen_embeddings(n: int, rng: np.random.Generator) -> dict:
    v = rng.standard_normal((n, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return {
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row.astype(np.float32).tolist() for row in v],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n).astype("int32"),
                          pa.int32()),
    }


def build(sf: float, out_root: str) -> str:
    out = os.path.join(out_root, f"organic_sf{sf:g}")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(int(sf * 10_000) + 7)
    n_docs = max(500, int(50_000 * sf))
    n_vecs = max(500, int(20_000 * sf))
    pq.write_table(pa.table(gen_documents(n_docs, rng)),
                   os.path.join(out, "documents.parquet"))
    pq.write_table(pa.table(gen_embeddings(n_vecs, rng)),
                   os.path.join(out, "embeddings.parquet"))
    print(f"{out}: documents={n_docs} embeddings={n_vecs}")
    return out


if __name__ == "__main__":
    sfs = [float(a) for a in sys.argv[1:]] or [0.1, 0.5]
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_data")
    for sf in sfs:
        build(sf, root)
