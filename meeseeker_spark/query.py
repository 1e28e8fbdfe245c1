"""Consumer query surface over the ops store (SURVEY §2 C1–C6).

The reference's store is Redis keyed by the composite string; consumers do
SCAN globs, GETs, and `find block/trx` (README.md:250-309, bin/meeseeker:34).
Here the store is a parquet table partitioned by ``chain`` with files
sorted by ``block_num`` — so C1 patterns become partition-pruned, row-group-
pruned column predicates, and the fat ``value`` column is only read when the
query projects it (column pruning).

At 100 TB the same layout holds: chain partition + block_num clustering
(Delta/Iceberg z-order or hourly sub-partitions on a real deployment);
nothing here assumes single-node.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .keys import glob_to_filter, parse_key


class OpsStore:
    """Keyed op table (the engine's Redis analog; SURVEY §1.2)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- write side (S7) ----------------------------------------------------

    @staticmethod
    def write(ops: DataFrame, path: str, mode: str = "overwrite",
              writers_per_chain: int = 8) -> None:
        """Partition by chain, cluster files by block_num so C1 scans prune.
        ``ingested_at`` drives TTL retention (O-3).

        The shuffle is a RANGE partition on (chain, block_num), NOT a hash
        on chain alone — a chain-only repartition means ONE writer task
        per chain, a serial choke at any real volume. Range partitioning
        keeps every output file a contiguous block range (min/max
        row-group pruning stays as sharp as a global sort) while
        ``writers_per_chain`` tasks write in parallel per chain directory.
        """
        if "ingested_at" not in ops.columns:
            ops = ops.withColumn("ingested_at", F.current_timestamp())
        (
            ops.repartitionByRange(writers_per_chain, "chain", "block_num")
            .sortWithinPartitions("block_num", "trx_id", "trx_index")
            .write.partitionBy("chain")
            .mode(mode)
            .parquet(path)
        )

    @staticmethod
    def write_bucketed(ops: DataFrame, table: str, buckets: int = 32,
                       mode: str = "overwrite") -> None:
        """Bucketed variant of the keyed store (catalog table, not a bare
        path): hash-bucketed AND sorted by block_num. Any join or
        aggregation keyed on block_num between two tables bucketed the
        same way runs WITHOUT a shuffle on either side — at 100 TB this is
        how the notify-get join (C5) and the reconciliation joins (D1-D3)
        avoid re-exchanging the big ops table every query. Requires a
        metastore-backed table (saveAsTable); the path-based writer above
        stays the hermetic default.
        """
        if "ingested_at" not in ops.columns:
            ops = ops.withColumn("ingested_at", F.current_timestamp())
        (
            ops.repartition(buckets, "block_num")
            .write.bucketBy(buckets, "block_num")
            .sortBy("block_num")
            .mode(mode)
            .saveAsTable(table)
        )

    def df(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    # -- C1: key-pattern scan ----------------------------------------------

    def scan(self, pattern: str) -> DataFrame:
        """SCAN MATCH '<glob>' → predicate-pushed filtered scan."""
        return self.df().where(glob_to_filter(pattern))

    # -- C2: point lookup ---------------------------------------------------

    def get(self, key: str) -> DataFrame:
        """GET <key> → at most one row, all segment predicates pushed."""
        seg = parse_key(key)
        df = self.df()
        for name, val in seg.items():
            col = F.col(name)
            if name in ("block_num", "trx_index"):
                df = df.where(col == int(val))
            else:
                df = df.where(col == val)
        return df

    # -- C3: find block / find trx -------------------------------------------

    def find_block(self, block_num: int, chain: str | None = None) -> DataFrame:
        df = self.df().where(F.col("block_num") == block_num)
        if chain:
            df = df.where(F.col("chain") == chain)
        return df.select("key", "value")

    def find_trx(self, trx_id: str, chain: str | None = None) -> DataFrame:
        df = self.df().where(F.col("trx_id") == trx_id)
        if chain:
            df = df.where(F.col("chain") == chain)
        return df.select("key", "value")

    # -- C6: existence probe --------------------------------------------------

    def has_block(self, block_num: int, chain: str | None = None) -> bool:
        df = self.df().where(F.col("block_num") == block_num)
        if chain:
            df = df.where(F.col("chain") == chain)
        return bool(df.limit(1).count() > 0)

    # -- C4: reset (bulk delete by chain prefix) ------------------------------

    def reset(self, chain: str = "all") -> None:
        """Partition drop — the scale-correct bulk delete (no rewrite).
        `all` truncates the store."""
        if chain == "all":
            if os.path.exists(self.path):
                shutil.rmtree(self.path)
            os.makedirs(self.path, exist_ok=True)
            return
        part = os.path.join(self.path, f"chain={chain}")
        if os.path.exists(part):
            shutil.rmtree(part)
