"""Deterministic training-shard export (SURVEY §2 F4 extension).

The last step of a corpus build: a global pseudo-random shuffle into a
fixed number of shards, so trainers stream shards in order and see a
well-mixed corpus without any runtime shuffling.  Requirements at
100 TB, and how each is met:

- **deterministic**: shard and in-shard position are pure functions of
  (salt, id) via the md5_int32 convention (ext.text) — re-running the
  export bit-reproduces every shard, and the DuckDB oracle can replay
  the assignment (tests/test_ext.py);
- **distributed**: one hash-repartition on the shard column; in-shard
  order comes from sortWithinPartitions, never a global orderBy;
- **balanced**: md5 is uniform over ids, so shard sizes concentrate at
  n/n_shards (the test pins a loose balance envelope);
- **one file per shard**: every row of a shard hashes to the same task,
  and the partitionBy writer gives each (task, shard) pair its own
  file — so shard directories carry exactly one parquet file each,
  the layout a streaming data loader wants.

Changing ``salt`` re-deals the whole corpus (a fresh epoch-level
shuffle); changing ``n_shards`` only re-buckets the same global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import md5_int32


def shard_assignments(df: DataFrame, n_shards: int = 64,
                      id_col: str = "doc_id",
                      salt: str = "v1") -> DataFrame:
    """Attach (shard, shard_pos_key): shard = md5(salt#id) mod n_shards;
    the position key orders rows pseudo-randomly WITHIN a shard (an
    independent md5 stream, so in-shard order is not correlated with the
    shard assignment or the original id order)."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    sid = F.col(id_col).cast("string")
    return (
        df.withColumn(
            "shard",
            (md5_int32(F.concat_ws("#", F.lit(salt), sid))
             % n_shards).cast("int"))
        .withColumn(
            "shard_pos_key",
            md5_int32(F.concat_ws("#", F.lit(salt), F.lit("ord"), sid)))
    )


def write_training_shards(df: DataFrame, out_dir: str,
                          n_shards: int = 64, id_col: str = "doc_id",
                          salt: str = "v1", mode: str = "overwrite",
                          drop_cols: tuple[str, ...] = (),
                          order_by: str | None = None,
                          ascending: bool = True) -> None:
    """Materialize the sharded layout: out_dir/shard=N/<one parquet
    file>, rows inside each shard in the deterministic pseudo-random
    order.  See module docstring for the scale rationale.

    ``order_by`` switches the in-shard order from pseudo-random to a
    CURRICULUM: rows sorted by that column (``ascending`` False for
    hardest-first), with the pseudo-random key as the tie-break so equal
    scores still interleave deterministically rather than clumping by
    input order.  Shard ASSIGNMENT stays hash-uniform either way — the
    curriculum orders within shards, so trainers reading shards
    round-robin see the easy→hard progression without any global sort:
    still one repartition + sortWithinPartitions, never an orderBy.

    The internal shard_pos_key never reaches the files (the projection
    above the sort prunes it without disturbing the in-partition order);
    ``drop_cols`` lets callers strip their own helper columns (e.g. a
    synthetic id) the same way."""
    a = shard_assignments(df, n_shards, id_col, salt)
    keep = [c for c in a.columns
            if c != "shard_pos_key" and c not in drop_cols]
    order = [F.col("shard")]
    if order_by is not None:
        order.append(F.col(order_by).asc() if ascending
                     else F.col(order_by).desc())
    order += [F.col("shard_pos_key"), F.col(id_col)]
    (
        a.repartition(n_shards, "shard")
        .sortWithinPartitions(*order)
        .select(*keep)
        .write.partitionBy("shard").mode(mode).parquet(out_dir)
    )
