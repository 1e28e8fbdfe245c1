"""Block→transaction→operation flatten (SURVEY §2 B1–B9).

The reference walks blocks imperatively in a single thread, keeping mutable
counters for op/trx ordinals (/root/reference/lib/meeseeker/
block_follower_job.rb:17-94).  Here ordinals come from ``posexplode``
positions — stable under any repartitioning, which arrival-order state is
not — and the whole pipeline is one narrow declarative plan: the only wide
operation in batch *or* streaming mode is whatever sink partitioning the
caller requests.

Semantic asymmetry preserved from the reference (SURVEY §7 hard parts):
mainnet ``transaction_num`` EXCLUDES virtual trxs (block_follower_job.rb:32)
while the sidechain INCLUDES them (steem_engine/follower_job.rb:42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .keys import key_column
from .schemas import VIRTUAL_TRX_ID


def normalize_op_type(col: F.Column) -> F.Column:
    """Strip the '_operation' suffix: vote_operation → vote
    (block_follower_job.rb:39-43)."""
    return F.regexp_replace(col, "_operation$", "")


def nai_decimal(asset: F.Column) -> F.Column:
    """Decode an NAI asset triple {amount: string, precision, nai} into an
    exact DECIMAL — never through float (SURVEY §7 hard part; the wire
    shape is README.md:233 in the reference: amounts are string-encoded
    fixed point, e.g. {"amount": "3000", "precision": 3} = 3.000 HIVE).

    Decimal ÷ decimal stays decimal in Spark: amount casts to
    DECIMAL(29,0) exactly, 10^precision is float-exact for precision ≤ 15
    then cast to DECIMAL(19,0), and the quotient lands on DECIMAL(38,9) —
    so 18-digit amounts that float64 cannot represent survive intact.
    """
    amt = asset["amount"].cast("decimal(29,0)")
    scale = F.pow(F.lit(10.0), asset["precision"]).cast("decimal(19,0)")
    return amt / scale


def flatten_blocks(blocks: DataFrame, chain: str = "hive") -> DataFrame:
    """Mainnet flatten: two posexplodes (transactions, then operations).

    Positions give transaction_num (trx ordinal in block) and trx_index
    (op ordinal in trx) for free — no window, no shuffle; the plan is a
    straight narrow map over the block scan.
    """
    trx = blocks.select(
        "block_num", "timestamp", "transaction_ids",
        F.posexplode("transactions").alias("trx_pos", "trx"),
    )
    ops = trx.select(
        "block_num", "timestamp",
        F.col("transaction_ids")[F.col("trx_pos")].alias("trx_id"),
        F.col("trx_pos").cast("int").alias("transaction_num"),
        F.posexplode("trx.operations").alias("op_pos", "op"),
    )
    flat = ops.select(
        F.lit(chain).alias("chain"),
        "block_num", "trx_id",
        F.col("op_pos").cast("int").alias("trx_index"),
        normalize_op_type(F.col("op.type")).alias("op_type"),
        F.lit(None).cast("string").alias("contract"),
        F.lit(None).cast("string").alias("action"),
        "transaction_num",
        "timestamp",
        F.col("op.value").alias("value"),
    )
    return flat.withColumn("key", key_column(sidechain=False))


def flatten_virtual_ops(vops: DataFrame, chain: str = "hive") -> DataFrame:
    """Virtual-op normalization (block_follower_job.rb:214-226): reshape
    ``op[0]/op[1]`` into type/value, sentinel trx_id, NULL transaction_num
    (mainnet excludes virtual from trx counts).  ``vop_seq`` is the API
    yield order within the block → trx_index, matching the reference's
    contiguous-prefix counter."""
    flat = vops.select(
        F.lit(chain).alias("chain"),
        F.col("block").alias("block_num"),
        F.coalesce("trx_id", F.lit(VIRTUAL_TRX_ID)).alias("trx_id"),
        F.col("vop_seq").cast("int").alias("trx_index"),
        normalize_op_type(F.col("op")[0]).alias("op_type"),
        F.lit(None).cast("string").alias("contract"),
        F.lit(None).cast("string").alias("action"),
        F.lit(None).cast("int").alias("transaction_num"),
        "timestamp",
        F.col("op")[1].alias("value"),
    )
    return flat.withColumn("key", key_column(sidechain=False))


def flatten_ops_with_virtual(blocks: DataFrame, vops: DataFrame,
                             chain: str = "hive") -> DataFrame:
    """Full mainnet op stream: real ops ∪ virtual ops (late side source)."""
    return flatten_blocks(blocks, chain).unionByName(
        flatten_virtual_ops(vops, chain))


def flatten_engine_blocks(engine_blocks: DataFrame,
                          chain: str = "hive_engine") -> DataFrame:
    """Sidechain flatten at transaction granularity
    (steem_engine/follower_job.rb:20-83,164-180).

    Real trxs come first, then virtual (matching the reference's iteration
    order); transaction_num numbers BOTH (the sidechain includes virtual).
    trx_index re-counts occurrences of the same base trx_id within a block —
    only virtual trxs ever repeat a base id, because their ids are rewritten
    to '<40-zero sentinel>-<n>' before storage (follower_job.rb:170-180:
    ``'transactionId' => "#{VIRTUAL_TRX_ID}-#{vtrx_in_block}"``) — the wire
    format consumers key on, and what makes virtual trxs identifiable in
    the store (verify excludes the sentinel, Rakefile:366).

    ``chain`` MUST end in ``_engine``: the glob translator classifies
    key shapes (5-segment mainnet vs 6-segment sidechain) by exactly
    that suffix, so a differently-named engine chain would have its
    scans positionally bound against the WRONG layout and silently drop
    rows (r15 review) — enforced here, at write time, where the
    convention is cheap and loud.
    """
    if not chain.endswith("_engine"):
        raise ValueError(
            f"sidechain chain name must end in '_engine' (got {chain!r}):"
            " the key-glob translator resolves the 6-segment key layout "
            "by that suffix")
    virt = F.transform(
        F.coalesce("virtualTransactions", F.array()),
        lambda t: F.struct(
            F.concat_ws(
                "-", F.lit(VIRTUAL_TRX_ID),
                F.element_at(F.split(t["transactionId"], "-"), 2),
            ).alias("transactionId"),
            t["contract"].alias("contract"),
            t["action"].alias("action"),
            t["payload"].alias("payload"),
            t["refHiveBlockNumber"].alias("refHiveBlockNumber"),
        ),
    )
    both = engine_blocks.select(
        F.col("blockNumber").alias("block_num"),
        # ISO8601 without zone, parsed as UTC (follower_job.rb:124 '+Z')
        F.to_timestamp(F.col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        F.posexplode(
            F.concat(F.coalesce("transactions", F.array()), virt)
        ).alias("trx_pos", "trx"),
    )
    flat = both.select(
        F.lit(chain).alias("chain"),
        "block_num",
        F.split(F.col("trx.transactionId"), "-")[0].alias("trx_id"),
        F.col("trx_pos").cast("int").alias("transaction_num"),
        F.col("trx.contract").alias("contract"),
        F.col("trx.action").alias("action"),
        "timestamp",
        # the stored value is the FULL transaction JSON (the reference keeps
        # the whole trx hash, which its verify queries re-parse for
        # refHiveBlockNumber — Rakefile:439-444)
        F.to_json(F.struct(
            "trx.transactionId", "trx.contract", "trx.action",
            "trx.payload", "trx.refHiveBlockNumber")).alias("value"),
        F.col("trx_pos").alias("_pos"),
    )
    # trx_index: occurrence ordinal of the base trx_id within the block.
    # For real trxs this is always 0 (unique ids) — the window only ever
    # has >1 row for virtual trxs sharing a base id, so the shuffle it
    # costs is proportional to blocks, not ops; at scale this stays cheap
    # because partitioning is by (block_num, trx_id) — no skew.
    from pyspark.sql import Window
    w = Window.partitionBy("block_num", "trx_id").orderBy("_pos")
    flat = flat.withColumn(
        "trx_index", (F.row_number().over(w) - 1).cast("int")).drop("_pos")
    flat = flat.select(
        "chain", "block_num", "trx_id", "trx_index",
        F.lit(None).cast("string").alias("op_type"),
        "contract", "action", "transaction_num", "timestamp", "value",
    )
    return flat.withColumn("key", key_column(sidechain=True))
