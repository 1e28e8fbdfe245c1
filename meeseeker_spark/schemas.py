"""Typed schemas for the chain data model (SURVEY §1).

The reference is schemaless-at-rest (JSON blobs under string keys; shapes at
/root/reference/lib/meeseeker/block_follower_job.rb:17-76 and
steem_engine/follower_job.rb:25-29).  Here every shape is a declared
StructType so Catalyst can prune/push down; op payloads stay a JSON string
column (`value`) queried on demand with get_json_object/from_json — the
payload is op-type-specific and sparse, exactly the case where a fat typed
struct would defeat column pruning.
"""

from __future__ import annotations

from pyspark.sql import types as T

# 40-zero sentinel trx id for virtual operations
# (reference: lib/meeseeker.rb:23 VIRTUAL_TRX_ID)
VIRTUAL_TRX_ID = "0" * 40

BLOCK_INTERVAL_S = 3          # lib/meeseeker.rb:24
BLOCKS_PER_DAY = 28_800       # lib/meeseeker.rb:22
DEFAULT_TTL_S = 86_400        # lib/meeseeker.rb:99
WITNESS_ROUND = 21            # witness_schedule_job.rb round size

OPERATION = T.StructType([
    T.StructField("type", T.StringType()),
    T.StructField("value", T.StringType()),   # JSON payload
])

TRANSACTION = T.StructType([
    T.StructField("operations", T.ArrayType(OPERATION)),
])

BLOCKS = T.StructType([
    T.StructField("block_num", T.LongType()),
    T.StructField("previous", T.StringType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("witness", T.StringType()),
    T.StructField("transaction_merkle_root", T.StringType()),
    T.StructField("extensions", T.ArrayType(T.StringType())),
    T.StructField("transaction_ids", T.ArrayType(T.StringType())),
    T.StructField("transactions", T.ArrayType(TRANSACTION)),
])

VIRTUAL_OPS = T.StructType([
    T.StructField("block", T.LongType()),
    T.StructField("trx_id", T.StringType()),          # VIRTUAL_TRX_ID
    T.StructField("vop_seq", T.IntegerType()),        # order within block
    T.StructField("op", T.ArrayType(T.StringType())), # [type, value_json]
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("arrival_delay_s", T.IntegerType()),
])

ENGINE_TRANSACTION = T.StructType([
    T.StructField("transactionId", T.StringType()),
    T.StructField("contract", T.StringType()),
    T.StructField("action", T.StringType()),
    T.StructField("payload", T.StringType()),
    T.StructField("refHiveBlockNumber", T.LongType()),
])

ENGINE_BLOCKS = T.StructType([
    T.StructField("blockNumber", T.LongType()),
    T.StructField("timestamp", T.StringType()),  # ISO8601, no zone
    T.StructField("transactions", T.ArrayType(ENGINE_TRANSACTION)),
    T.StructField("virtualTransactions", T.ArrayType(ENGINE_TRANSACTION)),
])

ASSET = T.StructType([
    T.StructField("amount", T.StringType()),     # string-encoded fixed point
    T.StructField("precision", T.IntegerType()),
    T.StructField("nai", T.StringType()),
])

WITNESS_SCHEDULES = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("current_virtual_time", T.DecimalType(38, 0)),
    T.StructField("next_shuffle_block_num", T.LongType()),
    T.StructField("current_shuffled_witnesses", T.ArrayType(T.StringType())),
    T.StructField("num_scheduled_witnesses", T.IntegerType()),
    T.StructField("majority_version", T.StringType()),
    T.StructField("median_props", T.StructType([
        T.StructField("account_creation_fee", ASSET),
        T.StructField("maximum_block_size", T.IntegerType()),
        T.StructField("sbd_interest_rate", T.IntegerType()),
    ])),
])

# The materialized op table — the engine's answer to the reference's keyed
# Redis store. chain is the partition column; block_num the sort/cluster
# column (key-pattern scans prune on both).
OPS = T.StructType([
    T.StructField("chain", T.StringType()),
    T.StructField("block_num", T.LongType()),
    T.StructField("trx_id", T.StringType()),
    T.StructField("trx_index", T.IntegerType()),
    T.StructField("op_type", T.StringType()),
    T.StructField("contract", T.StringType()),   # sidechain only, else null
    T.StructField("action", T.StringType()),     # sidechain only, else null
    T.StructField("transaction_num", T.IntegerType()),  # null for virtual
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("value", T.StringType()),      # JSON payload
    T.StructField("key", T.StringType()),        # derived composite key
    T.StructField("ingested_at", T.TimestampType()),   # retention clock
])
