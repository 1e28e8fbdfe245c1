"""Flatten pipeline vs the pure-Python golden expectations (FIXTURES.md B5):
the Spark plan must reproduce the reference's keying/sequencing semantics
exactly — including the mainnet-excludes-virtual / sidechain-includes-virtual
transaction_num asymmetry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meeseeker_spark import fixtures
from meeseeker_spark.flatten import (
    flatten_blocks, flatten_engine_blocks, flatten_ops_with_virtual,
    flatten_virtual_ops,
)
from meeseeker_spark.schemas import BLOCKS, ENGINE_BLOCKS, VIRTUAL_OPS, VIRTUAL_TRX_ID


@pytest.fixture(scope="module")
def fx():
    return fixtures.generate(n_blocks=105, seed=42)


@pytest.fixture(scope="module")
def fixture_dfs(spark, fx, tmp_path_factory):
    out = tmp_path_factory.mktemp("chainfx")
    fixtures.write_parquet(fx, str(out))
    return {
        "blocks": spark.read.schema(BLOCKS).parquet(str(out / "blocks.parquet")),
        "virtual_ops": spark.read.schema(VIRTUAL_OPS).parquet(
            str(out / "virtual_ops.parquet")),
        "engine_blocks": spark.read.schema(ENGINE_BLOCKS).parquet(
            str(out / "engine_blocks.parquet")),
    }


def _key_tuple(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


GOLDEN_COLS = ("chain", "block_num", "trx_id", "trx_index", "op_type",
               "transaction_num", "value", "key")


def test_mainnet_flatten_matches_golden(fixture_dfs, fx):
    got = flatten_blocks(fixture_dfs["blocks"]).collect()
    exp = [o for o in fx.ops_expected if o["trx_id"] != VIRTUAL_TRX_ID]
    assert _key_tuple(got, GOLDEN_COLS) == _key_tuple(exp, GOLDEN_COLS)


def test_virtual_flatten_matches_golden(fixture_dfs, fx):
    got = flatten_virtual_ops(fixture_dfs["virtual_ops"]).collect()
    exp = [o for o in fx.ops_expected if o["trx_id"] == VIRTUAL_TRX_ID]
    assert _key_tuple(got, GOLDEN_COLS) == _key_tuple(exp, GOLDEN_COLS)
    # mainnet excludes virtual from transaction_num — must be NULL
    assert all(r["transaction_num"] is None for r in got)


def test_union_flatten_complete(fixture_dfs, fx):
    got = flatten_ops_with_virtual(
        fixture_dfs["blocks"], fixture_dfs["virtual_ops"])
    assert got.count() == len(fx.ops_expected)


def test_engine_flatten_matches_golden(fixture_dfs, fx):
    cols = ("chain", "block_num", "trx_id", "trx_index", "contract",
            "action", "transaction_num", "value", "key")
    got = flatten_engine_blocks(fixture_dfs["engine_blocks"]).collect()
    assert _key_tuple(got, cols) == _key_tuple(fx.engine_ops_expected, cols)


def test_engine_includes_virtual_in_transaction_num(fixture_dfs, fx):
    # sidechain counts virtual trxs (follower_job.rb:42) — every row,
    # including '<id>-<n>' virtuals, carries a non-null transaction_num
    got = flatten_engine_blocks(fixture_dfs["engine_blocks"]).collect()
    assert all(r["transaction_num"] is not None for r in got)
    # and virtual trxs sharing a base id get incrementing trx_index
    from collections import Counter
    per_base = Counter((r["block_num"], r["trx_id"]) for r in got)
    multi = [k for k, n in per_base.items() if n > 1]
    assert multi, "fixtures should contain multi-occurrence virtual trx ids"
    for blk, tid in multi[:5]:
        idxs = sorted(r["trx_index"] for r in got
                      if r["block_num"] == blk and r["trx_id"] == tid)
        assert idxs == list(range(len(idxs)))


def test_block_timestamp_enrichment(fixture_dfs):
    # B2: every op carries its block's timestamp
    blocks = {r["block_num"]: r["timestamp"]
              for r in fixture_dfs["blocks"].select("block_num", "timestamp").collect()}
    got = flatten_blocks(fixture_dfs["blocks"]).select("block_num", "timestamp").collect()
    assert all(blocks[r["block_num"]] == r["timestamp"] for r in got)


def test_nai_decimal_exact_beyond_float(spark):
    # §7 hard part: string-encoded fixed point must NOT ride through
    # float64 — 123456789012345678 is not representable as a double.
    from decimal import Decimal

    from pyspark.sql import Row

    from meeseeker_spark.flatten import nai_decimal

    df = spark.createDataFrame([
        Row(amount="3000", precision=3, nai="@@000000021"),
        Row(amount="123456789012345678", precision=3, nai="@@000000021"),
        Row(amount="1", precision=6, nai="@@000000013"),
        Row(amount="0", precision=3, nai="@@000000021"),
    ])
    asset = F.struct("amount", "precision", "nai")
    got = [r[0] for r in df.select(nai_decimal(asset)).collect()]
    want = [Decimal("3.000"), Decimal("123456789012345.678"),
            Decimal("0.000001"), Decimal("0")]
    assert got == want
    assert float(want[1]) != want[1]  # the float path would have corrupted it
