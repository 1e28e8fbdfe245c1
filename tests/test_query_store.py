"""OpsStore: write layout, scan/get/find/reset, retention expiry."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from meeseeker_spark import fixtures, retention
from meeseeker_spark.flatten import flatten_engine_blocks, flatten_ops_with_virtual
from meeseeker_spark.query import OpsStore
from meeseeker_spark.schemas import BLOCKS, ENGINE_BLOCKS, VIRTUAL_OPS


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    fx = fixtures.generate(n_blocks=42, seed=11)
    out = tmp_path_factory.mktemp("storefx")
    fixtures.write_parquet(fx, str(out))
    blocks = spark.read.schema(BLOCKS).parquet(str(out / "blocks.parquet"))
    vops = spark.read.schema(VIRTUAL_OPS).parquet(str(out / "virtual_ops.parquet"))
    eng = spark.read.schema(ENGINE_BLOCKS).parquet(str(out / "engine_blocks.parquet"))
    ops = flatten_ops_with_virtual(blocks, vops).unionByName(
        flatten_engine_blocks(eng))
    path = str(tmp_path_factory.mktemp("ops_store") / "ops")
    OpsStore.write(ops, path)
    return OpsStore(spark, path)


def test_partition_layout(store):
    # chain is a physical partition → scans with chain predicates prune dirs
    subdirs = {d for d in os.listdir(store.path) if d.startswith("chain=")}
    assert subdirs == {"chain=hive", "chain=hive_engine"}


def test_scan_pattern(store):
    votes = store.scan("hive:*:vote")
    assert votes.count() > 0
    assert votes.select("op_type").distinct().collect()[0]["op_type"] == "vote"


def test_get_single_key(store):
    key = store.df().where("chain = 'hive'").first()["key"]
    got = store.get(key).collect()
    assert len(got) == 1
    assert got[0]["key"] == key


def test_find_block_and_trx(store):
    r = store.df().where("chain = 'hive'").first()
    by_block = store.find_block(r["block_num"]).collect()
    assert any(row["key"] == r["key"] for row in by_block)
    by_trx = store.find_trx(r["trx_id"]).collect()
    assert any(row["key"] == r["key"] for row in by_trx)


def test_has_block_probe(store):
    r = store.df().first()
    assert store.has_block(r["block_num"])
    assert not store.has_block(1)


def test_scan_plan_prunes(store):
    # the C1 predicate must reach the scan: partition filter on chain,
    # pushed filter on op_type
    plan = store.scan("hive:*:vote")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "pushedfilters" in plan.lower()


def test_retention_expire(spark, store, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ttl") / "ops")
    now = dt.datetime(2024, 6, 1, 12, 0, 0)
    old = now - dt.timedelta(days=2)
    df = store.df().limit(200).withColumn(
        "ingested_at",
        F.when(F.col("block_num") % 2 == 0, F.lit(old)).otherwise(F.lit(now)))
    OpsStore.write(df, path)
    total = spark.read.parquet(path).count()
    removed = retention.expire(spark, path, ttl_s=86_400, now=now)
    remaining = spark.read.parquet(path).count()
    assert removed > 0
    assert remaining == total - removed
    assert spark.read.parquet(path).where(
        F.col("ingested_at") < F.lit(now - dt.timedelta(seconds=86_400))
    ).count() == 0
    # ttl -1 disables expiry
    assert retention.expire(spark, path, ttl_s=-1, now=now) == 0


def test_reset_partition_drop(spark, store, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("reset") / "ops")
    OpsStore.write(store.df(), path)
    s = OpsStore(spark, path)
    s.reset("hive_engine")
    chains = {r["chain"] for r in s.df().select("chain").distinct().collect()}
    assert chains == {"hive"}
    s.reset("all")
    assert os.listdir(path) == []


def test_raw_sql_surface(spark):
    """Consumers get plain spark.sql over registered views — the 'SQL
    layer' is Spark's own, no dialect of ours in between."""
    from meeseeker_spark.tables import register_views

    register_views(spark, "/root/testdata/sf0.001")
    out = spark.sql("""
        SELECT e.event_type, count(*) AS n, count(DISTINCT e.user_id) AS u
        FROM events e
        WHERE e.value > 0
        GROUP BY e.event_type
        ORDER BY n DESC
    """).collect()
    assert out and all(r["n"] >= r["u"] for r in out)
    joined = spark.sql("""
        SELECT o.o_orderkey, sum(l.l_quantity) AS qty
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey LIMIT 5
    """)
    assert joined.count() == 5


def test_sessionize_matches_session_window(spark):
    """The lag/cumsum sessionizer and Spark's native session_window agree
    on session boundaries and sizes (same 30-min gap semantics)."""
    from meeseeker_spark import catalog
    from meeseeker_spark.tables import load

    sf = "/root/testdata/sf0.001"
    mine = {(r["user_id"], r["start_us"]): r["n_events"]
            for r in catalog.ENTRIES["sessionize"].spark(spark, sf).collect()}

    ev = load(spark, sf, "events")
    native = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"),
             F.unix_micros(F.min("ts")).alias("start_us"))
    )
    theirs = {(r["user_id"], r["start_us"]): r["n_events"]
              for r in native.collect()}
    assert mine == theirs
