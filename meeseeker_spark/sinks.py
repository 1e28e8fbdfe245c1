"""Channel/key sinks (SURVEY §2 S7–S9).

The hermetic default is the parquet ``channel_events`` table written by
streaming/pipeline.py — replayable, and N consumers read it without N chain
streams (the reference's fan-out economics, README.md:7).

``RedisChannelSink`` is the optional wire-compatible adapter (the reference
publishes over Redis pub/sub and SETs keys with TTL,
/root/reference/lib/meeseeker/block_follower_job.rb:55-56,83): it is
import-guarded (redis-py isn't in this environment) and client-injectable so
the fan-out path is unit-testable with a fake.  Publishing happens
foreachPartition on executors — one connection per partition, never a
driver-side loop.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame


class CollectingSink:
    """File-backed fake client (test double for redis.Redis).

    foreachPartition executes in Python *worker processes*, so an in-memory
    double would mutate a pickled copy; this one appends JSON lines under a
    spool directory that the driver-side test reads back.
    """

    def __init__(self, spool_dir: str) -> None:
        self.spool_dir = spool_dir

    def _append(self, record: dict) -> None:
        import json
        import os

        os.makedirs(self.spool_dir, exist_ok=True)
        path = f"{self.spool_dir}/{os.getpid()}.jsonl"
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def publish(self, channel: str, payload: str) -> None:
        self._append({"op": "publish", "channel": channel, "payload": payload})

    def set(self, key: str, value: str) -> None:
        self._append({"op": "set", "key": key, "value": value})

    def expire(self, key: str, ttl: int) -> None:
        self._append({"op": "expire", "key": key, "ttl": ttl})

    def records(self) -> list[dict]:
        import glob
        import json

        out: list[dict] = []
        for path in sorted(glob.glob(f"{self.spool_dir}/*.jsonl")):
            with open(path) as f:
                out.extend(json.loads(line) for line in f)
        return out


def make_redis_client(url: str = "redis://127.0.0.1:6379/0") -> Any:
    """Real client, only if redis-py is importable."""
    try:
        import redis  # type: ignore
    except ImportError as e:  # pragma: no cover - env has no redis
        raise NotImplementedError(
            "redis-py not available in this environment; inject a client "
            "(e.g. CollectingSink) instead") from e
    return redis.Redis.from_url(url)  # pragma: no cover


def publish_channel_events(channel_events: DataFrame,
                           client_factory: Callable[[], Any]) -> None:
    """Fan a channel_events frame out to pub/sub: executor-side,
    one client per partition (S8)."""
    cols = channel_events.select("channel", "payload")

    def _publish(rows: Iterable) -> None:
        client = client_factory()
        for row in rows:
            client.publish(row["channel"], row["payload"])

    cols.foreachPartition(_publish)


def set_keyed_ops(ops: DataFrame, client_factory: Callable[[], Any],
                  ttl_s: int = 86_400) -> None:
    """Wire-compat keyed SET + EXPIRE per op (S7). The parquet OpsStore is
    the primary store; this mirrors writes to Redis for reference-equivalent
    consumers."""
    cols = ops.select("key", "value")

    def _set(rows: Iterable) -> None:
        client = client_factory()
        for row in rows:
            client.set(row["key"], row["value"])
            if ttl_s != -1:
                client.expire(row["key"], ttl_s)

    cols.foreachPartition(_set)
