"""TTL retention (SURVEY §4 O-3).

The reference bounds its store with per-key TTLs
(/root/reference/lib/meeseeker/block_follower_job.rb:55-56; default 86 400 s,
meeseeker.rb:99) plus a ``max_keys`` admission gate (:49-53).  The engine's
equivalents:

- retention delete: drop rows whose ``ingested_at`` fell past the TTL.
  On Delta/Iceberg this is a metadata DELETE; here the DEFAULT protocol is
  the manifest-committed store (manifest.ManifestStore, the streaming
  sink's default layout): ``expire`` detects a ``_manifest`` dir and
  delegates — only files containing expired rows are rewritten, the swap
  is one atomic manifest rename, and there is no recovery protocol at all.
  For plain partitioned parquet WITHOUT a manifest (a pre-existing dump,
  or a sink run with ``store_impl="dirs"``) the rename-aside fallback
  below applies: a rewrite of ONLY the ``chain=`` partitions that
  actually contain expired rows — untouched partitions keep their exact
  files (asserted byte-identical in tests).  The swap is crash-safe by
  ordering: live rows are written to a hidden ``.tmp`` dir, the old
  partition is renamed aside to a hidden ``.old`` dir, the tmp renamed in,
  and only then is the old copy deleted.  A crash at any point leaves every
  row on disk in at least one of the three locations (Spark ignores
  dot-prefixed dirs, so readers never see doubles); nothing is ever
  removed before its replacement is in place.
- admission control: handled at the streaming trigger (maxFilesPerTrigger /
  maxOffsetsPerTrigger), see streaming/pipeline.py.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import SparkSession, functions as F

from .schemas import DEFAULT_TTL_S


def _epoch_s(ts: dt.datetime) -> int:
    """Naive datetimes in this API mean UTC (every default is
    ``datetime.now(timezone.utc)`` stripped naive).  TTL comparisons run
    on ``ingested_at.cast("long")`` (epoch seconds — a property of the
    INSTANT) against this value, never on ``F.lit(naive_datetime)`` —
    a datetime literal converts through the PYTHON PROCESS's OS
    timezone (PySpark ``TimestampType.toInternal``), so on a non-UTC
    box the cutoff would skew by the OS offset (r12 hardening, found
    while chasing the engine-tip-age session-tz bug; this container and
    the driver run UTC OS clocks, so no shipped decision was wrong —
    the epoch form makes the invariant structural instead of
    environmental)."""
    return int(ts.replace(tzinfo=dt.timezone.utc).timestamp())


def _exchange(a: str, b: str) -> bool:
    """Atomically SWAP two paths with ``renameat2(..., RENAME_EXCHANGE)``
    (VERDICT r14 item 4): the whole-store expire fallback used to
    two-rename (``path`` → ``.old``, ``.tmp`` → ``path``), leaving a
    reader-visible ENOENT window between the renames — the one reader
    exposure the partition-level swap hides behind dot-prefix
    invisibility.  An exchange has NO window: every reader sees either
    the old store or the new one.

    Returns False when the libc or the filesystem lacks the call
    (non-Linux libc, kernel < 3.15, or an FS without exchange support —
    the syscall then fails EINVAL/ENOSYS/ENOTSUP) so the caller can
    fall back to the two-rename protocol, loudly.  Any other errno is a
    real error and raises."""
    import ctypes
    import errno

    libc = ctypes.CDLL(None, use_errno=True)
    if not hasattr(libc, "renameat2"):
        return False
    AT_FDCWD = -100
    RENAME_EXCHANGE = 2
    r = libc.renameat2(AT_FDCWD, os.fsencode(a), AT_FDCWD, os.fsencode(b),
                       RENAME_EXCHANGE)
    if r == 0:
        return True
    err = ctypes.get_errno()
    if err in (errno.EINVAL, errno.ENOSYS, errno.ENOTSUP):
        return False
    raise OSError(err, os.strerror(err), a)



def _swap_in(path: str, what: str) -> None:
    """Swap ``<path>.tmp`` into place: atomic renameat2 exchange when
    the filesystem supports it (concurrent readers see either the old
    store or the new one, never a missing path; the superseded rows
    land in ``.tmp`` and are deleted), else the loud two-rename
    fallback.  ONE home for the protocol (r15 self-review: expire,
    chain-reset and compact_stream_store each hand-rolled the same ~15
    lines, a drift hazard for any future protocol fix)."""
    if _exchange(path, path + ".tmp"):
        shutil.rmtree(path + ".tmp")       # now the superseded rows
    else:
        import sys
        print(f"meeseeker_spark: filesystem at {path} does not support "
              f"renameat2 exchange — {what} falls back to a two-rename "
              "swap with a momentary window where concurrent readers "
              "miss the store", file=sys.stderr)
        os.rename(path, path + ".old")
        os.rename(path + ".tmp", path)
        shutil.rmtree(path + ".old")


def _recover(path: str) -> None:
    """Roll a crashed swap forward or back so ``expire`` can re-run.
    Fallback protocol only: a manifest-committed store never enters any
    of these states (its commit point is a single rename), so this runs
    solely for plain no-manifest parquet layouts.

    - ``.old_chain=X`` present with ``chain=X`` missing → the crash hit
      between the two renames: restore the original (the expired rows come
      back; the re-run expires them again).
    - ``.old_chain=X`` present alongside ``chain=X`` → the swap completed,
      only the delete was lost: finish it.
    - ``.tmp_chain=X`` → an incomplete (or superseded) rewrite: discard.

    The same protocol covers the whole-store swap (sibling ``<path>.old`` /
    ``<path>.tmp``) used for stores without chain= partition dirs.
    """
    if os.path.exists(path + ".old"):
        if os.path.exists(path):
            shutil.rmtree(path + ".old")
        else:
            os.rename(path + ".old", path)
    if os.path.exists(path + ".tmp"):
        shutil.rmtree(path + ".tmp")
    if not os.path.isdir(path):
        return
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if d.startswith(".old_chain="):
            chain_dir = os.path.join(path, d.replace(".old_chain=", "chain="))
            if not os.path.exists(chain_dir):
                os.rename(full, chain_dir)
            else:
                shutil.rmtree(full)
        elif d.startswith(".tmp_chain="):
            shutil.rmtree(full)


def expire(spark: SparkSession, path: str, ttl_s: int = DEFAULT_TTL_S,
           now: dt.datetime | None = None) -> int:
    """Delete rows older than ttl; returns rows removed.

    ttl_s == -1 disables expiry (reference semantics: keys live forever).
    Rows with NULL ``ingested_at`` never expire — NULL means "no recorded
    ingest time", and silently deleting them would be uncounted data loss.

    A manifest-committed store (the streaming sink's default layout) is
    detected by its ``_manifest`` dir and delegated to
    ``ManifestStore.expire`` — one commit protocol owns retention there.
    Otherwise: one counting job (expired rows per chain) decides which
    partitions to rewrite; chains with zero expired rows are never read
    again or touched.  Stores without chain= partition dirs (e.g. a raw
    un-partitioned dump) fall back to a whole-store rewrite with the same
    crash-safe swap.
    """
    if ttl_s == -1:
        return 0
    from .manifest import ManifestStore, is_manifest_store
    if is_manifest_store(path):
        return ManifestStore(spark, path).expire(ttl_s, now=now)
    if os.path.isdir(path) and any(
            d.startswith("batch_id=") for d in os.listdir(path)):
        # r15 review: a raw per-trigger batch-dirs sink (no manifest, no
        # chain= partitions) fell into the whole-store swap below, which
        # rewrites the rows as LOOSE part files — destroying the
        # batch_id=N layout its readers (_batched_view) require and the
        # replay-overwrite idempotence of in-flight triggers.  Refuse
        # loudly; compaction folds these dirs into an expirable layout.
        raise ValueError(
            f"{path} is a raw streaming batch-dirs sink (batch_id=N "
            "dirs): expiring it in place would flatten the layout its "
            "readers and checkpoint replay depend on. Run compact "
            "first, then expire the compacted store.")
    _recover(path)
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    cutoff_s = _epoch_s(now - dt.timedelta(seconds=ttl_s))
    live_pred = (F.col("ingested_at").cast("long") >= F.lit(cutoff_s)) \
        | F.col("ingested_at").isNull()

    df = spark.read.parquet(path)
    expired_per_chain = (
        df.where(F.col("ingested_at").cast("long") < F.lit(cutoff_s))
        .groupBy("chain").agg(F.count("*").alias("n"))
        .collect()
    )
    if not expired_per_chain:
        return 0

    if not any(d.startswith("chain=") for d in os.listdir(path)):
        # un-partitioned layout: one whole-store swap.  Primary path is
        # an atomic renameat2 exchange — concurrent readers see either
        # the old store or the new one, never ENOENT (VERDICT r14
        # item 4).  A crash after the exchange leaves ``.tmp`` holding
        # the superseded OLD rows, which _recover discards — the same
        # terminal state as a pre-write crash, so no new recovery case.
        n_total = sum(r["n"] for r in expired_per_chain)
        live = df.where(live_pred).sortWithinPartitions(
            "block_num", "trx_id", "trx_index")
        live.write.mode("overwrite").parquet(path + ".tmp")
        _swap_in(path, "whole-store expire")
        return n_total

    removed = 0
    for row in expired_per_chain:
        chain, n = row["chain"], row["n"]
        # a NULL chain groups to None but lives on disk under Hive's
        # default-partition dir — building "chain=None" would crash the
        # rewrite on a path that does not exist (r14 review; reset's
        # NULL-safe keep filter already admits NULL-chain rows as real)
        part = ("chain=__HIVE_DEFAULT_PARTITION__" if chain is None
                else f"chain={chain}")
        part_dir = os.path.join(path, part)
        tmp_dir = os.path.join(path, "." + "tmp_" + part)
        old_dir = os.path.join(path, "." + "old_" + part)
        live = (
            spark.read.parquet(part_dir)
            .where(live_pred)
            .sortWithinPartitions("block_num", "trx_id", "trx_index")
        )
        live.write.mode("overwrite").parquet(tmp_dir)
        # crash-safe ordering: old aside → tmp in → delete old.  The store
        # never loses rows: before the first rename both copies exist;
        # between the renames the data lives in tmp_dir + old_dir.
        os.rename(part_dir, old_dir)
        os.rename(tmp_dir, part_dir)
        shutil.rmtree(old_dir)
        removed += n
    return removed


def live_key_count(spark: SparkSession, path: str,
                   ttl_s: int = DEFAULT_TTL_S,
                   now: dt.datetime | None = None) -> int:
    """The ``max_keys`` admission-control probe (count of unexpired keys).
    Layout-detecting like ``expire``: manifest stores are read through
    their committed manifest, plain parquet directly."""
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    from .manifest import ManifestStore, is_manifest_store
    if is_manifest_store(path):
        df = ManifestStore(spark, path).df()
    else:
        df = spark.read.parquet(path)
    if ttl_s != -1:
        cutoff_s = _epoch_s(now - dt.timedelta(seconds=ttl_s))
        df = df.where((F.col("ingested_at").cast("long") >= F.lit(cutoff_s))
                      | F.col("ingested_at").isNull())
    return df.count()
