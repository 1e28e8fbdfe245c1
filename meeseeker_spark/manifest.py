"""Manifest-committed parquet store — the Delta-equivalent commit protocol
(VERDICT r3 item 7; SURVEY §4 O-3 upgrade path).

The hermetic container has no Delta/Iceberg, so the ops sink's idempotence
is dir-rename-by-batch_id and TTL retention is a partition rename dance
(retention.py).  Both protocols work and are crash-tested, but each
hand-rolls its own recovery.  This module subsumes them with the one
primitive a transactional table actually needs: **readers only see files
listed in the newest committed manifest, and a manifest commit is a single
atomic rename**.

Layout:

    <path>/data/commit-<token>/part-*.parquet     immutable data files
    <path>/_manifest/v{N}.json                    committed versions

Protocol:

- WRITE: stage a new commit dir with Spark, list its part files, then
  commit manifest vN+1 = previous files ± changes via write-tmp + atomic
  ``os.rename``.  A crash before the rename leaves an orphan data dir that
  no reader ever sees (Spark is never pointed at ``data/`` itself); re-run
  and ``gc()`` clean it.  No ``.old`` roll-back/forward cases remain — the
  store is ALWAYS in exactly the state of its newest manifest.
- IDEMPOTENT APPEND: ``append(df, batch_id=…)`` records the batch id in
  the manifest; a retried foreachBatch sees its id committed and becomes a
  no-op (exactly-once without dir overwrite semantics).
- TTL EXPIRE: rewrite ONLY the files that contain expired rows (file set
  found via ``input_file_name``); every untouched file is re-referenced,
  not rewritten — byte-identical, and cheaper than the partition-level
  rewrite in retention.py (a partition with one hot file rewrites one
  file, not the partition).
- GC: delete data files not referenced by the kept manifest tail.  Safe at
  any time; crashes between commit and gc only leave garbage, never lose
  referenced data.

Single-writer assumption (one maintenance/ingest job at a time), same as
retention.py — manifest versions make that explicit AND structural: every
write path captures the manifest version it READ and commits v(read+1)
via an os.link compare-and-swap, so a writer interleaving anywhere in the
read → stage → commit window collides on the link and raises instead of
silently dropping the other commit (lost update).

At real scale the same design is why Delta/Iceberg win: the manifest is a
metadata operation, O(files-touched), never O(store).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

_MANIFEST_DIR = "_manifest"
_DATA_DIR = "data"


def is_manifest_store(path: str) -> bool:
    """THE layout probe — every reader/writer that dispatches on
    dirs-vs-manifest uses this, so the marker dir name has one home.

    A path counts as a manifest store only once a version is COMMITTED
    (a ``v*.json`` exists), not when the marker dir appears (ADVICE r6):
    ManifestStore() eagerly creates ``_manifest/`` at construction, so a
    marker-dir probe would flip the layout for every reader during
    migration staging — and permanently after a pre-commit crash —
    turning the documented "readers see only the untouched batch dirs
    until the commit rename" window into a mixed-layout refusal."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return False
    return any(f.startswith("v") and f.endswith(".json")
               and f[1:-5].isdigit() for f in os.listdir(mdir))


class ManifestStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)

    # -- manifest plumbing --------------------------------------------------

    def _mdir(self) -> str:
        return os.path.join(self.path, _MANIFEST_DIR)

    def current_version(self) -> int | None:
        versions = [
            int(f[1:-5]) for f in os.listdir(self._mdir())
            if f.startswith("v") and f.endswith(".json")
            and f[1:-5].isdigit()
        ]
        return max(versions) if versions else None

    def _read_manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            return {"version": 0, "files": [], "batch_ids": []}
        with open(os.path.join(self._mdir(), f"v{v}.json")) as f:
            return json.load(f)

    def _commit(self, files: list[str], batch_ids: list[int],
                base_version: int) -> int:
        """Atomically publish manifest v(base_version+1) — a COMPARE-AND-
        SWAP against the version the caller READ, not whatever is newest
        at link time.  Every write path is read-manifest → long Spark
        stage → commit; recomputing prev at the commit point would let a
        writer that interleaved with another's commit link v(N+2) built
        from the v(N) file list, silently dropping the other commit
        (ADVICE r12).  Pinning new_v to base+1 means ANY intervening
        commit collides on the link and raises instead of winning."""
        new_v = base_version + 1
        m = {"version": new_v, "files": sorted(files),
             "batch_ids": sorted(set(batch_ids))}
        tmp = os.path.join(self._mdir(), f".tmp-{uuid.uuid4().hex}.json")
        final = os.path.join(self._mdir(), f"v{new_v}.json")
        with open(tmp, "w") as f:
            json.dump(m, f)
            f.flush()
            os.fsync(f.fileno())
        # link, not rename: POSIX rename silently REPLACES an existing
        # target, so a check-then-rename race between two writers would
        # lose a commit — link fails atomically with FileExistsError,
        # making the documented "concurrent commit raises instead of
        # corrupting" guarantee structural (r12 review).  The link IS
        # the commit point; a crash before the unlink leaves a .tmp
        # that gc() already sweeps.
        try:
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            raise RuntimeError(
                f"manifest v{new_v} already exists — a concurrent writer "
                f"committed after this one read v{base_version}; re-read "
                "and retry (single-writer assumption violated)")
        os.unlink(tmp)
        return new_v

    def _stage(self, df: DataFrame) -> list[str]:
        """Write df to a fresh immutable commit dir; return its part files
        (relative to the store root).  Not yet visible to anyone."""
        token = uuid.uuid4().hex[:12]
        rel = os.path.join(_DATA_DIR, f"commit-{token}")
        df.write.mode("error").parquet(os.path.join(self.path, rel))
        out = []
        for root, _, names in os.walk(os.path.join(self.path, rel)):
            for n in names:
                if n.endswith(".parquet") and not n.startswith(("_", ".")):
                    out.append(os.path.relpath(os.path.join(root, n),
                                               self.path))
        return out

    # -- read side ----------------------------------------------------------

    def versions(self) -> list[int]:
        """Manifest versions still on disk, ascending.  gc() drops old
        manifest json, so this is also the time-travel horizon."""
        return sorted(
            int(f[1:-5]) for f in os.listdir(self._mdir())
            if f.startswith("v") and f.endswith(".json")
            and f[1:-5].isdigit())

    def files(self, version: int | None = None) -> list[str]:
        if version is not None and version not in self.versions():
            raise FileNotFoundError(
                f"manifest store {self.path} has no version {version} "
                f"(on disk: {self.versions()}; gc() prunes history)")
        return list(self._read_manifest(version)["files"])

    def df(self, version: int | None = None) -> DataFrame:
        """The committed table — at ``version`` for time travel (the
        snapshot-diff/audit read; pair two versions with
        ext.diff.corpus_diff).  Every version is an immutable file LIST,
        so old reads cost nothing extra — but gc(keep_versions=K)
        reclaims files unreferenced by the newest K manifests, which
        bounds how far back is readable; a pruned version raises
        instead of silently returning partial data."""
        files = self.files(version)
        if not files:
            raise FileNotFoundError(
                f"manifest store {self.path} has no committed data"
                + ("" if version is None else f" at version {version}"))
        missing = [f for f in files
                   if not os.path.exists(os.path.join(self.path, f))]
        if missing:
            eff = self.current_version() if version is None else version
            raise FileNotFoundError(
                f"version {eff} references {len(missing)} gc'd "
                f"file(s) (e.g. {missing[0]}); "
                + ("the CURRENT manifest is broken — files were pruned "
                   "externally" if version is None else
                   "raise gc keep_versions to retain time-travel history"))
        return self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in files])

    def committed_batch_ids(self) -> set[int]:
        return set(self._read_manifest()["batch_ids"])

    # -- write side ---------------------------------------------------------

    def append(self, df: DataFrame, batch_id: int | None = None) -> bool:
        """Append df as a new commit.  With ``batch_id``, the append is
        IDEMPOTENT: a batch id already in the manifest is skipped (the
        foreachBatch retry contract), returning False."""
        m = self._read_manifest()
        if batch_id is not None and batch_id in m["batch_ids"]:
            return False
        staged = self._stage(df)
        ids = m["batch_ids"] + ([batch_id] if batch_id is not None else [])
        self._commit(m["files"] + staged, ids, m["version"])
        return True

    def overwrite(self, df: DataFrame) -> None:
        base = self._read_manifest()["version"]
        staged = self._stage(df)
        self._commit(staged, [], base)

    def expire(self, ttl_s: int, now=None) -> int:
        """TTL retention as a manifest swap: only files CONTAINING expired
        rows are rewritten (live rows re-staged); every other file is
        re-referenced untouched.  Returns rows removed.  Crash-safe with
        no recovery protocol at all: before the commit rename readers see
        the old manifest, after it the new one — there is no intermediate
        state."""
        import datetime as dt

        if ttl_s == -1:
            return 0
        from .retention import _epoch_s
        now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        # epoch-seconds compare keeps the cutoff session-tz-independent
        # (r12 review; see retention._epoch_s)
        cutoff_s = _epoch_s(now - dt.timedelta(seconds=ttl_s))
        m = self._read_manifest()
        if not m["files"]:
            return 0
        from urllib.parse import unquote, urlparse

        df = self.df().withColumn("_file", F.input_file_name())
        expired = F.col("ingested_at").cast("long") < F.lit(cutoff_s)
        # ONE job finds the hot files AND the expired row count per file
        # (keyed on the RAW input_file_name URIs — reconstructing them
        # from relative paths is scheme/slash-fragile)
        per_file = (df.where(expired).groupBy("_file")
                    .agg(F.count("*").alias("_n")).collect())
        if not per_file:
            return 0
        hot = {os.path.relpath(unquote(urlparse(r["_file"]).path), self.path)
               for r in per_file}
        n_removed = sum(r["_n"] for r in per_file)
        # re-stage ONLY the hot files' live rows: the read is a direct
        # scan of those files, never the whole store
        live = (self.spark.read.parquet(
                    *[os.path.join(self.path, f) for f in sorted(hot)])
                .where((F.col("ingested_at").cast("long")
                        >= F.lit(cutoff_s))
                       | F.col("ingested_at").isNull()))
        staged = self._stage(live)
        keep = [f for f in m["files"] if f not in hot]
        self._commit(keep + staged, m["batch_ids"], m["version"])
        return n_removed

    def compact(self, sort_cols: tuple[str, ...] = (),
                target_file_bytes: int = 128 * 1024 * 1024) -> int:
        """Fold the accumulated per-commit small files into one fresh
        commit (the manifest answer to compact_stream_store — OPTIMIZE in
        Delta terms).  Output file count is sized from the store's actual
        bytes (``target_file_bytes`` per file, Delta's default bin size),
        so a thousand trigger-sized files fold to a handful.  Optional
        ``sort_cols`` cluster rows within the rewritten files so min/max
        row-group pruning stays sharp (columns absent from the schema are
        skipped).  Returns the number of files folded (0 = single file
        already).  Readers are never disturbed: the swap is one manifest
        commit, and the old files remain until ``gc()``.

        Compaction also PRUNES the recorded batch ids to the replayable
        tail (r14 review): the list otherwise grows one int per trigger
        forever — a year of 3 s triggers is ~10M ids rewritten into the
        manifest json on EVERY commit, O(stream-age) work on the ingest
        hot path.  Only the newest trigger can ever replay (Structured
        Streaming replays exactly the batches after the checkpoint's
        last commit, and trigger N+1 only runs once commit N landed),
        so ids ≤ max−1 can never be retried; the tail {max−1, max} is
        kept with one slot of paranoia.  A pre-prune id arriving anyway
        means a FRESH checkpoint was pointed at this store — the misuse
        reset exists for, unchanged by pruning."""
        m = self._read_manifest()
        if len(m["files"]) <= 1:
            return 0
        total = sum(os.path.getsize(os.path.join(self.path, f))
                    for f in m["files"])
        n_out = max(1, -(-total // target_file_bytes))
        df = self.df().repartition(n_out)
        present = [c for c in sort_cols if c in df.columns]
        if present:
            df = df.sortWithinPartitions(*present)
        staged = self._stage(df)
        ids = m["batch_ids"]
        if ids:
            ids = [i for i in ids if i >= max(ids) - 1]
        self._commit(staged, ids, m["version"])
        return len(m["files"])

    # -- streaming bridge ---------------------------------------------------

    def sink(self):
        """foreachBatch function writing each micro-batch as one manifest
        commit — the replacement for the ``batch_id=N`` dir-overwrite
        idempotence scheme: a replayed batch (crash after commit, before
        checkpoint) short-circuits on its recorded batch id, so admission
        is exactly-once with no overwrite semantics and no recovery scan.

            stream.writeStream.foreachBatch(store.sink())...
        """
        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.append(batch_df, batch_id=batch_id)
        return _sink

    # -- maintenance --------------------------------------------------------

    def gc(self, keep_versions: int = 1) -> int:
        """Delete data files referenced by NO kept manifest (the newest
        ``keep_versions`` manifests survive; older manifest json is
        dropped too).  Returns files deleted.  Never touches files the
        current manifest references, so it is safe to run at any time —
        a crash mid-gc just leaves some garbage for the next run."""
        cur = self.current_version()
        if cur is None:
            return 0
        kept = range(max(1, cur - keep_versions + 1), cur + 1)
        referenced: set[str] = set()
        for v in kept:
            # a version in the kept window may have been dropped by an
            # earlier gc with a smaller keep_versions — skip the gap
            if os.path.exists(os.path.join(self._mdir(), f"v{v}.json")):
                referenced |= set(self._read_manifest(v)["files"])
        deleted = 0
        data_root = os.path.join(self.path, _DATA_DIR)
        for d in os.listdir(data_root):
            droot = os.path.join(data_root, d)
            for root, _, names in os.walk(droot):
                for n in names:
                    rel = os.path.relpath(os.path.join(root, n), self.path)
                    if n.endswith(".parquet") and rel not in referenced:
                        os.unlink(os.path.join(root, n))
                        deleted += 1
            if not any(f.endswith(".parquet") for _, _, fs in os.walk(droot)
                       for f in fs):
                shutil.rmtree(droot)
        for f in os.listdir(self._mdir()):
            if f.startswith(".tmp-"):
                os.unlink(os.path.join(self._mdir(), f))
            elif (f.startswith("v") and f.endswith(".json")
                  and f[1:-5].isdigit() and int(f[1:-5]) not in kept):
                os.unlink(os.path.join(self._mdir(), f))
        return deleted


def migrate_dirs_to_manifest(spark: SparkSession, path: str) -> int:
    """One-shot migration of a ``batch_id=N`` dir-layout sink into a
    ManifestStore AT THE SAME PATH — the operational bridge now that the
    streaming sinks default to the manifest layout (a pre-existing dirs
    store cannot just keep ingesting: the writers refuse mixed layouts).

    Rewrites the union of the batch dirs into one manifest commit,
    recording every migrated batch id — so a checkpointed stream resumed
    against the migrated store with ``store_impl="manifest"`` replays its
    in-flight batch into a recorded-id short-circuit instead of a double
    append (the dir scheme's overwrite idempotence carries over).
    Returns the number of batch dirs absorbed.

    Crash-safety: the manifest commit is the atomic cut-over; before it,
    readers see only the untouched batch dirs.  Between the commit and
    the batch-dir cleanup the path holds BOTH layouts, which every
    reader/writer refuses LOUDLY (no silent double-count) — re-running
    this function finishes the cleanup, but only after verifying BY
    CONTENT that every leftover dir's rows are already in the committed
    table (``exceptAll`` per leftover union): a batch id alone proves
    nothing, because a dirs-writer resumed on a FRESH checkpoint restarts
    ids at 0 and could collide with committed ids while carrying new
    rows.  Rows not covered → refuse loudly, never delete.
    Single-writer assumption, like every maintenance job here.
    """
    batches = sorted(d for d in os.listdir(path)
                     if d.startswith("batch_id=")) if os.path.isdir(path) \
        else []
    has_manifest = is_manifest_store(path)
    if not batches:
        if has_manifest:
            return 0                       # already migrated / clean store
        raise FileNotFoundError(f"{path} has no batch_id=N dirs to migrate")
    ids = [int(d.split("=", 1)[1]) for d in batches]
    store = ManifestStore(spark, path)
    # Does the NATIVE manifest writer for this store carry batch_id as a
    # physical data column?  The sink's _meta HWM rows do (pipeline
    # withColumn's it before the write — compact_meta's manifest fold
    # aggregates max(batch_id) over it), so the migrated files must too:
    # dropping the partition column here left a migrated _meta store
    # whose first `compact` crashed on an unresolvable batch_id (r15
    # durability review).  The dir files themselves answer the question
    # — a dirs writer writes the df as-is, so a physical batch_id in
    # the files means the native manifest rows would carry one.  The
    # basePath read SHADOWS the physical column with the dir-derived
    # partition value (same value by construction), so cast it back to
    # the physical type instead of dropping it.
    phys = spark.read.parquet(os.path.join(path, batches[0])).schema
    keep_batch = "batch_id" in phys.fieldNames()

    def _shape(df):
        if keep_batch:
            return df.withColumn(
                "batch_id",
                F.col("batch_id").cast(phys["batch_id"].dataType))
        return df.drop("batch_id")

    if has_manifest and store.current_version():
        # crash window: commit landed, cleanup didn't.  Verify by
        # CONTENT before deleting — a batch id proves nothing in
        # EITHER direction: a colliding id can come from a fresh-
        # checkpoint dirs-writer carrying new rows (silent data loss
        # if trusted), and an ABSENT id can be the crash leftover
        # itself after compaction pruned the recorded ids to the
        # replayable tail (ADVICE r14: the id-membership gate turned
        # the documented crash recovery into a false 're-ingest'
        # refusal).  Every leftover dir takes the same exceptAll
        # check: fully covered → delete; any uncovered row → refuse.
        committed = store.df()
        leftover = _shape(
            spark.read.option("basePath", path)
            .parquet(*[os.path.join(path, d) for d in batches])
        ).select(*committed.columns)
        uncovered = leftover.exceptAll(committed).count()
        if uncovered:
            raise RuntimeError(
                f"{path}: leftover batch dirs {ids} carry {uncovered} "
                "row(s) NOT in the committed table — a dirs-writer ran "
                "against the migrated store (a fresh checkpoint "
                "restarts ids at 0, so id collisions mean nothing); "
                "re-ingest those batches explicitly (refusing to "
                "delete)")
        for d in batches:
            shutil.rmtree(os.path.join(path, d))
        return len(batches)
    df = _shape(spark.read.option("basePath", path)
                .parquet(*[os.path.join(path, d) for d in batches]))
    base = store._read_manifest()["version"]
    staged = store._stage(df)
    store._commit(staged, ids, base)       # atomic cut-over
    for d in batches:
        shutil.rmtree(os.path.join(path, d))
    return len(batches)


def _absorb_compacted_store(spark: SparkSession, manifest_path: str,
                            store_path: str,
                            key_col: str | None) -> int:
    """Fold a pre-compaction separate store (compact_stream_store /
    compact_channel_store output) into the migrated manifest at
    ``manifest_path``, then delete it (r15 durability review: without
    this, a deployment that had ever run ``compact`` migrated only the
    residual batch dirs — the compacted BULK of the data became
    unreachable, because every manifest-layout reader refuses a
    ``store_path`` argument by design).  Returns rows absorbed.

    Idempotent across crashes: with ``key_col`` (the keyed ops store)
    only rows whose key is not already committed are appended
    (anti-join — the batch-dir version of a key wins, matching
    compact's own key-idempotent dedup); without one (the append-only
    channels store) the full-row remainder (``exceptAll``) is appended.
    A re-run after a crash between the append commit and the store
    delete finds an empty remainder and just finishes the delete."""
    ms = ManifestStore(spark, manifest_path)
    store_df = spark.read.parquet(store_path)
    if ms.current_version():
        committed = ms.df()
        store_df = store_df.select(*committed.columns)
        remainder = (store_df.join(committed.select(key_col).distinct(),
                                   key_col, "left_anti")
                     if key_col else store_df.exceptAll(committed))
    else:
        remainder = store_df
    n = remainder.count()
    if n:
        ms.append(remainder)
    shutil.rmtree(store_path)
    return n


def migrate_sink_to_manifest(spark: SparkSession, ops_path: str,
                             channels_path: str | None = None,
                             store_path: str | None = None,
                             channels_store_path: str | None = None) -> dict:
    """Migrate a WHOLE legacy dir-layout sink — the ops store, its
    ``<ops>_meta`` HWM sibling, and (when given) the channels store —
    because a sink is three dirs-layout stores, and a stream resumed
    with the manifest default aborts on the FIRST un-migrated one
    (the mixed-layout refusal in the batch writer).  ``store_path`` /
    ``channels_store_path`` name the separate compacted stores an
    earlier ``compact`` produced; their rows are absorbed into the
    migrated manifests and the store dirs removed (see
    _absorb_compacted_store — a migrated manifest cannot take a
    store_path at read time, so leaving them behind stranded the bulk
    of the data).  Returns {store: dirs_absorbed} plus
    {store_rows, channels_store_rows} when stores were absorbed."""
    # explicit no-dirs probe instead of catching FileNotFoundError
    # (r15 self-review: the catch also swallowed ManifestStore.df()'s
    # broken-manifest error from the content-verification branch,
    # bypassing the designed loud refusal and mutating sibling stores
    # before failing with a misleading message)
    has_dirs = os.path.isdir(ops_path) and any(
        d.startswith("batch_id=") for d in os.listdir(ops_path))
    if has_dirs or is_manifest_store(ops_path):
        out = {"ops": migrate_dirs_to_manifest(spark, ops_path)}
    elif store_path and os.path.isdir(store_path):
        # fully-compacted sink: every batch dir already folded into the
        # separate store — the absorb below creates the manifest
        out = {"ops": 0}
    else:
        raise FileNotFoundError(
            f"{ops_path} has no batch_id=N dirs to migrate")
    for label, p in (("meta", ops_path + "_meta"), ("channels",
                                                    channels_path)):
        if p and os.path.isdir(p) and (
                is_manifest_store(p)
                or any(d.startswith("batch_id=") for d in os.listdir(p))):
            out[label] = migrate_dirs_to_manifest(spark, p)
        else:
            out[label] = 0
    if store_path and os.path.isdir(store_path):
        out["store_rows"] = _absorb_compacted_store(
            spark, ops_path, store_path, "key")
    if channels_store_path and os.path.isdir(channels_store_path):
        if not channels_path:
            # silent skip here would strand the channel history the
            # caller explicitly asked to absorb (r15 self-review)
            raise ValueError(
                "channels_store_path given without channels_path — the "
                "absorbed rows need a channels manifest to land in; "
                "pass the sink's channels dir")
        out["channels_store_rows"] = _absorb_compacted_store(
            spark, channels_path, channels_store_path, None)
    return out
