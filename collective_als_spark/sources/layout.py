"""Lake-layout management: file-level data-skipping statistics and
versioned snapshot manifests over plain parquet directories.

These are the two storage-engine capabilities a 100 TB lake needs that
raw `spark.read.parquet(dir)` can't give:

- **Data skipping** (`build_stats_index` / `pruned_read`): parquet
  footers carry per-file min/max, but Spark's directory scan still has
  to OPEN every footer to use them — at millions of files the
  open/list cost dominates selective scans. Iceberg/Delta solve this
  with a manifest of per-file column stats consulted BEFORE the scan.
  Here the same idea is a plain DataFrame: one column-pruned pass
  collects per-file min/max into a tiny stats table; `pruned_read`
  intersects a predicate interval with it and hands Spark only the
  surviving file list. The residual filter is still applied, so the
  result is EXACTLY the full scan's — pruning is a pure optimization
  and is asserted as such in tests/test_layout_storage.py.

- **Snapshot isolation / time travel** (`SnapshotTable`): object
  stores have no atomic multi-file commit, so concurrent readers of a
  directory being overwritten see torn state. The manifest pattern
  (Iceberg's core idea) fixes this with one level of indirection:
  immutable data files + a versioned JSON manifest listing the files
  of each snapshot + a single atomically-replaced `current` pointer.
  Appends and overwrites write NEW files only, then flip the pointer;
  readers pin a manifest and are isolated from later commits; old
  versions stay readable until expired.

Both operate on local paths in tests but contain no local-FS
assumptions beyond `os.replace` atomicity for the pointer file (the
same primitive Delta's LogStore needs from its backing store).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# data-skipping stats index
# ---------------------------------------------------------------------------


def build_stats_index(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Collect per-file min/max for ``columns`` over a parquet directory.

    One scan reading ONLY the indexed columns (+ the implicit file
    name); the per-file agg is two-phase (map-side partial per input
    split, one tiny final shuffle of |files| rows). The result is the
    manifest-style stats table: ``file, <col>_min, <col>_max`` per file.

    At 100 TB this runs once per table (or incrementally per ingest
    batch — union the new files' rows) and is itself a small parquet
    table; the scan cost is amortized over every selective query that
    then skips files. Layout matters: the index only skips well if the
    data is clustered on the indexed columns (sorted write, partition,
    or z-order via functions.vector.zorder_key — the multi-column
    clustering this index pairs with).
    """
    aggs = []
    for c in columns:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), *columns)
        .groupBy("file")
        .agg(*aggs)
    )


def update_stats_index(
    spark: SparkSession, stats: DataFrame, new_files: list[str], columns: list[str]
) -> DataFrame:
    """Incremental index maintenance: scan ONLY the newly ingested
    files and union their per-file rows into the existing stats table
    (latest row wins per file, so re-stating a rewritten file is safe).
    This is how the index keeps up with streaming ingest at 100 TB —
    the alternative, re-scanning the whole table per batch, costs more
    than the skipping saves."""
    if not new_files:
        return stats
    aggs = []
    for c in columns:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    fresh = (
        spark.read.parquet(*new_files)
        .select(F.input_file_name().alias("file"), *columns)
        .groupBy("file")
        .agg(*aggs)
    )
    return (
        stats.join(fresh.select("file"), "file", "left_anti").unionByName(fresh)
    )


def prune_files(stats: DataFrame, column: str, lo, hi) -> list[str]:
    """Files whose [min,max] range for ``column`` intersects [lo,hi].

    Interval-overlap test on the stats table: a file can contain a
    matching row iff ``max >= lo and min <= hi``. NULL stats (all-null
    file) are kept conservatively — pruning must never drop a file it
    can't prove empty of matches.
    """
    keep = ~((F.col(f"{column}_max") < F.lit(lo)) | (F.col(f"{column}_min") > F.lit(hi)))
    rows = stats.filter(keep | F.col(f"{column}_min").isNull()).select("file").collect()
    return [r["file"] for r in rows]


def pruned_read(
    spark: SparkSession, stats: DataFrame, column: str, lo, hi
) -> DataFrame:
    """Read only the files the stats index can't rule out, then apply
    the exact predicate as a residual filter (pushed into each file's
    row-group scan as usual). Equivalent to
    ``spark.read.parquet(dir).filter(lo <= col <= hi)`` by
    construction; the win is the files never opened.

    The collect is bounded: one row per surviving FILE (the stats
    table is manifest-sized, not data-sized).
    """
    files = prune_files(stats, column, lo, hi)
    if not files:
        any_file = [r["file"] for r in stats.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("stats index is empty — no files to read")
        # all files pruned: keep the schema, emit zero rows, open nothing
        return spark.read.parquet(*any_file).filter(F.lit(False))
    return (
        spark.read.parquet(*files)
        .filter(F.col(column).between(F.lit(lo), F.lit(hi)))
    )


# ---------------------------------------------------------------------------
# snapshot manifests (Iceberg-lite)
# ---------------------------------------------------------------------------


class SnapshotTable:
    """Versioned parquet table: immutable data files + JSON manifests +
    an atomically-replaced ``current`` pointer.

    Layout::

        <root>/data/<commit-uuid>/part-*.parquet   (immutable once committed)
        <root>/_snapshots/v<N>.json                ({"version", "files": [...]})
        <root>/_snapshots/current                  (text: latest version number)

    Commit protocol (the only ordering that is crash-safe without an
    atomic multi-file primitive):

    1. write the new data files to a fresh ``data/<uuid>/`` dir —
       invisible to readers (nothing references them);
    2. write manifest ``v<N+1>.json`` — still invisible;
    3. ``os.replace`` a temp pointer over ``current`` — the single
       atomic step that makes the snapshot live.

    A crash before (3) leaves orphan files (cleaned by ``expire``) and
    the table readable at the previous version. Readers resolve
    ``current`` once, then read a pinned manifest — concurrent commits
    can't tear their view. This is exactly the Iceberg/Delta commit
    core, minus optimistic-concurrency retry (single-writer assumed).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        os.makedirs(f"{self.root}/_snapshots", exist_ok=True)
        os.makedirs(f"{self.root}/data", exist_ok=True)

    # -- internals

    def _manifest_path(self, version: int) -> str:
        return f"{self.root}/_snapshots/v{version}.json"

    def current_version(self) -> int:
        """0 = empty table (no committed snapshot)."""
        try:
            with open(f"{self.root}/_snapshots/current") as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _commit(self, files: list[str], markers: dict[str, int] | None = None) -> int:
        """`markers` (streaming writer id -> last committed batch id)
        rides INSIDE the manifest so it becomes visible in the same
        atomic pointer flip as the data — a crash can never separate
        'batch committed' from 'batch recorded' (the dedup guard the
        streaming sink's exactly-once claim rests on)."""
        version = self.current_version() + 1
        manifest = {"version": version, "files": sorted(files)}
        if markers:
            manifest["batch_markers"] = markers
        with open(self._manifest_path(version), "w") as f:
            json.dump(manifest, f)
        tmp = f"{self.root}/_snapshots/current.tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, f"{self.root}/_snapshots/current")  # the atomic flip
        return version

    def _current_markers(self) -> dict[str, int]:
        if not self.current_version():
            return {}
        return self._manifest(self.current_version()).get("batch_markers", {})

    def _write_data(self, df: DataFrame) -> list[str]:
        commit_dir = f"{self.root}/data/{uuid.uuid4().hex}"
        df.write.mode("error").parquet(commit_dir)
        return [
            f"{commit_dir}/{name}"
            for name in os.listdir(commit_dir)
            if name.endswith(".parquet")
        ]

    # -- public API

    def append(self, df: DataFrame, _markers: dict[str, int] | None = None) -> int:
        """New snapshot = previous files + this commit's files.
        Streaming batch markers carry forward (a non-streaming commit
        must not erase a streaming writer's dedup state)."""
        prev = (
            self._manifest(self.current_version())["files"]
            if self.current_version()
            else []
        )
        markers = self._current_markers() | (_markers or {})
        return self._commit(prev + self._write_data(df), markers)

    def overwrite(self, df: DataFrame) -> int:
        """New snapshot = this commit's files only. The replaced files
        are NOT deleted — older versions still reference them. Batch
        markers carry forward (see append)."""
        return self._commit(self._write_data(df), self._current_markers())

    def read(self, version: int | None = None) -> DataFrame:
        """Read a snapshot (default: current). Time travel = pass an
        older version; the manifest pins the exact file list, so the
        read is reproducible regardless of later commits."""
        v = self.current_version() if version is None else version
        if v == 0:
            raise ValueError("empty table: no committed snapshot")
        files = self._manifest(v)["files"]
        return self.spark.read.parquet(*files)

    def compact(self, target_rows_per_file: int) -> int:
        """Small-file compaction as a COMMIT: read the current
        snapshot, rewrite into ceil(rows/target) round-robin files, and
        commit the rewrite as a new version. Unlike the in-place
        directory swap (`files.compact_small_files`), readers of older
        versions are untouched — the pre-compaction snapshot stays
        time-travelable until expired, and a crash mid-compaction
        leaves only orphan files. This is how maintenance must work on
        a versioned table: data files are immutable, so compaction is
        just another writer."""
        import math

        cur = self.read()
        n = cur.count()
        n_files = max(1, math.ceil(n / target_rows_per_file))
        return self.overwrite(cur.repartition(n_files))

    def wap_commit(
        self,
        df: DataFrame,
        checks: list[dict],
        mode: str = "append",
        _markers: dict[str, int] | None = None,
    ) -> int:
        """Write-Audit-Publish: stage the data files, audit WHAT WAS
        WRITTEN (the staged files are read back, so the audit sees
        exactly the bytes readers would), and only then flip the
        pointer. A failing audit raises with the violations and leaves
        the table at its previous version — the staged files are
        unreferenced orphans that the next `expire` removes.

        This is the canonical quality gate for a 100 TB ingest: bad
        batches never become visible, and the audit artifact is
        persisted next to the manifest (`v<N>.audit.json`) as commit
        provenance. Checks use the fused expectations engine
        (operators/expectations.py): one scan of the staged files for
        all row-level constraints.
        """
        from collective_als_spark.operators.expectations import run_checks

        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown mode {mode!r}")
        files = self._write_data(df)
        audit_rows = [
            r.asDict() for r in run_checks(self.spark.read.parquet(*files), checks).collect()
        ]
        failed = [r for r in audit_rows if not r["passed"]]
        if failed:
            raise ValueError(
                "wap_commit audit failed; table unchanged at version "
                f"{self.current_version()}: "
                + ", ".join(f"{r['check']} (metric={r['metric']})" for r in failed)
            )
        prev = (
            self._manifest(self.current_version())["files"]
            if mode == "append" and self.current_version()
            else []
        )
        markers = self._current_markers() | (_markers or {})
        version = self._commit(prev + files, markers)
        with open(f"{self.root}/_snapshots/v{version}.audit.json", "w") as f:
            json.dump(audit_rows, f, default=str)
        return version

    def streaming_sink(self, checkpoint_dir: str, checks: list[dict] | None = None):
        """foreachBatch writer committing every micro-batch as an
        atomic snapshot append (optionally WAP-audited). Concurrent
        batch readers pin a manifest, so they NEVER observe a torn
        micro-batch — the property a raw parquet file-sink cannot give.
        Use as::

            q = (stream.writeStream
                 .option("checkpointLocation", ckpt)
                 .foreachBatch(table.streaming_sink(ckpt))
                 .start())

        Exactly-once note: Structured Streaming replays a failed batch;
        an append re-commit of a replayed batch would double rows. The
        dedup guard is a (writer, last-batch-id) marker stored INSIDE
        the manifest, so it commits in the same atomic pointer flip as
        the data — a crash can never land between "rows visible" and
        "batch recorded" (the two-file version of this pattern has
        exactly that double-append window). The writer id is derived
        from ``checkpoint_dir``, so independent queries (each with its
        own checkpoint, each restarting batch ids at 0) writing to one
        table keep separate markers and cannot swallow each other's
        batches; batch ids are monotonic per checkpoint, which is what
        makes the ``<=`` comparison a correct replay test.
        """
        import hashlib

        writer_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            if self._current_markers().get(writer_id, -1) >= batch_id:
                return  # replayed batch: already committed atomically
            markers = {writer_id: batch_id}
            if checks:
                self.wap_commit(batch_df, checks, mode="append", _markers=markers)
            else:
                self.append(batch_df, _markers=markers)

        return write_batch

    def expire(self, keep_last: int = 1) -> int:
        """Drop manifests older than the last ``keep_last`` versions
        and delete data files no retained manifest references (orphans
        from crashed commits included). Returns files deleted.

        Deletion order is manifest-first so a crash mid-expire never
        leaves a live manifest pointing at deleted files.
        """
        if keep_last < 1:
            raise ValueError(
                f"keep_last must be >= 1 (got {keep_last}): the current "
                f"version must stay readable"
            )
        cur = self.current_version()
        keep_versions = set(range(max(1, cur - keep_last + 1), cur + 1))
        referenced: set[str] = set()
        for v in keep_versions:
            # a prior expire(keep_last=small) may have already deleted
            # manifests inside this range; raising here would abort
            # maintenance forever (orphans accumulate) — a missing
            # manifest references nothing, so skip it
            try:
                referenced.update(self._manifest(v)["files"])
            except FileNotFoundError:
                continue
        for v in range(1, cur + 1):
            if v not in keep_versions:
                for stale in (
                    self._manifest_path(v),
                    f"{self.root}/_snapshots/v{v}.audit.json",
                ):
                    try:
                        os.remove(stale)
                    except FileNotFoundError:
                        pass
        deleted = 0
        data_root = f"{self.root}/data"
        for commit in list(os.listdir(data_root)):
            cdir = f"{data_root}/{commit}"
            live = {
                f"{cdir}/{n}" for n in os.listdir(cdir) if n.endswith(".parquet")
            }
            if live and not (live & referenced):
                deleted += len(live)
                shutil.rmtree(cdir)
        return deleted
