"""Structured-Streaming CHANGE-DATA-FEED source for the snapshot
table — `spark.readStream.format("snapshot_cdf")` over a
`sources/layout.py::SnapshotTable` root, the way Delta tables are
consumed with `readStream.option("readChangeFeed", ...)`.

Built on PySpark 4's Python DataSource API (`pyspark.sql.datasource`):
the driver-side `DataSourceStreamReader` plans one INPUT PARTITION per
changed file per commit (offsets = table versions, so progress is
checkpoint-exact and replays are deterministic — manifests and data
files are immutable), and the executor-side `read()` opens exactly one
parquet file with pyarrow and yields Arrow RecordBatches — the scan
stays vectorized end-to-end, no row-at-a-time Python.

Semantics (mirrors `SnapshotTable.changes_by_version`):
- each row carries `_change_type` (insert/delete; an update is its
  delete+insert pair) and `_commit_version` (the commit that produced
  it — not netted across the window);
- merge-on-read deletes surface as `delete` rows computed from the
  DELTA between the two versions' deletion-vector position sets —
  only the DV files and the affected data file are opened;
- commits whose manifest `op` is "compact" are data-preserving
  rewrites (Delta's `dataChange=false`): they are SKIPPED entirely,
  so maintenance churn never floods downstream consumers;
- per-commit cost is O(that commit's changed files); a 100 TB table
  with small commits streams changes at delta cost.

Scale shape: offsets/planning read only manifest JSON (driver,
metadata-sized); each partition reads one data file (+ its DV files)
on an executor — the same parallelism a native file source gets.

Storage: all manifest/data IO routes through ``pyarrow.fs`` when the
table root carries a URI scheme (``file:``, ``s3:``, ``hdfs:``,
``gs:``, ...) and plain ``os`` for bare local paths — the pure-Python
sibling of ``sources/logstore.py``'s per-scheme LogStore. The JVM
LogStore itself is unusable here because the Python DataSource
planning thread runs in a separate worker with no py4j bridge; pyarrow
filesystems give the same reach (a 100 TB table on object storage)
without it.

Retention interacts with streaming the same way Delta's does: if
`expire()` drops a manifest the checkpoint still needs, planning
raises a clear error instead of silently skipping commits.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructType

_VERSION_RE = re.compile(r"^v(\d+)\.json$")


def _fs_split(path: str):
    """(filesystem, fs-native path) for ``path``: ``(None, path)`` for
    bare local paths (plain ``os`` IO, no dependency), else the
    ``pyarrow.fs`` filesystem the URI scheme resolves to and the
    scheme-less path it expects. Paths inside manifests carry the same
    scheme as the table root, so every helper below re-dispatches."""
    if "://" in path or path.startswith("file:"):
        from pyarrow import fs as pafs

        return pafs.FileSystem.from_uri(path)
    return None, path


def _list_dir(path: str) -> list[str]:
    fs_, p = _fs_split(path)
    if fs_ is None:
        try:
            return os.listdir(p)
        except FileNotFoundError:
            return []
    from pyarrow import fs as pafs

    infos = fs_.get_file_info(pafs.FileSelector(p, allow_not_found=True))
    return [i.base_name for i in infos]


def _snap_dir(root: str) -> str:
    return f"{root.rstrip('/')}/_snapshots"


def _exists(path: str) -> bool:
    fs_, p = _fs_split(path)
    if fs_ is None:
        return os.path.exists(p)
    from pyarrow import fs as pafs

    return fs_.get_file_info(p).type != pafs.FileType.NotFound


def _current_version(root: str) -> int:
    # hint-first head resolution (the SnapshotTable commit path writes
    # _head.json best-effort): a fresh hint costs one read + one miss
    # per latestOffset() poll instead of an O(retained-versions)
    # listing; anything wrong with the hint falls back to the listing
    snap = _snap_dir(root)
    try:
        v = int(_read_json(f"{snap}/_head.json")["version"])
    except Exception:
        v = None
    if v is not None and v >= 1 and _exists(f"{snap}/v{v}.json"):
        while _exists(f"{snap}/v{v + 1}.json"):
            v += 1
        return v
    names = _list_dir(snap)
    versions = [
        int(m.group(1)) for m in (_VERSION_RE.match(n) for n in names) if m
    ]
    return max(versions, default=0)


def _checkpoint_version(root: str) -> int | None:
    """Max over immutable ``_checkpoints/v{N}`` marker files, with the
    frozen legacy ``_last_checkpoint.json`` as a read-only floor
    (mirror of ``SnapshotTable._checkpoint_version`` — see layout.py
    for the structural-monotonicity argument that replaces the racy
    read-check-overwrite of a single marker file)."""
    best = 0
    for name in _list_dir(f"{_snap_dir(root)}/_checkpoints"):
        if name.startswith("v"):
            try:
                best = max(best, int(name[1:]))
            except ValueError:
                continue
    try:
        best = max(
            best,
            int(_read_json(f"{_snap_dir(root)}/_last_checkpoint.json")["version"]),
        )
    except Exception:
        pass
    return best if best >= 1 else None


def _write_checkpoint(root: str, version: int) -> None:
    """Best-effort marker advance: ADD an immutable versioned file —
    never overwrite — so a stalled writer's late PUT of an old version
    cannot regress the max (mirror of
    ``SnapshotTable._write_checkpoint``). Identical content per name
    makes racing same-version writers harmless on overwrite stores."""
    try:
        cur = _checkpoint_version(root)
        if cur is not None and cur >= version:
            return
        _write_json_atomic(
            f"{_snap_dir(root)}/_checkpoints/v{version}",
            {"version": version},
        )
    except Exception:
        pass


def _listed_version(root: str) -> int:
    """COMMIT-path head resolver (pure-python mirror of
    ``SnapshotTable._listed_version``, layout.py — see its docstring
    for the full fork-safety argument). The ``_head.json`` hint is
    NEVER trusted here: a hint lagging k commits across a concurrent
    ``expire`` lets the forward probe stop at a mid-expire gap and a
    commit composed there recreates an expired ``v{N}.json``, forking
    the log. The ``_last_checkpoint.json`` marker IS probe-safe — it
    advances monotonically, every expire advances it to its head
    BEFORE deleting anything, so `marker unchanged across the probe`
    proves the probed range was gap-free. No/stale marker falls back
    to the full listing (gap-immune, O(retained versions))."""
    for _ in range(3):
        marker = _checkpoint_version(root)
        if marker is None or not _exists(f"{_snap_dir(root)}/v{marker}.json"):
            break
        head = marker
        while _exists(f"{_snap_dir(root)}/v{head + 1}.json"):
            head += 1
        if _checkpoint_version(root) == marker:
            return head
    names = _list_dir(_snap_dir(root))
    return max(
        (int(m.group(1)) for m in (_VERSION_RE.match(n) for n in names) if m),
        default=0,
    )


def _read_json(path: str) -> dict:
    fs_, p = _fs_split(path)
    if fs_ is None:
        with open(p, "r") as f:
            return json.load(f)
    with fs_.open_input_stream(p) as f:
        return json.loads(f.read().decode("utf-8"))


def _write_json_atomic(path: str, obj: dict) -> None:
    """Overwrite-write via a temp sibling + rename so a concurrent
    reader never sees a torn file (the cursor below is advisory, but a
    half-written JSON would crash planning instead of degrading)."""
    data = json.dumps(obj)
    fs_, p = _fs_split(path)
    if fs_ is None:
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = f"{p}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, p)
        return
    fs_.create_dir(p.rsplit("/", 1)[0], recursive=True)
    tmp = f"{p}.tmp.{uuid.uuid4().hex}"
    with fs_.open_output_stream(tmp) as f:
        f.write(data.encode("utf-8"))
    try:
        fs_.move(tmp, p)
    except OSError:
        # object stores without atomic rename: plain overwrite —
        # last-writer-wins is fine for an advisory monotonic cursor
        with fs_.open_output_stream(p) as f:
            f.write(data.encode("utf-8"))
        fs_.delete_file(tmp)


def _rel(path: str) -> str:
    parts = path.rstrip("/").split("/")
    return "/".join(parts[-2:])


def _resolve_manifest(root: str, version: int) -> dict:
    """Raw (possibly chunked) manifest -> {files, dvs, op, schema}
    without a SparkSession — the pure-python mirror of
    SnapshotTable._resolve for the planning thread."""
    if version == 0:
        return {"files": [], "dvs": {}, "op": None, "schema": None}
    path = f"{_snap_dir(root)}/v{version}.json"
    try:
        raw = _read_json(path)
    except FileNotFoundError:
        raise RuntimeError(
            f"snapshot_cdf: manifest v{version} at {root} was expired "
            "while a streaming checkpoint still needed it — widen the "
            "table's retention (expire keep_last/older_than) past the "
            "stream's max restart lag"
        )
    except OSError:
        # pyarrow.fs backends surface missing object-store paths as
        # generic OSError ("Path does not exist"), not FileNotFoundError
        # — distinguish expiry from a transient IO fault with an
        # existence check so the retention guidance still reaches the
        # operator (a real transient fault re-raises for the engine's
        # retry)
        if not _exists(path):
            raise RuntimeError(
                f"snapshot_cdf: manifest v{version} at {root} was expired "
                "while a streaming checkpoint still needed it — widen the "
                "table's retention (expire keep_last/older_than) past the "
                "stream's max restart lag"
            )
        raise
    if "chunks" in raw:
        dead = set(raw.get("dead", []))
        files: list[str] = []
        for cname in raw["chunks"]:
            chunk = _read_json(f"{_snap_dir(root)}/{cname}")
            files.extend(f for f in chunk["files"] if _rel(f) not in dead)
    else:
        files = list(raw.get("files", []))
    return {
        "files": files,
        "dvs": raw.get("dvs", {}),
        "op": raw.get("op"),
        "schema": raw.get("schema"),
        "cdc": raw.get("cdc"),
        # metadata-only rename support: files store PHYSICAL names,
        # the stream presents LOGICAL ones through this map
        "column_mapping": raw.get("column_mapping") or {},
    }


def _first_version_at_or_after(root: str, ts: float) -> int:
    """Smallest retained version whose commit timestamp is >= ``ts``
    (Delta's startingTimestamp rule: the first commit the instant
    could have observed). Walks BACKWARD from the head so the cost is
    O(versions newer than ts) — the usual shape where ts is recent.
    An instant after the newest commit errors (nothing to stream from
    it would silently mean 'everything forever'); an instant before
    every retained commit streams the full retained history."""
    head = _current_version(root)
    if head == 0:
        raise ValueError(f"snapshot_cdf: no committed snapshot at {root}")
    best = None
    for v in range(head, 0, -1):
        path = f"{_snap_dir(root)}/v{v}.json"
        if not _exists(path):
            break  # older versions expired
        ct = _read_json(path).get("committed_at")
        if ct is None or float(ct) >= ts:
            # timestamp-less (legacy) manifests count as "at or after"
            # conservatively: better to re-emit than silently skip
            best = v
        else:
            break  # commits are time-ordered: nothing older qualifies
    if best is None:
        raise ValueError(
            f"snapshot_cdf: startingTimestamp {ts} is after the newest "
            f"commit (v{head}) — nothing to stream from that instant; "
            f"use startingVersion, or a timestamp at or before the head"
        )
    return best


def _file_size(path: str) -> int:
    fs_, p = _fs_split(path)
    if fs_ is None:
        try:
            return os.path.getsize(p)
        except OSError:
            return 0
    info = fs_.get_file_info(p)
    return int(info.size or 0)


def _changed_bytes(prev: dict, cur: dict) -> int:
    """Bytes a CDF consumer reads for the ``prev -> cur`` commit: the
    added/removed/DV-remapped files (or the writer change files when
    recorded) — the same per-commit file diff ``partitions()`` plans,
    priced by a metadata stat per changed file. Compaction commits are
    dataChange=false and cost nothing downstream."""
    if cur["op"] == "compact":
        return 0
    if cur.get("cdc"):
        base = cur["cdc"].rstrip("/")
        return sum(
            _file_size(f"{base}/{n}")
            for n in _list_dir(cur["cdc"])
            if n.endswith(".parquet")
        )
    f_prev, f_cur = set(prev["files"]), set(cur["files"])
    changed = (f_cur - f_prev) | (f_prev - f_cur)
    dv_prev, dv_cur = prev["dvs"], cur["dvs"]
    changed |= {
        f
        for f in f_prev & f_cur
        if dv_prev.get(_rel(f)) != dv_cur.get(_rel(f))
    }
    return sum(_file_size(f) for f in changed)


@dataclass
class CdfPartition(InputPartition):
    """One changed data file in one commit. ``kind``:
    - "insert": file added at ``version`` (rows minus its DV at
      ``version``, normally none, are inserts)
    - "delete": file removed at ``version`` (rows minus its DV at
      ``version - 1`` are deletes)
    - "dv_diff": file present on both sides with a different DV
      mapping — position-set delta decides per-row direction
    - "cdc": a writer-recorded change file (COW merge/delete on a
      ``change_data_feed=True`` table): rows already carry their
      ``_change_type``
    """

    kind: str
    file: str
    version: int
    dv_old: str | None = None
    dv_new: str | None = None
    value: int = field(default=0)  # satisfies InputPartition repr


def _dv_positions(dv_dir: str | None, rel: str) -> set[int]:
    if dv_dir is None:
        return set()
    import pyarrow.dataset as ds

    fs_, p = _fs_split(dv_dir)
    dataset = ds.dataset(p, format="parquet", filesystem=fs_)
    tbl = dataset.to_table(filter=ds.field("file") == rel, columns=["pos"])
    return set(tbl.column("pos").to_pylist())


class SnapshotCdfStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("snapshot_cdf requires .option('path', <root>)")
        # startingVersion is INCLUSIVE, matching Delta's
        # readChangeFeed: the named version's changes are emitted.
        # Offsets record the last CONSUMED version, so the initial
        # offset is startingVersion - 1 (the default startingVersion=1
        # consumes the table's full history). startingTimestamp
        # (Delta's readChangeFeed sibling) resolves to the FIRST
        # commit at or after the instant — the natural "changes since
        # <time>" anchor; mutually exclusive with startingVersion.
        ts_opt = options.get("startingtimestamp")
        if ts_opt is not None and options.get("startingversion") is not None:
            raise ValueError(
                "snapshot_cdf: pass either startingVersion or "
                "startingTimestamp, not both"
            )
        if ts_opt is not None:
            self.start_offset = max(
                0, _first_version_at_or_after(self.root, float(ts_opt)) - 1
            )
        else:
            self.start_offset = max(
                0, int(options.get("startingversion", 1)) - 1
            )
        self.max_versions = int(options.get("maxversionsperbatch", 100))
        # byte-based admission (Delta's maxBytesPerTrigger): version
        # sizes vary wildly — a metadata-only MOR upsert vs a backfill
        # append — so a version cap alone can still plan a huge batch
        mb = options.get("maxbytesperbatch")
        self.max_bytes = int(mb) if mb is not None else None
        self.skip_change_commits = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")
        self._schema = schema
        # logical -> physical name map, pinned at stream start like
        # the schema itself (consumers restart to pick up renames,
        # exactly as they do for widened schemas)
        cur0 = _current_version(self.root)
        self._phys = (
            _resolve_manifest(self.root, cur0)["column_mapping"]
            if cur0
            else {}
        )
        # Admission-control seed. The Python DataSource API never
        # shows latestOffset() the committed start (no
        # SupportsAdmissionControl equivalent), so a checkpoint
        # restart would otherwise plan ONE batch spanning the whole
        # backlog — a week of downtime as a single micro-batch. The
        # cursor file persists the last COMMITTED offset per stream
        # (written in commit(), read here) purely to clamp batch
        # sizing; correctness never depends on it. Streams sharing a
        # table root must set distinct cursorId options.
        self.cursor_id = str(options.get("cursorid", "default"))
        self._last_end: int | None = None
        # exactly-once floor: the highest version this reader has
        # planned through. Raised from the engine's committed start
        # (authoritative) on every partitions() call; persisted into
        # the cursor only by the backward-batch healing path (see
        # partitions) so a crash inside a heal window cannot re-emit.
        self._floor = 0
        try:
            cur = _read_json(self._cursor_path())
            self._last_end = int(cur["version"])
            self._floor = int(cur.get("floor", 0))
        except (FileNotFoundError, OSError, KeyError, ValueError):
            pass

    def _cursor_path(self) -> str:
        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", self.cursor_id)
        return f"{self.root.rstrip('/')}/_cursors/{safe}.json"

    def initialOffset(self) -> dict:
        # a FRESH stream (empty checkpoint) starts at the configured
        # floor — a stale cursor (or heal floor) left by a deleted
        # checkpoint must not skip history, so both seeds are
        # overridden here
        self._last_end = self.start_offset
        self._floor = self.start_offset
        return {"version": self.start_offset}

    def latestOffset(self) -> dict:
        cur = _current_version(self.root)
        # admission control (Delta's maxFilesPerTrigger shape): advance
        # at most max_versions commits past the last known position so
        # a backlogged stream catches up in bounded micro-batches —
        # including the FIRST batch (the engine may call latestOffset
        # before initialOffset, so a fresh stream seeds from the
        # configured floor) and the first batch after a restart
        # (cursor-seeded in __init__)
        seed = max(
            self._last_end if self._last_end is not None else self.start_offset,
            self._floor,
        )
        hi = min(cur, seed + self.max_versions)
        if self.max_bytes is not None and hi > seed:
            # walk forward pricing each commit's changed files until
            # the budget is spent — always admitting at least one
            # commit so an oversized single commit still progresses
            # (Delta's AdmissionLimits rule). Cost: one metadata stat
            # per changed file in the ADMITTED window, not the backlog.
            spent = 0
            admitted = seed
            prev = _resolve_manifest(self.root, seed)
            for v in range(seed + 1, hi + 1):
                m = _resolve_manifest(self.root, v)
                b = _changed_bytes(prev, m)
                if admitted > seed and spent + b > self.max_bytes:
                    break
                spent += b
                admitted = v
                prev = m
                if spent >= self.max_bytes:
                    break
            hi = admitted
        return {"version": max(hi, self.start_offset)}

    def partitions(self, start: dict, end: dict):
        sv, ev = int(start["version"]), int(end["version"])
        # the committed start is authoritative: everything at or below
        # it (or below a persisted heal floor) has already been emitted
        self._floor = max(self._floor, sv)
        if ev < self._floor:
            # the advisory cursor lagged the real committed offset (a
            # missing/deleted cursor file under a deep checkpoint, a
            # foreign stream sharing cursorId, or maxVersionsPerBatch
            # shrunk across a crash), so the engine planned a BACKWARD
            # batch. Replaying it would re-emit committed versions;
            # failing it would dead-end the stream on every trigger.
            # Self-heal instead: emit NOTHING for this batch, raise
            # the in-process seed so the next latestOffset() moves
            # forward again, and persist the floor into the cursor —
            # a crash before the next successful commit then restarts
            # with the floor intact, never duplicating. (Distinct
            # streams must still use distinct cursorId options; a
            # foreign heal's floor can skip this stream's unread
            # versions, the documented shared-cursor hazard.)
            self._last_end = self._floor
            try:
                _write_json_atomic(
                    self._cursor_path(),
                    {"version": self._floor, "floor": self._floor},
                )
            except OSError:
                pass  # advisory: next partitions() heals again
            return [CdfPartition("noop", "", ev)]
        self._last_end = max(ev, self._floor)
        # skip versions at or below the floor: after a heal, the
        # engine's start can sit BELOW versions already emitted before
        # the backward batch (its committed offset regressed with it);
        # _floor == sv on every normal batch, so this is then just sv
        start_v = self._floor
        parts: list[CdfPartition] = []
        prev = _resolve_manifest(self.root, start_v) if start_v else None
        for v in range(start_v + 1, ev + 1):
            cur = _resolve_manifest(self.root, v)
            if prev is None:
                prev = _resolve_manifest(self.root, v - 1)
            if cur["op"] == "compact":
                prev = cur  # dataChange=false: no rows to emit
                continue
            if cur["cdc"]:
                # writer-recorded logical change files (COW merge /
                # delete on a change_data_feed=True table): the exact
                # pre/post images, no rewrite churn
                for name in sorted(_list_dir(cur["cdc"])):
                    if name.endswith(".parquet"):
                        parts.append(
                            CdfPartition(
                                "cdc", f"{cur['cdc'].rstrip('/')}/{name}", v
                            )
                        )
                prev = cur
                continue
            is_rewrite = bool(set(prev["files"]) - set(cur["files"])) and bool(
                set(cur["files"]) - set(prev["files"])
            )
            if cur["op"] in ("delete", "merge", "update", "replace") or (
                cur["op"] is None and is_rewrite
            ):
                # a COW rewrite without change files: carried rows in
                # rewritten files are indistinguishable from real
                # changes at the file level (Delta streams refuse these
                # commits the same way unless skipChangeCommits is set).
                # A pre-op manifest (op=None, older table) whose diff
                # is rewrite-shaped — files both added AND removed —
                # could be such a COW merge/delete, so it gets the same
                # treatment: replaying carried rows as delete+insert
                # pairs would corrupt downstream state.
                if self.skip_change_commits:
                    prev = cur
                    continue
                raise RuntimeError(
                    f"snapshot_cdf: commit v{v} is a copy-on-write "
                    f"{cur['op'] or 'rewrite (pre-op manifest)'} on a "
                    "table without change files — create the table "
                    "with change_data_feed=True, or set "
                    ".option('skipChangeCommits', 'true') to skip "
                    "such commits"
                )
            f_prev, f_cur = set(prev["files"]), set(cur["files"])
            dv_prev, dv_cur = prev["dvs"], cur["dvs"]
            for f in sorted(f_cur - f_prev):
                parts.append(
                    CdfPartition("insert", f, v, dv_new=dv_cur.get(_rel(f)))
                )
            for f in sorted(f_prev - f_cur):
                parts.append(
                    CdfPartition("delete", f, v, dv_old=dv_prev.get(_rel(f)))
                )
            for f in sorted(f_prev & f_cur):
                rel = _rel(f)
                if dv_prev.get(rel) != dv_cur.get(rel):
                    parts.append(
                        CdfPartition(
                            "dv_diff",
                            f,
                            v,
                            dv_old=dv_prev.get(rel),
                            dv_new=dv_cur.get(rel),
                        )
                    )
            prev = cur
        if not parts:
            # a window of only compact/no-op commits still needs a
            # planable batch: one empty partition, read() yields nothing
            parts.append(CdfPartition("noop", "", ev))
        return parts

    def read(self, partition: CdfPartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        if partition.kind == "noop":
            return iter([])
        data_fields = StructType(
            [
                f
                for f in self._schema.fields
                if f.name not in ("_change_type", "_commit_version")
            ]
        )
        target = to_arrow_schema(data_fields)
        fs_, fpath = _fs_split(partition.file)
        raw_tbl = pq.read_table(fpath, filesystem=fs_)
        # conform to the stream's declared schema: NULL-pad columns the
        # file predates, drop columns added after the stream started
        # (consumers restart to pick up widened schemas, as with Delta)
        cols = []
        for f in target:
            pname = self._phys.get(f.name, f.name)
            if pname in raw_tbl.column_names:
                cols.append(raw_tbl.column(pname).cast(f.type))
            else:
                cols.append(pa.nulls(raw_tbl.num_rows, f.type))
        tbl = pa.table(cols, schema=target)
        if partition.kind == "cdc":
            # rows carry their own _change_type; stamp the version
            tbl = tbl.append_column(
                "_change_type",
                raw_tbl.column("_change_type").cast(pa.string()),
            ).append_column(
                "_commit_version",
                pa.array([partition.version] * tbl.num_rows, pa.int64()),
            )
            return iter(tbl.to_batches())
        rel = _rel(partition.file)
        n = tbl.num_rows
        pos = pa.array(range(n), pa.int64())

        def emit(t: pa.Table, change: str):
            if t.num_rows == 0:
                return None
            t = t.append_column(
                "_change_type", pa.array([change] * t.num_rows, pa.string())
            ).append_column(
                "_commit_version",
                pa.array([partition.version] * t.num_rows, pa.int64()),
            )
            return t.to_batches()

        out = []
        if partition.kind in ("insert", "delete"):
            dv_dir = (
                partition.dv_new
                if partition.kind == "insert"
                else partition.dv_old
            )
            masked = _dv_positions(dv_dir, rel)
            if masked:
                keep = pc.invert(
                    pc.is_in(pos, value_set=pa.array(sorted(masked), pa.int64()))
                )
                tbl = tbl.filter(keep)
            batches = emit(tbl, partition.kind)
            if batches:
                out.extend(batches)
        else:  # dv_diff: position-set delta decides per-row direction
            old = _dv_positions(partition.dv_old, rel)
            new = _dv_positions(partition.dv_new, rel)
            newly_masked = sorted(new - old)
            unmasked = sorted(old - new)  # restore() can unmask
            for positions, change in ((newly_masked, "delete"), (unmasked, "insert")):
                if not positions:
                    continue
                sel = pc.is_in(
                    pos, value_set=pa.array(positions, pa.int64())
                )
                batches = emit(tbl.filter(sel), change)
                if batches:
                    out.extend(batches)
        return iter(out)

    def commit(self, end: dict) -> None:
        # exact progress lives in the stream checkpoint (manifests are
        # immutable); the cursor only re-seeds admission control after
        # a restart. A failed write fails the batch and is retried, so
        # the cursor never silently lags by more than the crash-lost
        # batch — which the clamp absorbs (end_n <= end_{n-1} + max).
        # Monotonic vs the heal floor: committing a healed (backward)
        # batch must not drag the cursor back under versions already
        # emitted; the floor field is carried until a real batch
        # passes it, then dropped.
        ev = int(end["version"])
        cur = {"version": max(ev, self._floor)}
        if ev < self._floor:
            cur["floor"] = self._floor
        _write_json_atomic(self._cursor_path(), cur)


class SnapshotCdfDataSource(DataSource):
    """`spark.readStream.format("snapshot_cdf").option("path", root)`.

    Options: ``path`` (table root, required), ``startingVersion``
    (INCLUSIVE; default 1 = the table's full history),
    ``startingTimestamp`` (epoch seconds; streams from the first
    commit at or after the instant — mutually exclusive with
    startingVersion),
    ``maxVersionsPerBatch`` (admission control, default 100 commits
    per micro-batch — enforced across restarts via the per-stream
    cursor file), ``maxBytesPerBatch`` (byte-based admission, Delta's
    maxBytesPerTrigger: commits admitted until their changed-file
    bytes exceed the budget, always at least one; default unlimited),
    ``cursorId`` (admission-control cursor name,
    default "default"; give concurrent streams over one table
    distinct ids), ``skipChangeCommits`` (skip COW rewrite commits
    instead of erroring, default false)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_cdf"

    def schema(self):
        root = self.options.get("path")
        if not root:
            raise ValueError("snapshot_cdf requires .option('path', <root>)")
        cur = _current_version(root)
        if cur == 0:
            raise ValueError(f"snapshot_cdf: no committed snapshot at {root}")
        m = _resolve_manifest(root, cur)
        if not m["schema"]:
            raise ValueError(
                f"snapshot_cdf: manifest v{cur} at {root} carries no schema"
            )
        st = StructType.fromJson(m["schema"])
        # present LOGICAL names (the schema on disk is physical)
        inv = {p: l for l, p in m["column_mapping"].items()}
        if inv:
            from pyspark.sql.types import StructField

            st = StructType(
                [
                    StructField(
                        inv.get(f.name, f.name), f.dataType, f.nullable
                    )
                    for f in st.fields
                ]
            )
        return st.add("_change_type", StringType()).add(
            "_commit_version", LongType()
        )

    def streamReader(self, schema: StructType) -> SnapshotCdfStreamReader:
        return SnapshotCdfStreamReader(schema, self.options)


def register_snapshot_cdf(spark) -> None:
    """Register the source for this session; afterwards
    ``spark.readStream.format("snapshot_cdf")`` resolves."""
    spark.dataSource.register(SnapshotCdfDataSource)
