"""Batch-read DataSource for the snapshot table —
``spark.read.format("snapshot").option("path", root)`` over a
``sources/layout.py::SnapshotTable`` root, the way Delta tables are
read with ``spark.read.format("delta")`` (r09 verdict #3: the lake
tier's missing ``spark.read``/SQL surface).

Built on PySpark 4's Python DataSource API, the batch sibling of
``streaming/cdf_source.py``: driver-side planning reads only manifest
JSON through ``pyarrow.fs`` (no SparkSession, object-store capable),
plans ONE input partition per live data file, and the executor-side
``read()`` opens exactly one parquet file with pyarrow, conforms it to
the manifest (table) schema, and anti-masks its deletion-vector
positions — the same merge-on-read semantics ``SnapshotTable.read()``
gives, now reachable from plain ``spark.sql`` over a temp view.

Filter pushdown is the real Catalyst integration: ``pushFilters``
converts Spark's pushed filters (=, <, <=, >, >=, IN, IS [NOT] NULL)
into the shared pruning conjuncts (``sources/predicate.py``) and
prunes the FILE LIST against the manifest min/max/null-count stats —
then returns EVERY filter back to Spark as unhandled, so the engine
re-applies the exact predicate on top. Pruning can only save file
opens, never change results; a filter shape the converter skips costs
scans, not correctness.

Options: ``path`` (required), ``versionAsOf`` (int), ``timestampAsOf``
(epoch seconds; Delta's resolution rule — newest commit at or before
the instant, errors for pre-table or future instants). Mutually
exclusive, like ``SnapshotTable.read``.

Multi-thread sharp edge (Spark, not this source): the
python-datasource WRITE lookup resolves through the JVM
thread-local active session; a fresh Python thread maps to a fresh
JVM thread with none, so ``.save()`` from a worker thread fails with
``ClassNotFoundException: snapshot.DefaultSource``. Pin the session
on such threads first::

    spark._jvm.org.apache.spark.sql.classic.SparkSession \
         .setActiveSession(spark._jsparkSession)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ..streaming.cdf_source import (
    _current_version,
    _dv_positions,
    _exists,
    _fs_split,
    _listed_version,
    _read_json,
    _rel,
    _snap_dir,
    _write_checkpoint,
    _write_json_atomic,
)
from .predicate import conjuncts_from_push_filters, jsonable, prune_files


def _resolve_full(root: str, version: int) -> dict:
    """Raw (possibly chunked) manifest -> {files, stats, dvs, schema}
    without a SparkSession — like the CDF source's resolver but WITH
    the per-file stats (the planner prunes on them)."""
    path = f"{_snap_dir(root)}/v{version}.json"
    try:
        raw = _read_json(path)
    except (FileNotFoundError, OSError):
        if not _exists(path):
            raise ValueError(
                f"snapshot: no manifest v{version} at {root} — the "
                "version never existed or was expired (widen retention "
                "or read a newer version)"
            )
        raise
    if "chunks" in raw:
        dead = set(raw.get("dead", []))
        files: list[str] = []
        stats: dict = {}
        for cname in raw["chunks"]:
            chunk = _read_json(f"{_snap_dir(root)}/{cname}")
            files.extend(f for f in chunk["files"] if _rel(f) not in dead)
            for k, v in chunk.get("stats", {}).items():
                if k not in dead:
                    stats[k] = v
    else:
        files = list(raw.get("files", []))
        stats = raw.get("stats", {})
    return {
        "files": files,
        "stats": stats,
        "dvs": raw.get("dvs", {}),
        "schema": raw.get("schema"),
        "committed_at": raw.get("committed_at"),
        # metadata-only rename support: stats/files are PHYSICAL,
        # readers present LOGICAL names through this map
        "column_mapping": raw.get("column_mapping") or {},
    }


def _version_at(root: str, ts: float) -> int:
    """Delta's timestampAsOf rule, pure-python: newest commit at or
    before ``ts``; errors for instants before every retained commit or
    after the newest one (mirrors SnapshotTable.version_at)."""
    head = _current_version(root)
    if head:
        head_ts = _read_json(f"{_snap_dir(root)}/v{head}.json").get(
            "committed_at"
        )
        if head_ts is not None and float(ts) > float(head_ts):
            raise ValueError(
                f"snapshot: timestampAsOf {ts} is after the newest commit "
                f"(v{head} at {head_ts}) — a future timestamp does not pin "
                f"a snapshot"
            )
    for v in range(head, 0, -1):
        path = f"{_snap_dir(root)}/v{v}.json"
        if not _exists(path):
            break
        ct = _read_json(path).get("committed_at")
        if ct is not None and float(ct) <= ts:
            return v
    raise ValueError(
        f"snapshot: no committed snapshot at or before epoch {ts} — the "
        "version either predates this table or was expired"
    )


def _resolve_read_version(options) -> tuple[str, int]:
    root = options.get("path")
    if not root:
        raise ValueError("snapshot requires .option('path', <table root>)")
    v_opt = options.get("versionasof")
    ts_opt = options.get("timestampasof")
    if v_opt is not None and ts_opt is not None:
        raise ValueError("pass either versionAsOf or timestampAsOf, not both")
    if v_opt is not None:
        return root, int(v_opt)
    if ts_opt is not None:
        return root, _version_at(root, float(ts_opt))
    cur = _current_version(root)
    if cur == 0:
        raise ValueError(f"snapshot: no committed snapshot at {root}")
    return root, cur


@dataclass
class SnapshotPartition(InputPartition):
    """One live data file of the pinned snapshot (+ its deletion-vector
    dir when the manifest masks rows in it)."""

    file: str
    dv: str | None = None
    value: int = field(default=0)  # satisfies InputPartition repr


class SnapshotBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.root, self.version = _resolve_read_version(options)
        self._schema = schema
        self._manifest = _resolve_full(self.root, self.version)
        self._conjuncts = []

    def pushFilters(self, filters):
        # every convertible filter prunes the FILE LIST; every filter
        # (convertible or not) is returned to Spark as unhandled, so
        # the engine re-applies the exact predicate — pruning is a
        # pure optimization by construction. Filters arrive in LOGICAL
        # names; the stats are physical.
        from dataclasses import replace as _dc_replace

        mp = self._manifest["column_mapping"]
        conj = conjuncts_from_push_filters(filters)
        self._conjuncts = [
            _dc_replace(c, column=mp[c.column]) if c.column in mp else c
            for c in conj
        ]
        return filters

    def partitions(self):
        files = self._manifest["files"]
        if self._conjuncts:
            files, _pruned = prune_files(
                files, self._manifest["stats"], _rel, self._conjuncts
            )
        dvs = self._manifest["dvs"]
        if not files:
            return [SnapshotPartition("", None)]
        return [SnapshotPartition(f, dvs.get(_rel(f))) for f in files]

    def read(self, partition: SnapshotPartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        if not partition.file:
            return iter([])
        target = to_arrow_schema(self._schema)
        fs_, fpath = _fs_split(partition.file)
        raw_tbl = pq.read_table(fpath, filesystem=fs_)
        # conform to the TABLE schema (Iceberg rule): NULL-pad columns
        # the file predates, take names/types from the manifest — the
        # exact view SnapshotTable.read() gives. Schema fields carry
        # LOGICAL names; files store physical ones.
        mp = self._manifest["column_mapping"]
        cols = []
        for f in target:
            pname = mp.get(f.name, f.name)
            if pname in raw_tbl.column_names:
                cols.append(raw_tbl.column(pname).cast(f.type))
            else:
                cols.append(pa.nulls(raw_tbl.num_rows, f.type))
        tbl = pa.table(cols, schema=target)
        if partition.dv is not None:
            masked = _dv_positions(partition.dv, _rel(partition.file))
            if masked:
                pos = pa.array(range(tbl.num_rows), pa.int64())
                keep = pc.invert(
                    pc.is_in(
                        pos, value_set=pa.array(sorted(masked), pa.int64())
                    )
                )
                tbl = tbl.filter(keep)
        return iter(tbl.to_batches())


class SnapshotDataSource(DataSource):
    """``spark.read.format("snapshot").option("path", root).load()``.

    Time travel via ``versionAsOf`` / ``timestampAsOf`` options;
    deletion vectors applied; schema comes from the pinned manifest;
    pushed filters prune the file list against the manifest stats and
    are re-applied exactly by Spark. Register with
    :func:`register_snapshot_source`, then plain SQL works::

        spark.read.format("snapshot").option("path", root).load() \\
             .createOrReplaceTempView("t")
        spark.sql("SELECT ... FROM t WHERE k = 5")
    """

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self):
        root, version = _resolve_read_version(self.options)
        m = _resolve_full(root, version)
        if not m["schema"]:
            raise ValueError(
                f"snapshot: manifest v{version} at {root} carries no "
                "schema — append data before reading"
            )
        st = StructType.fromJson(m["schema"])
        # parquet scans surface every column nullable (and additive
        # evolution NULL-pads older files), exactly like
        # SnapshotTable.read()'s schema — mirror it; fields present
        # their LOGICAL names (the on-disk schema is physical)
        from pyspark.sql.types import StructField

        inv = {p: l for l, p in m["column_mapping"].items()}
        return StructType(
            [
                StructField(inv.get(f.name, f.name), f.dataType, True, f.metadata)
                for f in st
            ]
        )

    def reader(self, schema: StructType) -> SnapshotBatchReader:
        return SnapshotBatchReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> SnapshotBatchWriter:
        return SnapshotBatchWriter(schema, self.options, overwrite)


def _write_json(path: str, obj) -> None:
    import json

    data = json.dumps(obj)
    fs_, p = _fs_split(path)
    if fs_ is None:
        import os

        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(data)
        return
    fs_.create_dir(p.rsplit("/", 1)[0], recursive=True)
    with fs_.open_output_stream(p) as f:
        f.write(data.encode("utf-8"))


import threading as _threading

# serializes the exists-check + publish of the OBJECT-STORE exclusive
# write below across this process's threads — the same single-driver
# discipline Delta's S3SingleDriverLogStore shipped for years on
# stores with no native create-if-absent
_EXCLUSIVE_LOCK = _threading.Lock()


def _write_json_exclusive(path: str, obj) -> None:
    """Atomic create-if-absent — the commit primitive.

    Local / ``file:`` paths get the OS's true guarantee
    (``O_CREAT|O_EXCL`` — ``file:`` URIs resolve to a local fs-native
    path). Object-store schemes get the LogStore discipline Delta's
    ``S3SingleDriverLogStore`` defined: a process-wide mutex around
    exists-check -> temp write -> move. The put itself is
    all-or-nothing (no torn manifest).

    SCOPE OF THE EMULATION (r11-ADVICE, corrected): the mutex
    serializes ONLY writers inside this Python process that go through
    THIS function — i.e. concurrent ``snapshot``-DataSource writes.
    It does NOT serialize against ``SnapshotTable`` commits on the
    same object-store root: those run through ``HadoopLogStore``
    (``FileContext.rename`` in the JVM) and never see this lock — a
    lock can't span the DSv2 Python worker and the JVM anyway — and
    pyarrow ``fs.move`` OVERWRITES an existing destination on S3-like
    stores. Mixing the batch writer and SnapshotTable on one
    object-store table therefore needs a coordination service, same as
    Delta's multi-driver caveat; ON TOP of the documented limitation,
    the read-back below downgrades a silently LOST commit to a
    DETECTED ``CommitConflict`` whenever the clobber lands before the
    verification read (manifest content is writer-unique, so a byte
    mismatch proves the race). Local paths need none of this —
    ``link(2)``/``O_EXCL`` is shared and kernel-atomic across all
    writers."""
    import json
    import os
    import uuid as _uuid

    fs_, p = _fs_split(path)
    if fs_ is not None and "://" in path and not path.startswith("file:"):
        data = json.dumps(obj).encode("utf-8")
        with _EXCLUSIVE_LOCK:
            if _exists(path):
                raise FileExistsError(path)
            tmp = f"{p}.tmp.{_uuid.uuid4().hex}"
            fs_.create_dir(p.rsplit("/", 1)[0], recursive=True)
            with fs_.open_output_stream(tmp) as f:
                f.write(data)
            fs_.move(tmp, p)
            with fs_.open_input_stream(p) as f:
                if f.read() != data:
                    # a racing writer (SnapshotTable's JVM rename, or
                    # another driver) clobbered the version between
                    # our move and this read: surface the CAS loss
                    raise FileExistsError(path)
        return
    fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as f:
        f.write(json.dumps(obj))


@dataclass
class _StagedFile(WriterCommitMessage):
    file: str
    rows: int
    stats: dict


class SnapshotBatchWriter(DataSourceArrowWriter):
    """Executor half of ``df.write.format("snapshot")``: each task
    streams its Arrow batches into ONE parquet file under a fresh
    ``data/<job-uuid>/`` dir (invisible to readers until the manifest
    commits), renamed logical->physical, with the per-file min/max/
    null-count stats computed from the SAME batches — so the commit
    adds data-skipping metadata without any re-scan. The driver-side
    :meth:`commit` then composes the next manifest (one new metadata
    chunk + everything else carried by reference) and publishes it
    with the same atomic exclusive-create CAS ``SnapshotTable`` uses;
    racing writers (including SnapshotTable ones) serialize cleanly.

    Refused shapes, validated at PLAN time: tables carrying CHECK
    constraints (their SQL needs an engine to evaluate — append via
    ``SnapshotTable``), type-changing schemas, and retired column
    names. Object-store roots commit through the single-driver
    exclusive emulation in ``_write_json_exclusive`` (Delta's
    S3SingleDriverLogStore discipline — see its docstring for the
    cross-driver caveat).

    Layout note: one file per input partition — for stats that BITE,
    cluster before saving (``df.repartitionByRange(n, "k")
    .sortWithinPartitions("k")``), exactly as ``append_clustered``
    does; an unclustered write gives every file the full value range
    and banded reads stop pruning (never stop being correct)."""

    def __init__(self, schema: StructType, options, overwrite: bool):
        import uuid as _uuid

        self.root = options.get("path")
        if not self.root:
            raise ValueError("snapshot requires .option('path', <table root>)")
        self.root = self.root.rstrip("/")
        self.overwrite = overwrite
        cur = _current_version(self.root)
        m = (
            _resolve_full(self.root, cur)
            if cur
            else {"files": [], "stats": {}, "schema": None, "column_mapping": {}}
        )
        raw = _read_json(f"{_snap_dir(self.root)}/v{cur}.json") if cur else {}
        if raw.get("checks"):
            raise ValueError(
                "snapshot writer: this table has CHECK constraints "
                f"({sorted(raw['checks'])}) — their SQL must be evaluated "
                "by an engine at staging; append via SnapshotTable"
            )
        mapping = m["column_mapping"]
        self._logical_names = list(schema.names)
        self._rename = {
            l: p for l, p in mapping.items() if l != p and l in schema.names
        }
        retired = set(raw.get("retired", []))
        physical_names = [self._rename.get(n, n) for n in schema.names]
        bad = [n for n in physical_names if n in retired]
        if bad and not overwrite:
            raise ValueError(
                f"snapshot writer: column(s) {bad} were dropped from this "
                f"table; their physical slots still hold data — use a "
                f"different name or overwrite"
            )
        # additive-only evolution, validated at plan time (re-checked
        # against the fresh manifest in commit)
        from pyspark.sql.types import StructField

        self._physical_schema = StructType(
            [
                StructField(self._rename.get(f.name, f.name), f.dataType, True)
                for f in schema.fields
            ]
        )
        if m["schema"] and not overwrite:
            _evolve_fields(m["schema"], self._physical_schema.jsonValue())
        # stats coverage: the columns the existing manifest already
        # tracks (their union), or every top-level primitive column
        # for a fresh/overwritten table
        observed: set[str] = set()
        for fstats in m["stats"].values():
            observed.update(
                k
                for k in fstats
                if not k.startswith("__")
            )
        # timestamp columns are EXCLUDED from writer-side stats even
        # when the manifest tracks them: arrow and the Spark session
        # can disagree on the zone their ISO serialization carries,
        # and a zone-skewed min/max string would prune WRONGLY (the
        # one failure pruning must never have). Files without a stats
        # entry for a column are conservative candidates — correct,
        # just unpruned, until the next SnapshotTable rewrite re-stats
        # them engine-side.
        ts_cols = {
            f.name
            for f in self._physical_schema.fields
            if f.dataType.typeName() in ("timestamp", "timestamp_ntz")
        }
        if observed and not overwrite:
            self._stats_cols = sorted(observed - ts_cols)
        else:
            prim = {
                "byte", "short", "integer", "long", "float", "double",
                "string", "date", "boolean",
            }
            self._stats_cols = [
                f.name
                for f in self._physical_schema.fields
                if (
                    f.dataType.typeName() in prim
                    or f.dataType.typeName().startswith("decimal")
                )
                and f.name not in ts_cols
            ]
        self.job_dir = f"{self.root}/data/{_uuid.uuid4().hex}"

    def write(self, iterator):
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._physical_schema)
        batches = []
        for batch in iterator:
            if batch.num_rows:
                batches.append(batch)
        if not batches:
            # zero-row task: stage nothing (the manifest records the
            # schema; empty part files would be forever-candidates)
            return _StagedFile("", 0, {})
        tbl = pa.Table.from_batches(batches)
        tbl = tbl.rename_columns([f.name for f in target]).cast(target)
        path = f"{self.job_dir}/part-{_uuid.uuid4().hex}.parquet"
        fs_, p = _fs_split(path)
        if fs_ is None:
            import os

            os.makedirs(self.job_dir, exist_ok=True)
            pq.write_table(tbl, p)
        else:
            fs_.create_dir(p.rsplit("/", 1)[0], recursive=True)
            pq.write_table(tbl, p, filesystem=fs_)
        stats: dict = {"__rows": tbl.num_rows}
        for c in self._stats_cols:
            if c not in tbl.column_names:
                continue
            col = tbl.column(c)
            try:
                mm = pc.min_max(col)
                stats[c] = [
                    jsonable(mm["min"].as_py()),
                    jsonable(mm["max"].as_py()),
                    col.null_count,
                ]
            except pa.ArrowNotImplementedError:
                continue  # non-orderable type: no interval stats
        return _StagedFile(path, tbl.num_rows, stats)

    def commit(self, messages):
        import time as _time
        import uuid as _uuid

        files = [m.file for m in messages if m and m.file]
        new_stats = {
            _rel(m.file): m.stats for m in messages if m and m.file
        }
        snap = _snap_dir(self.root)
        for _attempt in range(20):
            # commit resolves the CAS base from the FULL listing, never
            # the hint (layout.py _listed_version discipline): a stale
            # hint × concurrent expire would fork the log by recreating
            # an expired v{N}.json. Readers keep the hint fast path.
            cur = _listed_version(self.root)
            prev_raw = _read_json(f"{snap}/v{cur}.json") if cur else {}
            raw: dict = {
                "version": cur + 1,
                "committed_at": round(_time.time(), 3),
                "op": "overwrite" if self.overwrite else "append",
            }
            if self.overwrite:
                schema = self._physical_schema.jsonValue()
                if prev_raw.get("batch_markers"):
                    raw["batch_markers"] = prev_raw["batch_markers"]
                chunk = {"files": sorted(files), "stats": new_stats}
            else:
                if prev_raw.get("checks"):
                    raise ValueError(
                        "snapshot writer: CHECK constraints were added "
                        "concurrently — append via SnapshotTable"
                    )
                # re-validate the STAGED physical columns against the
                # FRESH mapping/retired state every retry: a rename or
                # drop_column committed between plan time and this
                # attempt would land staged data in a retired slot or
                # under a physical name the mapping no longer assigns
                # to this logical column (data corruption, not a CAS
                # race — refuse, don't retry past it)
                fresh_map = prev_raw.get("column_mapping", {}) or {}
                fresh_retired = set(prev_raw.get("retired", []) or [])
                phys_owner = {p: l for l, p in fresh_map.items()}
                for lname in self._logical_names:
                    staged_phys = self._rename.get(lname, lname)
                    owner = phys_owner.get(staged_phys, staged_phys)
                    if owner != lname:
                        raise ValueError(
                            f"snapshot writer: physical slot "
                            f"{staged_phys!r} (staged for column "
                            f"{lname!r}) is now mapped to column "
                            f"{owner!r} by a concurrent rename — re-run "
                            f"the write against the current table"
                        )
                    if fresh_map.get(lname, lname) != staged_phys:
                        raise ValueError(
                            f"snapshot writer: column {lname!r} was "
                            f"renamed concurrently (staged files carry "
                            f"physical slot {staged_phys!r}, the table "
                            f"now maps it to "
                            f"{fresh_map.get(lname, lname)!r}) — re-run "
                            f"the write against the current table"
                        )
                    if staged_phys in fresh_retired:
                        raise ValueError(
                            f"snapshot writer: column {lname!r} "
                            f"(physical slot {staged_phys!r}) was "
                            f"dropped concurrently; committing would "
                            f"land data in a retired slot — re-run the "
                            f"write against the current table"
                        )
                prev_schema = prev_raw.get("schema")
                schema = (
                    _evolve_fields(
                        prev_schema, self._physical_schema.jsonValue()
                    )
                    if prev_schema
                    else self._physical_schema.jsonValue()
                )
                for k in (
                    "batch_markers", "dvs", "dv_rows", "seq_state",
                    "column_mapping", "retired", "dead",
                ):
                    if prev_raw.get(k):
                        raw[k] = prev_raw[k]
                if prev_raw.get("files"):
                    # legacy inline manifest: stay inline
                    raw["files"] = sorted(prev_raw["files"] + files)
                    raw["stats"] = {
                        **prev_raw.get("stats", {}),
                        **new_stats,
                    }
                    if prev_raw.get("blooms"):
                        raw["blooms"] = prev_raw["blooms"]
                    raw["schema"] = schema
                    try:
                        _write_json_exclusive(f"{snap}/v{cur + 1}.json", raw)
                    except FileExistsError:
                        continue
                    _write_json_atomic(
                        f"{snap}/_head.json", {"version": cur + 1}
                    )
                    if (cur + 1) % 25 == 0:
                        _write_checkpoint(self.root, cur + 1)
                    return
                chunk = {"files": sorted(files), "stats": new_stats}
            raw["schema"] = schema
            chunk_name = f"chunk-{_uuid.uuid4().hex}.json"
            _write_json(f"{snap}/{chunk_name}", chunk)
            raw["chunks"] = (
                [] if self.overwrite else list(prev_raw.get("chunks", []))
            ) + [chunk_name]
            if self.overwrite:
                raw.pop("dead", None)
            try:
                _write_json_exclusive(f"{snap}/v{cur + 1}.json", raw)
            except FileExistsError:
                continue  # lost the CAS race: recompose against fresh state
            _write_json_atomic(f"{snap}/_head.json", {"version": cur + 1})
            if (cur + 1) % 25 == 0:
                _write_checkpoint(self.root, cur + 1)
            return
        raise RuntimeError(f"snapshot writer lost 20 CAS races at {self.root}")

    def abort(self, messages):
        import shutil

        fs_, p = _fs_split(self.job_dir)
        if fs_ is None:
            shutil.rmtree(p, ignore_errors=True)
        else:  # pragma: no cover - object-store roots are refused upfront
            try:
                fs_.delete_dir(p)
            except OSError:
                pass


_WIDEN_ORDER = {"byte": 0, "short": 1, "integer": 2, "long": 3}


def _evolve_fields(prev_schema: dict, new_schema: dict) -> dict:
    """Pure-python mirror of SnapshotTable._evolved_schema: additive
    columns widen, and a write carrying a NARROWER numeric type than
    the table (int into a long column, float into double) is accepted
    as-is — the manifest schema stays the wider type and readers
    promote the narrow parquet files on scan. WIDENING the table's
    type from this writer is refused (the bucket-metadata guard lives
    engine-side): widen via ``SnapshotTable.append`` first, then keep
    writing."""

    def _narrows_to(new: str, old: str) -> bool:
        if not isinstance(new, str) or not isinstance(old, str):
            return False
        if new in _WIDEN_ORDER and old in _WIDEN_ORDER:
            return _WIDEN_ORDER[new] < _WIDEN_ORDER[old]
        return (new, old) == ("float", "double")

    prev_types = {f["name"]: f["type"] for f in prev_schema["fields"]}
    for f in new_schema["fields"]:
        old = prev_types.get(f["name"])
        if old is not None and old != f["type"] and not _narrows_to(
            f["type"], old
        ):
            raise ValueError(
                f"schema evolution rejected: column {f['name']!r} is "
                f"{old} in the table but {f['type']} in this write; "
                f"additive columns and narrower-than-table numeric "
                f"writes are allowed here — to WIDEN the table's type, "
                f"append via SnapshotTable first"
            )
    known = set(prev_types)
    return {
        **prev_schema,
        "fields": prev_schema["fields"]
        + [f for f in new_schema["fields"] if f["name"] not in known],
    }


def register_snapshot_source(spark) -> None:
    """Register the batch source for this session; afterwards
    ``spark.read.format("snapshot")`` resolves. Python-source filter
    pushdown is opt-in engine-side — enable it here so the manifest
    pruning actually receives the filters (a session without it would
    fail the read outright, not silently skip pruning)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
