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
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..streaming.cdf_source import (
    _current_version,
    _dv_positions,
    _exists,
    _fs_split,
    _read_json,
    _rel,
    _snap_dir,
)
from .predicate import conjuncts_from_push_filters, prune_files


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


def register_snapshot_source(spark) -> None:
    """Register the batch source for this session; afterwards
    ``spark.read.format("snapshot")`` resolves. Python-source filter
    pushdown is opt-in engine-side — enable it here so the manifest
    pruning actually receives the filters (a session without it would
    fail the read outright, not silently skip pruning)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
