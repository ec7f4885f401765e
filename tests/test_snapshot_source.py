"""Batch `snapshot` DataSource (r09 verdict #3): spark.read.format(
"snapshot") over a SnapshotTable root — read-equals-SnapshotTable.read()
including time travel and DV masking, plain spark.sql works over a
temp view, and pushed filters prune the planned file list against the
manifest stats (then re-apply exactly engine-side)."""

import time

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.snapshot_source import (
    SnapshotBatchReader,
    register_snapshot_source,
)


@pytest.fixture(scope="module")
def registered(spark):
    register_snapshot_source(spark)
    return spark


def _load(spark, root, **opts):
    r = spark.read.format("snapshot").option("path", root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _banded_table(spark, path):
    t = SnapshotTable(spark, str(path), stats_columns=["v"])
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 100)
            .select(F.col("id").alias("v"), (F.col("id") * 2).alias("w"))
            .coalesce(1)
        )
    return t


def test_batch_read_equals_table_read(registered, spark, tmp_path):
    t = _banded_table(spark, tmp_path / "t")
    got = _load(spark, t.root)
    assert got.schema == t.read().schema
    assert sorted(r["v"] for r in got.collect()) == sorted(
        r["v"] for r in t.read().collect()
    )


def test_batch_read_time_travel(registered, spark, tmp_path):
    t = _banded_table(spark, tmp_path / "t")
    assert _load(spark, t.root, versionAsOf=2).count() == 200
    mark = time.time()
    time.sleep(0.05)
    t.append(
        spark.range(5).select(
            F.col("id").alias("v"), F.lit(0).cast("long").alias("w")
        )
    )
    assert _load(spark, t.root, timestampAsOf=mark).count() == 300
    assert _load(spark, t.root).count() == 305
    with pytest.raises(Exception, match="future timestamp"):
        _load(spark, t.root, timestampAsOf=time.time() + 3600).count()


def test_batch_read_applies_deletion_vectors(registered, spark, tmp_path):
    t = _banded_table(spark, tmp_path / "t")
    t.delete_where_mor("v", 1000, 1049)
    got = _load(spark, t.root)
    assert got.count() == 250
    assert got.filter(F.col("v").between(1000, 1049)).count() == 0
    # pre-delete version still reads the masked rows (DV travels with
    # the manifest, not the file)
    assert _load(spark, t.root, versionAsOf=3).count() == 300


def test_batch_read_schema_evolution_null_pads(registered, spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(spark.createDataFrame([(1, "a")], "k long, s string"))
    t.append(spark.createDataFrame([(2, "b", 9.5)], "k long, s string, x double"))
    got = {r["k"]: (r["s"], r["x"]) for r in _load(spark, t.root).collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_sql_over_temp_view(registered, spark, tmp_path):
    t = _banded_table(spark, tmp_path / "t")
    _load(spark, t.root).createOrReplaceTempView("snap_t")
    rows = spark.sql(
        "SELECT v, w FROM snap_t WHERE v BETWEEN 1000 AND 1004 ORDER BY v"
    ).collect()
    assert [(r["v"], r["w"]) for r in rows] == [(v, v * 2) for v in range(1000, 1005)]


def test_push_filters_prune_planned_files(spark, tmp_path):
    """Unit-level planner check: pushed filters shrink partitions()
    to the files whose stats can match — the pruning inputFiles()
    can't show for a Python DataSource."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In, IsNull

    t = _banded_table(spark, tmp_path / "t")
    opts = {"path": t.root}
    r = SnapshotBatchReader(t.read().schema, opts)
    assert len(r.partitions()) == 3
    r = SnapshotBatchReader(t.read().schema, opts)
    r.pushFilters([EqualTo(("v",), 1005)])
    assert len(r.partitions()) == 1
    r = SnapshotBatchReader(t.read().schema, opts)
    r.pushFilters([GreaterThan(("v",), 2099)])
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].file == ""  # all pruned: noop part
    r = SnapshotBatchReader(t.read().schema, opts)
    r.pushFilters([In(("v",), (5, 1005))])
    assert len(r.partitions()) == 2
    r = SnapshotBatchReader(t.read().schema, opts)
    r.pushFilters([IsNull(("v",))])
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].file == ""  # no NULLs anywhere


def test_pushed_filter_results_remain_exact(registered, spark, tmp_path):
    """End-to-end: a pushed band filter returns exactly the full
    scan's filter (Spark re-applies the predicate on top of pruning)."""
    t = _banded_table(spark, tmp_path / "t")
    got = _load(spark, t.root).filter("v >= 1050 AND v < 2010")
    assert sorted(r["v"] for r in got.collect()) == list(range(1050, 1100)) + list(
        range(2000, 2010)
    )


# ---------------------------------------------------------------------------
# batch WRITER: df.write.format("snapshot") — the SQL-side append path
# ---------------------------------------------------------------------------


def test_writer_append_interops_with_snapshot_table(registered, spark, tmp_path):
    """A format('snapshot') append commits through the same manifest
    CAS as SnapshotTable: the table sees the rows, time travel sees
    the pre-write version, and the written files carry min/max stats
    so banded reads keep pruning."""
    t = _banded_table(spark, tmp_path / "t")
    v_before = t.current_version()
    (
        spark.range(3000, 3100)
        .select(F.col("id").alias("v"), (F.col("id") * 2).alias("w"))
        .coalesce(1)
        .write.format("snapshot")
        .option("path", t.root)
        .mode("append")
        .save()
    )
    assert t.current_version() == v_before + 1
    assert t.read().count() == 400
    assert t.read(version=v_before).count() == 300
    pruned = t.read(where=("v", 3000, 3099))
    assert len(pruned.inputFiles()) == 1 and pruned.count() == 100
    # and SnapshotTable DML keeps working on writer-staged files
    t.delete_where("v", 3000, 3049)
    assert t.read().count() == 350


def test_writer_creates_table_and_overwrite(registered, spark, tmp_path):
    root = str(tmp_path / "fresh")
    df = spark.range(10).select(F.col("id").alias("k"))
    df.write.format("snapshot").option("path", root).mode("append").save()
    t = SnapshotTable(spark, root, stats_columns=["k"])
    assert t.read().count() == 10
    # overwrite resets data + schema
    spark.range(3).select(F.col("id").alias("z")).write.format(
        "snapshot"
    ).option("path", root).mode("overwrite").save()
    t2 = SnapshotTable(spark, root, stats_columns=["z"])
    got = t2.read()
    assert got.columns == ["z"] and got.count() == 3
    assert t2.read(version=1).columns == ["k"]  # time travel intact


def test_writer_schema_evolution_and_conflicts(registered, spark, tmp_path):
    t = _banded_table(spark, tmp_path / "t")
    # additive column widens; old rows read it as NULL
    (
        spark.range(1)
        .select(
            (F.col("id") + 5000).alias("v"),
            (F.col("id")).alias("w"),
            F.lit("x").alias("tag"),
        )
        .write.format("snapshot")
        .option("path", t.root)
        .mode("append")
        .save()
    )
    got = t.read()
    assert set(got.columns) == {"v", "w", "tag"}
    assert got.filter(F.col("tag").isNull()).count() == 300
    # NARROWER write into the long column: accepted as-is since the
    # r11 type-widening change (manifest stays long; readers promote
    # the int32 file on scan)
    (
        spark.range(1)
        .select(
            (F.col("id") + 7000).cast("int").alias("v"),
            F.col("id").alias("w"),
        )
        .write.format("snapshot")
        .option("path", t.root)
        .mode("append")
        .save()
    )
    got2 = t.read()
    assert dict(got2.dtypes)["v"] == "bigint"
    assert got2.filter(F.col("v") == 7000).count() == 1
    # an INCOMPATIBLE type change is still rejected
    with pytest.raises(Exception, match="schema evolution rejected"):
        (
            spark.range(1)
            .select(
                F.col("id").cast("string").alias("v"), F.col("id").alias("w")
            )
            .write.format("snapshot")
            .option("path", t.root)
            .mode("append")
            .save()
        )


def test_writer_respects_column_mapping_and_guards(registered, spark, tmp_path):
    t = _banded_table(spark, tmp_path / "t")
    t.rename_column("v", "val")
    (
        spark.createDataFrame([(9001, 2)], "val long, w long")
        .write.format("snapshot")
        .option("path", t.root)
        .mode("append")
        .save()
    )
    got = t.read()
    assert got.columns == ["val", "w"]
    assert got.filter(F.col("val") == 9001).count() == 1
    # dropped name refused
    t.drop_column("w")
    with pytest.raises(Exception, match="dropped"):
        (
            spark.createDataFrame([(1, 1)], "val long, w long")
            .write.format("snapshot")
            .option("path", t.root)
            .mode("append")
            .save()
        )
    # CHECK-constrained tables are refused (SQL needs an engine)
    t2 = SnapshotTable(spark, str(tmp_path / "t2"), stats_columns=["k"])
    t2.append(spark.range(5).select(F.col("id").alias("k")))
    t2.add_check_constraint("k_pos", "k >= 0")
    with pytest.raises(Exception, match="CHECK constraints"):
        (
            spark.range(5)
            .select(F.col("id").alias("k"))
            .write.format("snapshot")
            .option("path", t2.root)
            .mode("append")
            .save()
        )


def test_writer_races_snapshot_table_commits(registered, spark, tmp_path):
    """The format('snapshot') writer and SnapshotTable.append share
    the exclusive-create CAS: racing commits from both paths serialize
    into strictly sequential versions with no lost update."""
    import threading

    t = _banded_table(spark, tmp_path / "t")
    v0 = t.current_version()
    barrier = threading.Barrier(2)
    errs = []

    def via_writer():
        try:
            # a fresh py4j thread has NO JVM active session, and the
            # python-datasource writer lookup resolves through it —
            # pin the session on this thread (the documented sharp
            # edge in sources/snapshot_source.py)
            spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
                spark._jsparkSession
            )
            barrier.wait()
            (
                spark.range(5000, 5010)
                .select(F.col("id").alias("v"), (F.col("id") * 2).alias("w"))
                .write.format("snapshot")
                .option("path", t.root)
                .mode("append")
                .save()
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def via_table():
        try:
            barrier.wait()
            t.append(
                spark.range(6000, 6010).select(
                    F.col("id").alias("v"), (F.col("id") * 2).alias("w")
                )
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=f) for f in (via_writer, via_table)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert t.current_version() == v0 + 2
    assert t.read().count() == 320  # both appends landed exactly once


# ---------------------------------------------------------------------------
# commit-protocol hardening (r10 verdict #2)
# ---------------------------------------------------------------------------


def test_writer_commit_resolves_head_from_listing_not_hint(
    registered, spark, tmp_path
):
    """A stale ``_head.json`` hint plus a mid-expire gap must not fork
    the log: the hint-first probe (hint=3 exists, v4 just expired)
    stops at 3, and a commit composed there would RECREATE v4.json on
    top of the expired slot while the real head is v5. The writer's
    commit loop resolves its CAS base from the full listing instead."""
    import os

    t = _banded_table(spark, tmp_path / "t")  # v1..v3
    for lo in (4000, 5000):
        t.append(
            spark.range(lo, lo + 10)
            .select(F.col("id").alias("v"), (F.col("id") * 2).alias("w"))
            .coalesce(1)
        )
    assert t.current_version() == 5
    snap = f"{t.root}/_snapshots"
    # fabricate the fork window: v4 expired, hint lagging at 3
    os.remove(f"{snap}/v4.json")
    import json

    with open(f"{snap}/_head.json", "w") as f:
        json.dump({"version": 3}, f)
    (
        spark.range(9000, 9010)
        .select(F.col("id").alias("v"), (F.col("id") * 2).alias("w"))
        .write.format("snapshot")
        .option("path", t.root)
        .mode("append")
        .save()
    )
    # the commit landed AFTER the real head — never in the expired slot
    assert not os.path.exists(f"{snap}/v4.json")
    assert os.path.exists(f"{snap}/v6.json")
    t2 = SnapshotTable(spark, t.root, stats_columns=["v"])
    assert t2.current_version() == 6
    assert t2.read().filter(F.col("v") >= 9000).count() == 10


def _staged_writer(spark, root, schema_ddl, rows):
    """Plan a SnapshotBatchWriter and stage one arrow batch through
    its real write() path, returning (writer, [commit message])."""
    import pyarrow as pa

    from pyspark.sql.types import _parse_datatype_string

    from collective_als_spark.sources.snapshot_source import (
        SnapshotBatchWriter,
    )

    schema = _parse_datatype_string(schema_ddl)
    w = SnapshotBatchWriter(schema, {"path": root}, overwrite=False)
    batch = pa.RecordBatch.from_pylist(rows)
    return w, [w.write(iter([batch]))]


def test_writer_commit_revalidates_drop_column_in_retry_loop(
    registered, spark, tmp_path
):
    """drop_column committed between PLAN time and COMMIT time: the
    plan-time retired check passed, so only an in-loop re-validation
    against the fresh manifest stops the staged data from landing in
    the retired physical slot."""
    t = _banded_table(spark, tmp_path / "t")
    w, msgs = _staged_writer(
        spark, t.root, "v long, w long", [{"v": 9100, "w": 1}]
    )
    t.drop_column("w")  # concurrent DDL after plan, before commit
    with pytest.raises(ValueError, match="dropped concurrently"):
        w.commit(msgs)
    # nothing committed; the table is unchanged
    assert t.read().count() == 300
    assert "w" not in t.read().columns


def test_writer_commit_revalidates_rename_in_retry_loop(
    registered, spark, tmp_path
):
    """rename_column committed between plan and commit: the staged
    files carry the OLD physical slot; committing them would hand the
    renamed column's slot to a new same-named column. Refused with
    guidance, not silently merged."""
    t = _banded_table(spark, tmp_path / "t")
    w, msgs = _staged_writer(
        spark, t.root, "v long, w long", [{"v": 9200, "w": 2}]
    )
    t.rename_column("w", "wide")
    with pytest.raises(ValueError, match="concurrent rename"):
        w.commit(msgs)
    assert t.read().count() == 300


def test_writer_commits_on_object_store_root(registered, spark, tmp_path, monkeypatch):
    """r10 verdict #9: the pure-python writer publishes manifests on
    object-store roots through the single-driver exclusive emulation
    (exists-check + temp write + move under a process mutex — Delta's
    S3SingleDriverLogStore discipline) instead of refusing ``://``
    schemes. Faked store: a ``mock://`` scheme routed onto a local
    pyarrow FileSystem, so every IO goes through the pyarrow fs code
    paths, none through plain ``os``."""
    import pyarrow.fs as pafs

    from collective_als_spark.sources import snapshot_source as ss
    from collective_als_spark.streaming import cdf_source as cs

    backing = str(tmp_path / "bucket")
    real_split = cs._fs_split

    def fake_split(path):
        if path.startswith("mock://"):
            return pafs.LocalFileSystem(), backing + "/" + path[len("mock://"):]
        return real_split(path)

    monkeypatch.setattr(cs, "_fs_split", fake_split)
    monkeypatch.setattr(ss, "_fs_split", fake_split)

    root = "mock://tbl"
    w1, msgs1 = _staged_writer(
        spark, root, "k long, v double", [{"k": 1, "v": 1.5}, {"k": 2, "v": 2.5}]
    )
    w1.commit(msgs1)
    assert ss._current_version(root) == 1
    m = ss._resolve_full(root, 1)
    assert len(m["files"]) == 1 and m["schema"] is not None
    # second append: CAS base from the (faked-fs) listing, version 2
    w2, msgs2 = _staged_writer(spark, root, "k long, v double", [{"k": 3, "v": 3.5}])
    w2.commit(msgs2)
    assert ss._current_version(root) == 2
    assert len(ss._resolve_full(root, 2)["files"]) == 2
    # exclusive collision: a pre-created v3 makes the writer lose the
    # CAS and recompose at v4 — never overwrite, never fork
    ss._write_json_exclusive(
        f"{root}/_snapshots/v3.json",
        {"version": 3, "op": "append", "chunks": [],
         "schema": ss._resolve_full(root, 2)["schema"]},
    )
    with pytest.raises(FileExistsError):
        ss._write_json_exclusive(f"{root}/_snapshots/v3.json", {})
    w3, msgs3 = _staged_writer(spark, root, "k long, v double", [{"k": 4, "v": 4.5}])
    w3.commit(msgs3)
    assert ss._current_version(root) == 4
    # the staged parquet is readable through the batch reader's
    # planning metadata (rows recorded per commit message)
    assert sum(m.rows for m in msgs1 + msgs2 + msgs3) == 4


def test_pushed_not_filters_prune_and_stay_exact(registered, spark, tmp_path):
    """r11: Not(child) pushed filters convert through the analyzer's
    complement-interval negation — Not(EqualTo) prunes single-valued
    files, Not(EqualNullSafe) is skipped (IS DISTINCT FROM is TRUE on
    NULLs), and end-to-end results equal the full-scan filter."""
    from pyspark.sql.datasource import EqualNullSafe, EqualTo, In, Not

    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(
        spark.range(100)
        .select(F.lit(777).alias("v"), F.col("id").alias("w"))
        .coalesce(1)
    )
    t.append(
        spark.range(100)
        .select(F.col("id").alias("v"), F.col("id").alias("w"))
        .coalesce(1)
    )
    opts = {"path": t.root}
    # Not(=777) proves out the constant-valued file
    r = SnapshotBatchReader(t.read().schema, opts)
    r.pushFilters([Not(EqualTo(("v",), 777))])
    assert len(r.partitions()) == 1
    # Not(EqualNullSafe): skipped -> both files stay candidates
    r = SnapshotBatchReader(t.read().schema, opts)
    r.pushFilters([Not(EqualNullSafe(("v",), 777))])
    assert len(r.partitions()) == 2
    # multi-value Not(In): unprovable complement -> both files stay
    r = SnapshotBatchReader(t.read().schema, opts)
    r.pushFilters([Not(In(("v",), (777, 5)))])
    assert len(r.partitions()) == 2
    # end-to-end exactness through spark.sql (Spark re-applies)
    got = _load(spark, t.root).filter("v != 777")
    assert got.count() == 100
    assert sorted(r["v"] for r in got.collect()) == [
        v for v in range(100) if v != 777
    ]
