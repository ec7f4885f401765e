"""Lake-layout tier: file-level data-skipping stats index and
versioned snapshot manifests (sources/layout.py).

The contract under test for the stats index is the storage-engine
invariant: pruning is a PURE optimization — the pruned read's result
equals the full scan + filter exactly, while provably opening fewer
files. For snapshots: append/overwrite visibility, time travel to a
pinned version, crash-invisibility of uncommitted data, and expire
deleting exactly the unreferenced files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from collective_als_spark.sources.layout import (
    SnapshotTable,
    build_stats_index,
    prune_files,
    pruned_read,
)
from collective_als_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def clustered_orders(spark, sf_med, tmp_path_factory):
    """Orders written clustered on the index column (repartitionByRange
    on o_totalprice) — the layout data skipping pairs with."""
    path = str(tmp_path_factory.mktemp("layout") / "orders_by_price")
    (
        load_table(spark, sf_med, "orders")
        .repartitionByRange(10, "o_totalprice")
        .write.parquet(path)
    )
    return path


def test_stats_index_shape(spark, clustered_orders):
    stats = build_stats_index(spark, clustered_orders, ["o_totalprice"])
    rows = stats.collect()
    n_files = len(
        [n for n in os.listdir(clustered_orders) if n.endswith(".parquet")]
    )
    assert len(rows) == n_files
    assert set(stats.columns) == {"file", "o_totalprice_min", "o_totalprice_max"}
    for r in rows:
        assert r["o_totalprice_min"] <= r["o_totalprice_max"]


def test_pruned_read_equals_full_filter_and_skips_files(spark, clustered_orders):
    stats = build_stats_index(spark, clustered_orders, ["o_totalprice"]).cache()
    lo, hi = 100000.0, 150000.0
    n_files = stats.count()
    kept = prune_files(stats, "o_totalprice", lo, hi)
    # range-clustered into 10 files: a narrow band must skip most
    assert 0 < len(kept) < n_files
    pruned = pruned_read(spark, stats, "o_totalprice", lo, hi)
    assert len(pruned.inputFiles()) == len(kept)
    full = spark.read.parquet(clustered_orders).filter(
        F.col("o_totalprice").between(lo, hi)
    )
    assert pruned.count() == full.count()
    # exact equality, not just counts
    assert (
        pruned.exceptAll(full).count() == 0 and full.exceptAll(pruned).count() == 0
    )


def test_pruned_read_empty_band(spark, clustered_orders):
    stats = build_stats_index(spark, clustered_orders, ["o_totalprice"])
    out = pruned_read(spark, stats, "o_totalprice", -2e9, -1e9)
    assert out.count() == 0
    assert "o_totalprice" in out.columns


def test_snapshot_append_overwrite_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    df1 = spark.range(100).withColumn("v", F.col("id") * 2)
    df2 = spark.range(100, 150).withColumn("v", F.col("id") * 2)
    v1 = t.append(df1)
    v2 = t.append(df2)
    assert (v1, v2) == (1, 2)
    assert t.read(1).count() == 100
    assert t.read(2).count() == 150
    assert t.read().count() == 150  # current == v2
    v3 = t.overwrite(spark.range(7).withColumn("v", F.lit(0)))
    assert v3 == 3 and t.read().count() == 7
    # time travel still pins the pre-overwrite snapshots
    assert t.read(1).count() == 100
    assert t.read(2).count() == 150


def test_snapshot_uncommitted_data_invisible(spark, tmp_path):
    """Crash-safety: data files written without a pointer flip must not
    be visible — simulated by writing a data dir directly."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.append(spark.range(10))
    orphan_files = t._write_data(spark.range(999))  # step 1 only, no commit
    assert t.read().count() == 10
    assert all(os.path.exists(f) for f in orphan_files)  # present but unreferenced


def test_snapshot_expire_deletes_only_unreferenced(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.append(spark.range(10))
    t.overwrite(spark.range(20))
    orphans = t._write_data(spark.range(5))  # crashed commit
    # grace disabled: young never-referenced orphans are collectable
    # immediately (the default 15-min window protects in-flight
    # commits; covered by test_expire_grace_protects_young_orphans)
    deleted = t.expire(keep_last=1, orphan_grace_seconds=0)
    # v1's files + the orphan commit are gone, current still reads
    assert deleted >= 2
    assert t.read().count() == 20
    assert not any(os.path.exists(f) for f in orphans)
    with pytest.raises(FileNotFoundError):
        t._manifest(1)


def test_snapshot_empty_read_raises(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    with pytest.raises(ValueError):
        t.read()


def test_compact_is_a_commit(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for i in range(4):
        t.append(spark.range(i * 25, (i + 1) * 25))
    pre = t.current_version()
    files_pre = len(t._manifest(pre)["files"])
    v = t.compact(target_rows_per_file=100)
    assert v == pre + 1
    assert len(t._manifest(v)["files"]) < files_pre
    assert t.read().count() == 100
    # pre-compaction snapshot still time-travelable
    assert t.read(pre).count() == 100


def test_wap_commit_publishes_clean_batch(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    df = spark.range(50).withColumn("v", F.col("id") * 2)
    v = t.wap_commit(
        df,
        [
            {"kind": "not_null", "column": "id"},
            {"kind": "unique", "column": "id"},
            {"kind": "row_count_min", "n": 10},
        ],
    )
    assert v == 1 and t.read().count() == 50
    import json as J, os as O

    audit = J.load(open(f"{t.root}/_snapshots/v1.audit.json"))
    assert {a["check"] for a in audit} == {
        "not_null_id", "unique_id", "row_count_min_10"
    }
    assert all(a["passed"] for a in audit)


def test_wap_commit_blocks_dirty_batch(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.append(spark.range(10).withColumn("v", F.lit(1)))
    dirty = spark.createDataFrame(
        [(1, 5), (1, 6), (None, 7)], "id long, v long"
    )
    with pytest.raises(ValueError, match="audit failed"):
        t.wap_commit(
            dirty,
            [{"kind": "not_null", "column": "id"},
             {"kind": "unique", "column": "id"}],
        )
    # table unchanged; the staged orphans are expirable
    assert t.current_version() == 1 and t.read().count() == 10
    t.expire(keep_last=1)
    assert t.read().count() == 10


def test_streaming_sink_commits_batches_atomically(spark, sf_small, tmp_path):
    """Every micro-batch becomes one snapshot version; a replayed batch
    id is skipped (idempotent commit)."""
    from collective_als_spark.streaming.stateful import _events_stream

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    ckpt = str(tmp_path / "ckpt")
    sink = t.streaming_sink(ckpt)
    stream = _events_stream(spark, sf_small).select("event_id", "user_id", "value")
    q = (
        stream.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_expected = spark.read.parquet(f"{sf_small}/events.parquet").count()
    assert t.current_version() >= 1
    assert t.read().count() == n_expected
    # replay the last batch id manually: must be a no-op
    v = t.current_version()
    sink(spark.range(5).selectExpr("id AS event_id", "id AS user_id", "CAST(id AS DOUBLE) AS value"), 0)
    assert t.current_version() == v and t.read().count() == n_expected


def test_streaming_sink_separate_writers_dont_collide(spark, tmp_path):
    """Two queries (distinct checkpoints, both restarting batch ids at
    0) writing to one table must keep independent markers."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    sink_a = t.streaming_sink(str(tmp_path / "ckpt_a"))
    sink_b = t.streaming_sink(str(tmp_path / "ckpt_b"))
    sink_a(spark.range(10), 0)
    sink_b(spark.range(5), 0)  # same batch id, different writer: must commit
    assert t.read().count() == 15
    sink_a(spark.range(3), 0)  # true replay for writer A: no-op
    assert t.read().count() == 15


def test_streaming_sink_marker_survives_maintenance_commit(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    sink = t.streaming_sink(str(tmp_path / "ckpt"))
    sink(spark.range(10), 0)
    t.compact(target_rows_per_file=100)  # maintenance commit in between
    sink(spark.range(99), 0)  # replay after compaction: still deduped
    assert t.read().count() == 10


def test_wap_commit_empty_batch_passes(spark, tmp_path):
    """A zero-row batch is vacuously clean — NULL-sum metrics must not
    fail the audit (they coalesce to 0)."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    empty = spark.range(0).withColumn("v", F.col("id"))
    v = t.wap_commit(
        empty,
        [{"kind": "not_null", "column": "id"},
         {"kind": "range", "column": "v", "lo": 0, "hi": 10}],
    )
    assert v == 1 and t.read().count() == 0


def test_expire_keep_last_zero_rejected(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.append(spark.range(5))
    with pytest.raises(ValueError, match="keep_last"):
        t.expire(keep_last=0)
    assert t.read().count() == 5


def test_update_stats_index_incremental(spark, clustered_orders, tmp_path):
    from collective_als_spark.sources.layout import update_stats_index

    stats = build_stats_index(spark, clustered_orders, ["o_totalprice"])
    n0 = stats.count()
    # new ingest batch: one extra file outside the indexed range
    extra = str(tmp_path / "extra")
    spark.createDataFrame(
        [(9_000_001, 5_000_000.0)], "o_orderkey long, o_totalprice double"
    ).coalesce(1).write.parquet(extra)
    new_files = [
        f"{extra}/{n}" for n in os.listdir(extra) if n.endswith(".parquet")
    ]
    updated = update_stats_index(spark, stats, new_files, ["o_totalprice"])
    assert updated.count() == n0 + 1
    # re-stating the same files is idempotent (latest row wins per file)
    again = update_stats_index(spark, updated, new_files, ["o_totalprice"])
    assert again.count() == n0 + 1
    # the new file is found by a band only it covers (stats store
    # input_file_name()'s file:// URI form)
    kept = prune_files(updated, "o_totalprice", 4_000_000.0, 6_000_000.0)
    assert [k.removeprefix("file://") for k in kept] == new_files
    # no-op on empty batch
    assert update_stats_index(spark, updated, [], ["o_totalprice"]) is updated


def test_expire_after_smaller_keep_last(spark, tmp_path):
    """Regression (ADVICE r04): expire(keep_last=1) then
    expire(keep_last=3) must not raise on the already-deleted
    manifests inside the widened retention range — a missing manifest
    references nothing and is skipped."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for i in range(4):
        t.append(spark.range(i * 10, (i + 1) * 10))
    t.expire(keep_last=1)          # deletes v1..v3 manifests
    t.append(spark.range(40, 50))  # v5
    deleted = t.expire(keep_last=3)  # range covers deleted v3
    assert deleted >= 0
    assert t.read().count() == 50


def test_concurrent_appends_both_commit(spark, tmp_path):
    """Optimistic concurrency: racing committers must serialize into
    strictly sequential versions with NO lost update — the loser of
    the exclusive manifest write re-reads state and retries (Delta's
    _delta_log CAS core). Barrier-released threads maximize collision."""
    import threading

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.append(spark.range(0, 10))  # v1
    n_writers = 4
    barrier = threading.Barrier(n_writers)
    errs = []

    def writer(i):
        try:
            barrier.wait()
            t.append(spark.range(100 * (i + 1), 100 * (i + 1) + 10))
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    # every commit present, versions strictly sequential 1..5
    assert t.current_version() == 1 + n_writers
    names = os.listdir(f"{t.root}/_snapshots")
    versions = sorted(
        int(n[1:-5]) for n in names if n.startswith("v") and n.endswith(".json")
    )
    assert versions == list(range(1, n_writers + 2))
    # no lost update: the final snapshot contains every writer's rows
    assert t.read().count() == 10 * (n_writers + 1)
    ids = {r["id"] for r in t.read().collect()}
    for i in range(n_writers):
        assert 100 * (i + 1) in ids


def test_snapshot_table_on_file_uri_uses_hadoop_io(spark, tmp_path):
    """The lake tier must run where 100 TB lives: a `file:`-scheme URI
    routes ALL manifest IO through Hadoop's FileSystem/FileContext
    (the same code path as hdfs:/s3a:), and the table round-trips."""
    from collective_als_spark.sources.logstore import HadoopLogStore, logstore_for

    root = "file:" + str(tmp_path / "htbl")
    assert isinstance(logstore_for(spark, root), HadoopLogStore)
    t = SnapshotTable(spark, root)
    assert isinstance(t.log, HadoopLogStore)
    v1 = t.append(spark.range(25))
    v2 = t.append(spark.range(25, 40))
    assert (v1, v2) == (1, 2)
    assert t.read().count() == 40
    assert t.read(1).count() == 25  # time travel through Hadoop IO
    t.overwrite(spark.range(5))
    deleted = t.expire(keep_last=1)
    assert deleted > 0 and t.read().count() == 5
    # CAS conflict surfaces through the Hadoop path too
    from collective_als_spark.sources.logstore import CommitConflict
    import pytest as _pytest

    t.log.write_text_exclusive(f"{t.root}/_snapshots/probe.json", "{}")
    with _pytest.raises(CommitConflict):
        t.log.write_text_exclusive(f"{t.root}/_snapshots/probe.json", "{}")


def test_manifest_stats_prune_snapshot_reads(spark, tmp_path):
    """Manifests CARRY per-file stats (Iceberg design): a banded read
    opens only the files whose [min,max] intersects the band, equals
    the full-scan filter exactly, and prunes at TIME-TRAVEL versions
    too because the stats travel with each snapshot."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    # three commits with disjoint value bands, one file each
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 100).select(F.col("id").alias("v")).coalesce(1)
        )
    full = t.read().filter(F.col("v").between(1000, 1099))
    pruned = t.read(where=("v", 1000, 1099))
    assert sorted(r["v"] for r in pruned.collect()) == sorted(
        r["v"] for r in full.collect()
    )
    assert len(pruned.inputFiles()) == 1 < len(t.read().inputFiles())
    # time travel: at v2 the 2000-band doesn't exist; band 0-99 prunes to 1 file
    old = t.read(version=2, where=("v", 0, 99))
    assert old.count() == 100 and len(old.inputFiles()) == 1
    # empty band: no file opened, schema preserved
    none = t.read(where=("v", 5000, 6000))
    assert none.count() == 0 and none.schema == t.read().schema
    # a table without stats_columns reads conservatively (no stats key)
    t2 = SnapshotTable(spark, str(t.root))
    t2.append(spark.range(3000, 3100).select(F.col("id").alias("v")))
    got = t2.read(where=("v", 3000, 3001))
    assert got.count() == 2


def _manifest_files(t, version=None):
    v = t.current_version() if version is None else version
    return set(t._manifest(v)["files"])


def test_delete_where_rewrites_only_candidate_files(spark, tmp_path):
    """Copy-on-write DELETE: files provably outside the band carry
    over as the SAME path strings (never rewritten); the result equals
    the full-scan anti-filter; old versions stay intact."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    for lo in (0, 1000, 2000):  # three disjoint single-file commits
        t.append(spark.range(lo, lo + 100).select(F.col("id").alias("v")).coalesce(1))
    before = _manifest_files(t)
    pre_version = t.current_version()
    v = t.delete_where("v", 1000, 1049)
    assert v == pre_version + 1
    after = _manifest_files(t)
    # the 0- and 2000-band files are untouched (identical paths)
    assert len(before & after) == 2
    got = sorted(r["v"] for r in t.read().collect())
    assert got == list(range(0, 100)) + list(range(1050, 1100)) + list(
        range(2000, 2100)
    )
    # time travel pre-delete intact
    assert t.read(pre_version).count() == 300
    # stats were maintained: banded reads still prune to single files
    assert len(t.read(where=("v", 2000, 2010)).inputFiles()) == 1
    # band hitting nothing: no-op, no new version
    assert t.delete_where("v", 50000, 60000) == v


def test_merge_upserts_with_file_pruning(spark, tmp_path):
    """MERGE: matched keys replaced, unmatched inserted, files outside
    the source key range untouched; duplicate source keys rejected."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 10)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("val"))
            .coalesce(1)
        )
    before = _manifest_files(t)
    pre_version = t.current_version()
    # update k=1001..1003, insert k=1500..1501 — all inside the 1000-band
    source = spark.createDataFrame(
        [(1001, -1), (1002, -2), (1003, -3), (1500, -4), (1501, -5)],
        "k long, val long",
    )
    v = t.merge(source, "k")
    assert v == pre_version + 1
    after = _manifest_files(t)
    assert len(before & after) == 2  # 0- and 2000-band files untouched
    rows = {r["k"]: r["val"] for r in t.read().collect()}
    assert len(rows) == 32  # 30 original rows, 3 updated in place, 2 inserted
    assert rows[1001] == -1 and rows[1002] == -2 and rows[1003] == -3
    assert rows[1500] == -4 and rows[1501] == -5
    assert rows[1004] == 2008  # untouched row in the rewritten file
    assert rows[5] == 10  # untouched file
    assert t.read(pre_version).count() == 30
    # duplicate source keys are an error, table unchanged
    dup = spark.createDataFrame([(7, 1), (7, 2)], "k long, val long")
    with pytest.raises(ValueError, match="duplicate merge keys"):
        t.merge(dup, "k")
    assert t.current_version() == v
    # empty source: no-op
    assert t.merge(source.limit(0), "k") == v


def test_merge_when_passengers_and_pruning(spark, tmp_path):
    """merge_when (conditional MERGE): a multi-row target key where
    only ONE pair's clause fires must keep the other row (passenger
    re-staged, not lost), and files outside the source key band stay
    untouched."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    # duplicate target key 1001 (two rows, different v)
    t.append(
        spark.createDataFrame(
            [(1001, 5), (1001, 50), (1002, 7)], "k long, v long"
        ).coalesce(1)
    )
    t.append(
        spark.range(2000, 2010)
        .select(F.col("id").alias("k"), F.lit(0).alias("v"))
        .coalesce(1)
    )
    before = set(t._manifest(t.current_version())["files"])
    src = spark.createDataFrame([(1001, 10), (1500, 1)], "k long, v long")
    t.merge_when(
        src,
        "k",
        matched=[("t.v < s.v", "update", {"v": "t.v + 100"})],
        not_matched=[None],
    )
    rows = sorted((r["k"], r["v"]) for r in t.read().collect())
    # (1001,5): 5<10 fired -> 105; (1001,50): 50>=10 no clause, but its
    # key fired -> passenger carried unchanged; (1002,7) untouched
    assert (1001, 105) in rows and (1001, 50) in rows
    assert (1002, 7) in rows and (1500, 1) in rows
    assert len(rows) == 14
    # the 2000-band file is out of the source rectangle: untouched
    after = set(t._manifest(t.current_version())["files"])
    assert len(before & after) >= 1
    # no fired clause and no insert clause -> nothing changes
    v0 = t.current_version()
    t.merge_when(
        spark.createDataFrame([(9999, 1)], "k long, v long"),
        "k",
        matched=[("s.v > 100", "delete", None)],
    )
    assert sorted(
        (r["k"], r["v"]) for r in t.read().collect()
    ) == rows
    # empty source: version unchanged no-op
    assert (
        t.merge_when(src.limit(0), "k", matched=[(None, "update_all", None)])
        == t.current_version()
    )
    # bad shapes refused before any work
    with pytest.raises(ValueError, match="at least one WHEN"):
        t.merge_when(src, "k")
    with pytest.raises(ValueError, match="no assignments"):
        t.merge_when(src, "k", matched=[(None, "update", {})])
    with pytest.raises(ValueError, match="SET target"):
        t.merge_when(
            src, "k", matched=[(None, "update", {"nope": "1"})]
        )


def test_pruning_config_persists_in_manifest(spark, tmp_path):
    """Stats/bloom config is a TABLE property (Delta table-properties
    discipline): commits record it in the manifest and a handle built
    WITHOUT explicit config inherits it — a maintenance or SQL handle
    can never silently rewrite files without the stats the table has
    been pruning on. Explicit arguments (incl. explicit []) win."""
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stats_columns=["k"], bloom_columns=["k"]
    )
    t.append(
        spark.range(100).select(F.col("id").alias("k")).coalesce(1)
    )
    assert t._manifest(1)["config"] == {
        "stats_columns": ["k"], "bloom_columns": ["k"]
    }
    # config-less handle inherits and keeps writing stats
    h = SnapshotTable(spark, t.root)
    assert h.stats_columns == ["k"] and h.bloom_columns == ["k"]
    h.append(
        spark.range(1000, 1100).select(F.col("id").alias("k")).coalesce(1)
    )
    pruned = h.read(where=("k", 1000, 1050))
    assert len(pruned.inputFiles()) == 1 and pruned.count() == 51
    # a config-less handle's COMPACT keeps the stats alive
    h2 = SnapshotTable(spark, t.root)
    v = h2.compact(target_rows_per_file=50, cluster_by=["k"])
    assert t._manifest(v).get("stats")
    assert len(t.read(where=("k", 0, 10)).inputFiles()) < len(
        t._manifest(v)["files"]
    )
    # explicit empty config overrides the inherited one
    e = SnapshotTable(spark, t.root, stats_columns=[], bloom_columns=[])
    assert e.stats_columns == [] and e.bloom_columns == []
    # RESTORE must not shed the config (its build dict bypasses
    # _compose; _commit carries config like checks/column_mapping)
    h3 = SnapshotTable(spark, t.root)
    rv = h3.restore(1)
    assert t._manifest(rv).get("config", {}).get("stats_columns") == ["k"]
    h4 = SnapshotTable(spark, t.root)
    assert h4.stats_columns == ["k"]


def test_merge_when_cdf_images(spark, tmp_path):
    """Conditional MERGE on a change_data_feed table: pre-images are
    exactly the FIRED keys' target rows (matched-but-unfired rows are
    never imaged), post-images are the staged updates + inserts — the
    feed reconciles with the table delta."""
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stats_columns=["k"],
        change_data_feed=True,
    )
    t.append(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
        )
    )
    v1 = t.current_version()
    src = spark.createDataFrame(
        [(1, 100.0), (2, 1.0), (9, 90.0)], "k long, v double"
    )
    v2 = t.merge_when(
        src, "k",
        matched=[("s.v > t.v", "update", {"v": "s.v"})],
        not_matched=[None],
    )
    feed = t.changes(v1, v2)
    dels = sorted(
        (r["k"], r["v"])
        for r in feed.filter(F.col("_change_type") == "delete").collect()
    )
    ins = sorted(
        (r["k"], r["v"])
        for r in feed.filter(F.col("_change_type") == "insert").collect()
    )
    # k=1 fired (update); k=2 matched-unfired -> NOT imaged; k=9 insert
    assert dels == [(1, 10.0)]
    assert ins == [(1, 100.0), (9, 90.0)]
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows == {1: 100.0, 2: 20.0, 3: 30.0, 9: 90.0}
    # r12 verdict #2: a MULTI-ROW key where one pair fires — the
    # unchanged passenger row is physically rewritten but must produce
    # ZERO images in the commit's change files (Delta CDF carries
    # logical changes only; a per-key downstream trigger must not fire
    # on passengers)
    p = SnapshotTable(
        spark, str(tmp_path / "p"), stats_columns=["k"],
        change_data_feed=True,
    )
    p.append(
        spark.createDataFrame(
            [(1, 5.0), (1, 50.0), (2, 7.0)], "k long, v double"
        )
    )
    pv = p.merge_when(
        spark.createDataFrame([(1, 10.0)], "k long, v double"), "k",
        matched=[("s.v > t.v", "update", {"v": "s.v"})],
    )
    images = sorted(
        (r["_change_type"], r["k"], r["v"])
        for r in spark.read.parquet(p._manifest(pv)["cdc"]).collect()
    )
    # fired pair (1,5.0)->10.0 imaged; passenger (1,50.0) and
    # matched-unfired key 2 produce NOTHING
    assert images == [("delete", 1, 5.0), ("insert", 1, 10.0)]
    prows = sorted((r["k"], r["v"]) for r in p.read().collect())
    assert prows == [(1, 10.0), (1, 50.0), (2, 7.0)]


def test_merge_when_by_source_cdf_reconciles(spark, tmp_path):
    """r12 verdict #4: by-source deletes image as delete rows and
    by-source updates as delete+insert pairs; applying the change
    files to the FROM snapshot reproduces the TO snapshot exactly,
    and matched-but-unfired / untouched rows are never imaged."""
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stats_columns=["k"],
        change_data_feed=True,
    )
    t.append(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)],
            "k long, v double",
        )
    )
    v1 = t.current_version()
    src = spark.createDataFrame([(1, 100.0), (9, 90.0)], "k long, v double")
    v2 = t.merge_when(
        src, "k",
        matched=[("s.v > t.v", "update_all", None)],
        not_matched=[None],
        not_matched_by_source=[
            ("v >= 40", "delete", None),
            ("v >= 30", "update", {"v": "v + 0.5"}),
        ],
    )
    feed = spark.read.parquet(t._manifest(v2)["cdc"])
    dels = sorted(
        (r["k"], r["v"])
        for r in feed.filter(F.col("_change_type") == "delete").collect()
    )
    ins = sorted(
        (r["k"], r["v"])
        for r in feed.filter(F.col("_change_type") == "insert").collect()
    )
    # k=1 fired update; k=2 unmatched-by-source, no clause -> nothing;
    # k=3 by-source update pair; k=4 by-source delete; k=9 insert
    assert dels == [(1, 10.0), (3, 30.0), (4, 40.0)]
    assert ins == [(1, 100.0), (3, 30.5), (9, 90.0)]
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows == {1: 100.0, 2: 20.0, 3: 30.5, 9: 90.0}
    # reconciliation: v1 rows minus deletes plus inserts == v2 rows
    before = {(r["k"], r["v"]) for r in t.read(v1).collect()}
    after = (before - set(dels)) | set(ins)
    assert after == {(r["k"], r["v"]) for r in t.read().collect()}
    # and the netted file-diff feed agrees with the change files
    net = t.changes(v1, v2)
    net_dels = sorted(
        (r["k"], r["v"])
        for r in net.filter(F.col("_change_type") == "delete").collect()
    )
    net_ins = sorted(
        (r["k"], r["v"])
        for r in net.filter(F.col("_change_type") == "insert").collect()
    )
    assert net_dels == dels and net_ins == ins


def test_merge_when_residual_by_source_cdf_multirow(spark, tmp_path):
    """The hardest r13 corner, all at once: CDF imaging x ON-residual
    x by-source clauses x a multi-row key. The residual-failing row of
    a FIRED key is row-level NOT MATCHED: it re-stages through the
    by-source chain (here: deleted) and images as a delete; the fired
    pair images as its delete+insert; the untouched unmatched row
    images NOTHING; the feed reconciles with the table delta."""
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stats_columns=["k"],
        change_data_feed=True,
    )
    t.append(
        spark.createDataFrame(
            [(1, 10.0), (1, 99.0), (2, 20.0)], "k long, v double"
        )
    )
    v1 = t.current_version()
    v2 = t.merge_when(
        spark.createDataFrame([(1, 50.0)], "k long, v double"),
        "k",
        matched=[(None, "update", {"v": "s.v"})],
        not_matched_by_source=[("v > 90", "delete", None)],
        on_residual="t.v < 50",
    )
    rows = sorted((r["k"], r["v"]) for r in t.read().collect())
    # (1,10) matched+fired -> 50; (1,99) residual-failed passenger ->
    # by-source delete; (2,20) unmatched, clause false -> untouched
    assert rows == [(1, 50.0), (2, 20.0)]
    feed = spark.read.parquet(t._manifest(v2)["cdc"])
    dels = sorted(
        (r["k"], r["v"])
        for r in feed.filter(F.col("_change_type") == "delete").collect()
    )
    ins = sorted(
        (r["k"], r["v"])
        for r in feed.filter(F.col("_change_type") == "insert").collect()
    )
    assert dels == [(1, 10.0), (1, 99.0)]
    assert ins == [(1, 50.0)]
    # reconciliation against the netted file-diff feed
    before = {(r["k"], r["v"]) for r in t.read(v1).collect()}
    assert (before - set(dels)) | set(ins) == set(rows)


def test_merge_when_schema_evolution(spark, tmp_path):
    """A conditional MERGE whose source ADDS a column widens the table
    additively (Delta autoMerge through the shared planner): updated
    and inserted rows carry the new column, survivors NULL-pad."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"))
    src = spark.createDataFrame(
        [(1, 100.0, "x"), (9, 90.0, "y")], "k long, v double, w string"
    )
    t.merge_when(
        src, "k",
        matched=[("s.v > t.v", "update_all", None)],
        not_matched=[None],
    )
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(1, 100.0, "x"), (2, 20.0, None), (9, 90.0, "y")]


def test_merge_composite_key(spark, tmp_path):
    """MERGE on a multi-column key: matched (k1, k2) tuples replaced,
    unmatched inserted, per-column rectangle pruning keeps files
    outside ANY key column's range untouched, and duplicate TUPLES
    (not merely duplicate single-column values) are rejected."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k1", "k2"])
    for lo in (0, 1000):
        t.append(
            spark.range(lo, lo + 10)
            .select(
                F.col("id").alias("k1"),
                (F.col("id") % 2).alias("k2"),
                (F.col("id") * 2).alias("val"),
            )
            .coalesce(1)
        )
    before = _manifest_files(t)
    # update (1001, 1), insert (1001, 7): same k1, different k2
    source = spark.createDataFrame(
        [(1001, 1, -1), (1001, 7, -7)], "k1 long, k2 long, val long"
    )
    t.merge(source, ["k1", "k2"])
    after = _manifest_files(t)
    assert len(before & after) == 1  # 0-band file untouched (k1 pruning)
    rows = {(r["k1"], r["k2"]): r["val"] for r in t.read().collect()}
    assert len(rows) == 21
    assert rows[(1001, 1)] == -1 and rows[(1001, 7)] == -7
    assert rows[(1002, 0)] == 2004  # untouched row in the rewritten file
    # duplicate TUPLE rejected; duplicate single-column value is fine
    dup = spark.createDataFrame(
        [(5, 1, 1), (5, 1, 2)], "k1 long, k2 long, val long"
    )
    with pytest.raises(ValueError, match="duplicate merge keys"):
        t.merge(dup, ["k1", "k2"])
    with pytest.raises(ValueError, match="at least one key"):
        t.merge(source, [])


def test_streaming_merge_sink_upserts_idempotently(spark, tmp_path):
    """Durable streaming upsert: each micro-batch merges by key in one
    atomic commit; replays are no-ops; later batches overwrite earlier
    values for the same key; first batch lands in an empty table."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    sink = t.streaming_sink(str(tmp_path / "ckpt"), merge_key="k")
    sink(spark.createDataFrame([(1, 10), (2, 20)], "k long, val long"), 0)
    assert {r["k"]: r["val"] for r in t.read().collect()} == {1: 10, 2: 20}
    sink(spark.createDataFrame([(2, 99), (3, 30)], "k long, val long"), 1)
    assert {r["k"]: r["val"] for r in t.read().collect()} == {1: 10, 2: 99, 3: 30}
    v = t.current_version()
    # replayed batch id: no-op even though values differ
    sink(spark.createDataFrame([(2, -1)], "k long, val long"), 1)
    assert t.current_version() == v
    assert {r["k"]: r["val"] for r in t.read().collect()} == {1: 10, 2: 99, 3: 30}
    with pytest.raises(ValueError, match="mutually exclusive"):
        t.streaming_sink(str(tmp_path / "c2"), checks=[{"kind": "not_null", "column": "k"}], merge_key="k")


def test_schema_evolution_additive_columns(spark, tmp_path):
    """Additive evolution: a commit may add columns; older files read
    them as NULL because readers take the TABLE schema from the
    manifest (no mergeSchema footer sweep); type changes are rejected
    AT COMMIT and leave the table untouched."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.append(spark.createDataFrame([(1, "a")], "id long, name string"))
    t.append(
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, name string, score double"
        )
    )
    cur = t.read()
    assert [f.name for f in cur.schema.fields] == ["id", "name", "score"]
    rows = {r["id"]: (r["name"], r["score"]) for r in cur.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
    # time travel: v1 still reads with its own (narrow) schema
    assert [f.name for f in t.read(1).schema.fields] == ["id", "name"]
    # type change rejected pre-staging; table unchanged
    v = t.current_version()
    with pytest.raises(ValueError, match="schema evolution rejected"):
        t.append(spark.createDataFrame([("x", "c")], "id string, name string"))
    assert t.current_version() == v
    # overwrite RESETS the schema
    t.overwrite(spark.createDataFrame([("x",)], "id string"))
    assert [f.name for f in t.read().schema.fields] == ["id"]
    t.append(spark.createDataFrame([("y",)], "id string"))  # consistent again


def test_schema_survives_merge_and_delete(spark, tmp_path):
    """MERGE/DELETE carry the manifest schema forward, so an evolved
    table keeps returning NULL-padded old files after maintenance."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    t.append(spark.createDataFrame([(1, 10)], "k long, v long").coalesce(1))
    t.append(
        spark.createDataFrame([(2, 20, "x")], "k long, v long, tag string").coalesce(1)
    )
    t.delete_where("k", 100, 200)  # no-op band but exercises the path
    t.merge(
        spark.createDataFrame([(2, 21, "y")], "k long, v long, tag string"), "k"
    )
    rows = {r["k"]: (r["v"], r["tag"]) for r in t.read().collect()}
    assert rows == {1: (10, None), 2: (21, "y")}
    assert [f.name for f in t.read().schema.fields] == ["k", "v", "tag"]


def test_merge_and_delete_handle_mixed_schema_candidates(spark, tmp_path):
    """The maintenance rewrites must read candidate files through the
    manifest schema: a pre-evolution file inside the candidate band is
    NULL-padded, not a union error or a dropped column."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    t.append(spark.createDataFrame([(1, 10)], "k long, v long").coalesce(1))
    t.append(
        spark.createDataFrame([(2, 20, "x")], "k long, v long, tag string").coalesce(1)
    )
    # band covers BOTH files -> the narrow v1 file is a rewrite candidate
    t.merge(
        spark.createDataFrame(
            [(1, 11, "new"), (3, 30, "z")], "k long, v long, tag string"
        ),
        "k",
    )
    rows = {r["k"]: (r["v"], r["tag"]) for r in t.read().collect()}
    assert rows == {1: (11, "new"), 2: (20, "x"), 3: (30, "z")}
    t2 = SnapshotTable(spark, str(tmp_path / "tbl2"), stats_columns=["k"])
    t2.append(spark.createDataFrame([(1, 10)], "k long, v long").coalesce(1))
    t2.append(
        spark.createDataFrame([(5, 50, "x")], "k long, v long, tag string").coalesce(1)
    )
    t2.delete_where("k", 1, 5)  # both files are candidates
    assert t2.read().count() == 0
    assert [f.name for f in t2.read().schema.fields] == ["k", "v", "tag"]


def test_merge_schema_auto_evolution(spark, tmp_path):
    """Delta autoMerge semantics: a source ADDING columns widens the
    table (old rows NULL-pad); a source MISSING columns NULL-pads its
    own rows; a type conflict is rejected before staging."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    t.append(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    # source adds a column
    t.merge(
        spark.createDataFrame([(2, 21, "x"), (3, 30, "y")],
                              "k long, v long, tag string"),
        "k",
    )
    rows = {r["k"]: (r["v"], r["tag"]) for r in t.read().collect()}
    assert rows == {1: (10, None), 2: (21, "x"), 3: (30, "y")}
    # source misses a column: its rows NULL-pad it
    t.merge(spark.createDataFrame([(1, 11), (4, 40)], "k long, v long"), "k")
    rows = {r["k"]: (r["v"], r["tag"]) for r in t.read().collect()}
    assert rows == {1: (11, None), 2: (21, "x"), 3: (30, "y"), 4: (40, None)}
    # type conflict rejected, table unchanged
    v = t.current_version()
    with pytest.raises(ValueError, match="schema evolution rejected"):
        t.merge(spark.createDataFrame([("a", 1)], "k string, v long"), "k")
    assert t.current_version() == v


def test_streaming_merge_sink_end_to_end_with_restart(spark, tmp_path):
    """Full Structured Streaming path for the upsert sink: a file-
    source stream merges per micro-batch into the table; restarting
    the query on the same checkpoint with new files arriving while it
    was DOWN upserts exactly the new data (and replays nothing)."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])

    def run_query():
        stream = (
            spark.readStream.schema("k LONG, val LONG")
            .format("parquet")
            .load(str(src))
            # one row per key per batch: latest val wins (merge rejects
            # in-batch duplicate keys by design)
            .groupBy("k")
            .agg(F.max("val").alias("val"))
        )
        q = (
            stream.writeStream.option("checkpointLocation", ckpt)
            .outputMode("complete")
            .foreachBatch(
                lambda df, bid: t.streaming_sink(ckpt, merge_key="k")(
                    df.select("k", "val"), bid
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame([(1, 10), (2, 20)], "k long, val long").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    run_query()
    assert {r["k"]: r["val"] for r in t.read().collect()} == {1: 10, 2: 20}
    # new file lands while the query is down; restart merges the union
    spark.createDataFrame([(2, 99), (3, 30)], "k long, val long").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    run_query()
    assert {r["k"]: r["val"] for r in t.read().collect()} == {1: 10, 2: 99, 3: 30}
    # third restart with NO new data: no new version (nothing replayed)
    v = t.current_version()
    run_query()
    assert t.current_version() == v


def test_history_and_restore(spark, tmp_path):
    """DESCRIBE HISTORY + RESTORE semantics: restore commits an old
    snapshot's state as a NEW version (history preserved, bad versions
    still time-travelable), keeps streaming markers un-rewound, and
    expire after restore keeps the restored files alive."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    t.append(spark.range(10).select(F.col("id").alias("v")))          # v1
    sink = t.streaming_sink(str(tmp_path / "ckpt"))
    sink(spark.range(10, 30).select(F.col("id").alias("v")), 0)       # v2 (marker)
    t.overwrite(spark.range(999).select(F.col("id").alias("v")))      # v3 "bad"
    v4 = t.restore(2)
    assert v4 == 4
    assert t.read().count() == 30                # rolled back
    assert t.read(3).count() == 999              # bad version still readable
    # marker NOT rewound: replay of batch 0 is still a no-op
    sink(spark.range(5).select(F.col("id").alias("v")), 0)
    assert t.current_version() == 4
    h = {r["version"]: r for r in t.history().collect()}
    assert set(h) == {1, 2, 3, 4}
    assert h[2]["batch_markers"] is not None
    assert h[4]["n_files"] == h[2]["n_files"]
    assert h[1]["n_columns"] == 1 and h[1]["audited"] is False
    # expire keeps the restored files (referenced by v4)
    t.expire(keep_last=1)
    assert t.read().count() == 30
    with pytest.raises(FileNotFoundError):
        t.restore(3)  # expired manifest can't be restored


def test_concurrent_disjoint_merges_both_commit(spark, tmp_path):
    """Two racing merges over DISJOINT key bands: the CAS loser's
    retry re-splits against the fresh manifest, finds its own
    candidate set untouched by the winner, and commits — no lost
    update, both upserts present."""
    import threading

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    for lo in (0, 1000):
        t.append(
            spark.range(lo, lo + 10)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("val"))
            .coalesce(1)
        )
    barrier = threading.Barrier(2)
    errs = []

    def merger(lo):
        try:
            barrier.wait()
            t.merge(
                spark.createDataFrame([(lo + 1, -lo - 1)], "k long, val long"), "k"
            )
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=merger, args=(lo,)) for lo in (0, 1000)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    rows = {r["k"]: r["val"] for r in t.read().collect()}
    assert rows[1] == -1 and rows[1001] == -1001
    assert len(rows) == 20 and t.current_version() == 4


def test_bloom_point_key_merge_prunes_scattered_keys(spark, tmp_path):
    """Point-key skipping: a CDC batch with keys {1, 2005} interval-
    overlaps every file (min/max pruning is useless for scattered
    keys), but the manifest blooms prove the middle file holds neither
    key — it carries over untouched."""
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), stats_columns=["k"], bloom_columns=["k"]
    )
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 10)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("val"))
            .coalesce(1)
        )
    before = _manifest_files(t)
    src = spark.createDataFrame([(1, -1), (2005, -5)], "k long, val long")
    t.merge(src, "k")
    after = _manifest_files(t)
    # without blooms all 3 files are rewrite candidates; with them the
    # 1000-band file is proven key-free and survives as the same path
    assert len(before & after) == 1
    rows = {r["k"]: r["val"] for r in t.read().collect()}
    assert rows[1] == -1 and rows[2005] == -5
    assert rows[1005] == 2010 and len(rows) == 30
    # compaction/overwrite rebuild blooms; a follow-up point merge
    # against the compacted table is still correct
    t.compact(target_rows_per_file=100)
    t.merge(spark.createDataFrame([(7, -7)], "k long, val long"), "k")
    assert {r["k"]: r["val"] for r in t.read().collect()}[7] == -7


def test_bloom_probe_roundtrip_unit(spark):
    """The Spark-side bloom build and the driver-side probe use the
    same double-hash: present keys always hit; absent keys mostly
    miss (false-positive rate is bounded, never a false negative)."""
    from collective_als_spark.sources.layout import (
        SnapshotTable as ST,
    )

    t = ST(spark, "/tmp/_bloom_unit_unused", bloom_columns=["k"])
    df = spark.range(100).select(F.col("id").alias("k"))
    import tempfile

    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(d)
    import os

    files = [f"{d}/{n}" for n in os.listdir(d) if n.endswith(".parquet")]
    blooms = t._file_blooms(files)
    [(rel, by_col)] = blooms.items()
    b64 = by_col["k"]
    present = t._source_key_hashes(
        spark.range(100).select(F.col("id").alias("k")), "k"
    )
    absent = t._source_key_hashes(
        spark.range(10_000, 10_100).select(F.col("id").alias("k")), "k"
    )
    from collective_als_spark.sources.layout import _bloom_probe

    assert _bloom_probe(b64, present) is True
    for h in present:
        assert _bloom_probe(b64, [h]) is True  # no false negatives
    misses = sum(0 if _bloom_probe(b64, [h]) else 1 for h in absent)
    assert misses >= 90, f"only {misses}/100 absent keys pruned"


def test_append_clustered_makes_stats_prune(spark, tmp_path):
    """The layout knob: the SAME shuffled data appended clustered vs
    unclustered — banded reads prune to a fraction of the files on the
    clustered table and (necessarily) open everything on the shuffled
    one. Results are identical either way (pruning stays pure)."""
    shuffled = (
        spark.range(1000)
        .select(F.col("id").alias("v"))
        .orderBy(F.xxhash64("v"))  # destroy natural ordering
    )
    t_bad = SnapshotTable(spark, str(tmp_path / "bad"), stats_columns=["v"])
    t_bad.append(shuffled.repartition(8))
    t_good = SnapshotTable(spark, str(tmp_path / "good"), stats_columns=["v"])
    t_good.append_clustered(shuffled, ["v"], n_files=8)
    band = ("v", 100, 199)
    got_bad = sorted(r["v"] for r in t_bad.read(where=band).collect())
    got_good = sorted(r["v"] for r in t_good.read(where=band).collect())
    assert got_bad == got_good == list(range(100, 200))
    n_bad = len(t_bad.read(where=band).inputFiles())
    n_good = len(t_good.read(where=band).inputFiles())
    assert n_good <= 2 < n_bad, (n_good, n_bad)
    # maintenance benefits too: a band delete rewrites few files
    before = _manifest_files(t_good)
    t_good.delete_where("v", 100, 199)
    assert len(before & _manifest_files(t_good)) >= 6


def test_changes_cdf_between_versions(spark, tmp_path):
    """CDF-lite: append -> pure inserts; merge -> update appears as
    its delete+insert pair plus the new key's insert; only changed
    files are opened (the untouched file never appears in the scan)."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    t.append(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, val long").coalesce(1)
    )                                                                  # v1
    t.append(
        spark.createDataFrame([(1000, 99)], "k long, val long").coalesce(1)
    )                                                                  # v2
    ch12 = t.changes(1, 2).collect()
    assert {(r["k"], r["val"], r["_change_type"]) for r in ch12} == {
        (1000, 99, "insert")
    }
    t.merge(spark.createDataFrame([(2, 21), (3, 30)], "k long, val long"), "k")  # v3
    ch23 = {(r["k"], r["val"], r["_change_type"]) for r in t.changes(2).collect()}
    assert ch23 == {(2, 20, "delete"), (2, 21, "insert"), (3, 30, "insert")}
    # economics: the scan opens ONLY the diffed files — the untouched
    # 1000-band file (present in both manifests) is never read
    opened_names = {f.rsplit("/", 1)[-1] for f in t.changes(2).inputFiles()}
    untouched = set(t._manifest(3)["files"]) & set(t._manifest(2)["files"])
    assert untouched
    assert not {f.rsplit("/", 1)[-1] for f in untouched} & opened_names
    # changes from version 0 = the whole current table as inserts
    full = t.changes(0)
    assert full.filter(F.col("_change_type") == "insert").count() == t.read().count()
    assert full.filter(F.col("_change_type") == "delete").count() == 0


# ---------------------------------------------------------------------------
# per-file null-count stats (r05 verdict #5)
# ---------------------------------------------------------------------------


def test_null_count_stats_prune_null_reads(spark, tmp_path):
    """Manifests record per-file null counts; IS NULL / IS NOT NULL
    reads skip files the counts prove empty of matches, with the exact
    residual applied — result equals the full-scan filter."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["c"])
    t.append(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, c long").coalesce(1)
    )  # no nulls
    t.append(
        spark.createDataFrame(
            [(3, None), (4, None)], "id long, c long"
        ).coalesce(1)
    )  # all null
    t.append(
        spark.createDataFrame([(5, 50), (6, None)], "id long, c long").coalesce(1)
    )  # mixed
    full = t.read()
    # IS NULL: the no-null file is never opened
    nulls = t.read(where_null=("c", True))
    assert sorted(r["id"] for r in nulls.collect()) == sorted(
        r["id"] for r in full.filter(F.col("c").isNull()).collect()
    ) == [3, 4, 6]
    assert len(nulls.inputFiles()) == 2
    # IS NOT NULL: the all-null file is never opened
    notnulls = t.read(where_null=("c", False))
    assert sorted(r["id"] for r in notnulls.collect()) == [1, 2, 5]
    assert len(notnulls.inputFiles()) == 2
    # banded read: the all-null file is provably out (min/max are NULL
    # with nulls == rows) instead of conservatively opened
    banded = t.read(where=("c", 0, 100))
    assert len(banded.inputFiles()) == 2
    assert sorted(r["id"] for r in banded.collect()) == [1, 2, 5]
    # composition: band + not-null
    both = t.read(where=("c", 15, 60), where_null=("c", False))
    assert sorted(r["id"] for r in both.collect()) == [2, 5]


def test_merge_rejects_null_keys(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    t.append(spark.createDataFrame([(1, 10)], "k long, v long"))
    bad = spark.createDataFrame([(None, 99), (2, 20)], "k long, v long")
    with pytest.raises(ValueError, match="NULL merge-key"):
        t.merge(bad, "k")
    with pytest.raises(ValueError, match="NULL merge-key"):
        t.merge_mor(bad, "k")
    # composite key with one NULL component also rejected
    t2 = SnapshotTable(spark, str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([(1, 1, 10)], "a long, b long, v long"))
    with pytest.raises(ValueError, match="NULL merge-key"):
        t2.merge(
            spark.createDataFrame([(1, None, 5)], "a long, b long, v long"),
            ["a", "b"],
        )


# ---------------------------------------------------------------------------
# segmented manifest metadata: commits are O(delta), not O(table)
# (r05 verdict #1)
# ---------------------------------------------------------------------------


def test_commit_metadata_is_delta_proportional(spark, tmp_path):
    """Each commit writes ONE chunk (its own files' stats/blooms) plus
    a tiny version manifest referencing the chunk list — per-commit
    metadata bytes stay flat while the table's file count grows."""
    root = tmp_path / "tbl"
    t = SnapshotTable(
        spark, str(root), stats_columns=["v"], bloom_columns=["v"]
    )
    snap = root / "_snapshots"

    def new_meta_bytes(before):
        sizes = {p.name: p.stat().st_size for p in snap.iterdir()}
        return sum(sz for n, sz in sizes.items() if n not in before), sizes

    seen: dict = {}
    per_commit = []
    for i in range(10):
        t.append(
            spark.createDataFrame(
                [(i * 10 + j,) for j in range(10)], "v long"
            ).coalesce(1)
        )
        nb, seen = new_meta_bytes(seen)
        per_commit.append(nb)
    # the 10th commit (10x the files in the table) writes no more
    # metadata than 2x the 2nd commit — delta-proportional, not
    # table-proportional (inline manifests grew linearly)
    assert per_commit[-1] <= 2 * per_commit[1], per_commit
    raw = t._raw_manifest(t.current_version())
    assert "files" not in raw and len(raw["chunks"]) == 10
    # resolution still sees everything, at any time-travel version,
    # with stats pruning intact
    assert t.read().count() == 100
    assert t.read(version=3).count() == 30
    assert sorted(
        r["v"] for r in t.read(where=("v", 35, 44)).collect()
    ) == list(range(35, 45))


def test_metadata_consolidation_bounds_chunk_count(spark, tmp_path, monkeypatch):
    from collective_als_spark.sources import layout as L

    monkeypatch.setattr(L, "_MAX_META_CHUNKS", 4)
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    for i in range(7):
        t.append(spark.createDataFrame([(i,)], "v long").coalesce(1))
    raw = t._raw_manifest(t.current_version())
    assert len(raw["chunks"]) <= L._MAX_META_CHUNKS + 1
    assert t.read().count() == 7
    assert sorted(r["v"] for r in t.read().collect()) == list(range(7))
    # a COW delete tombstones the rewritten file instead of rewriting
    # carried chunk metadata
    t.delete_where("v", 2, 2)
    assert t.read().count() == 6
    # expire collects chunks/sidecars no retained manifest references
    n_before = len(list((tmp_path / "t" / "_snapshots").glob("chunk-*")))
    t.expire(keep_last=1)
    n_after = len(list((tmp_path / "t" / "_snapshots").glob("chunk-*")))
    assert n_after < n_before
    assert t.read().count() == 6


def test_legacy_inline_manifest_migrates_on_next_commit(spark, tmp_path):
    """Pre-segmentation tables (inline files/stats/blooms in v<N>.json)
    stay readable, and their first new commit migrates the carried
    metadata into a chunk."""
    import json as _json

    t = SnapshotTable(
        spark, str(tmp_path / "t"), stats_columns=["v"], bloom_columns=["v"]
    )
    t.append(spark.createDataFrame([(1,), (2,)], "v long").coalesce(1))
    # rewrite v1 in the legacy inline form
    raw = t._raw_manifest(1)
    resolved = t._resolve(raw)
    legacy = {
        "version": 1,
        "files": resolved["files"],
        "stats": resolved.get("stats", {}),
        "blooms": t._manifest_blooms(resolved),
        "schema": resolved.get("schema"),
    }
    (tmp_path / "t" / "_snapshots" / "v1.json").write_text(_json.dumps(legacy))
    t2 = SnapshotTable(
        spark, str(tmp_path / "t"), stats_columns=["v"], bloom_columns=["v"]
    )  # fresh instance: no stale caches
    assert sorted(r["v"] for r in t2.read().collect()) == [1, 2]
    t2.append(spark.createDataFrame([(3,)], "v long").coalesce(1))
    raw2 = t2._raw_manifest(2)
    assert "files" not in raw2 and "chunks" in raw2
    assert sorted(r["v"] for r in t2.read().collect()) == [1, 2, 3]
    # point-key merge still probes the migrated blooms
    t2.merge(spark.createDataFrame([(2, "x")], "v long, tag string"), "v")
    assert {r["v"]: r["tag"] for r in t2.read().collect()} == {
        1: None, 2: "x", 3: None,
    }


# ---------------------------------------------------------------------------
# round-6 code-review regression fixes
# ---------------------------------------------------------------------------


def test_merge_source_missing_stats_column_null_pads(spark, tmp_path):
    """A merge/merge_mor source missing a stats/bloom column must
    NULL-pad (documented auto-evolution), not crash the staging stats
    pass that selects the column by name."""
    for flavor in ("cow", "mor"):
        t = SnapshotTable(
            spark, str(tmp_path / flavor),
            stats_columns=["k", "band"], bloom_columns=["k"],
        )
        t.append(
            spark.createDataFrame(
                [(1, 10, 100), (2, 20, 200)], "k long, band long, cents long"
            )
        )
        src = spark.createDataFrame([(2, 999), (3, 333)], "k long, cents long")
        (t.merge if flavor == "cow" else t.merge_mor)(src, "k")
        rows = {r["k"]: (r["band"], r["cents"]) for r in t.read().collect()}
        assert rows == {1: (10, 100), 2: (None, 999), 3: (None, 333)}
        # the staged files carry stats for the padded column too: an
        # IS NOT NULL read can prove the all-null new file out
        notnull = t.read(where_null=("band", False))
        assert sorted(r["k"] for r in notnull.collect()) == [1]


def test_banded_read_with_date_bounds(spark, tmp_path):
    """Manifest stats store dates as ISO strings (_jsonable); probe
    bounds given as datetime.date must compare in the same space, not
    TypeError."""
    import datetime as dt

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["d"])
    rows = [(dt.date(2024, 1, 1 + i),) for i in range(10)]
    t.append(spark.createDataFrame(rows[:5], "d date").coalesce(1))
    t.append(spark.createDataFrame(rows[5:], "d date").coalesce(1))
    got = t.read(where=("d", dt.date(2024, 1, 2), dt.date(2024, 1, 4)))
    assert len(got.inputFiles()) == 1  # second file pruned via ISO compare
    assert sorted(r["d"].day for r in got.collect()) == [2, 3, 4]
    # delete_where with date band exercises the same comparison
    t.delete_where("d", dt.date(2024, 1, 6), dt.date(2024, 1, 7))
    assert t.read().count() == 8


def test_expire_grace_protects_young_orphans(spark, tmp_path):
    """Never-referenced files younger than the grace window survive
    (they may belong to an in-flight commit); files released by the
    manifests this expire drops are collected immediately; aged
    orphans are collected on the next pass."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.append(spark.createDataFrame([(1,)], "v long"))
    t.overwrite(spark.createDataFrame([(2,)], "v long"))
    # a crashed commit's staged-but-unpublished files (young)
    orphans = t._write_data(spark.createDataFrame([(9,)], "v long"))
    odir = os.path.dirname(orphans[0])
    # released-by-expire collection is immediate even though young
    deleted = t.expire(keep_last=1)
    assert deleted >= 1  # v1's file released and collected
    assert t.log.exists(odir)  # young never-referenced orphan survives
    # age the orphan dir past the window: collected on the next pass
    old = os.stat(odir).st_mtime - 3600
    os.utime(odir, (old, old))
    assert t.expire(keep_last=1) >= 1
    assert not t.log.exists(odir)
    assert t.read().count() == 1  # head untouched throughout


def test_dv_width_unknown_stays_unblocked_from_broadcast(spark, tmp_path):
    """A pre-r06 manifest (DV mapped, no dv_rows) must keep the DV
    width-unknown through later consolidations — never fabricating a
    small count that would re-enable the broadcast the guard blocks."""
    import json as _json

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    t.append(spark.range(0, 100).select(F.col("v" if False else "id").alias("v")).coalesce(1))
    t.delete_where_mor("v", 0, 9)
    # simulate the legacy manifest: strip dv_rows from the head
    p = tmp_path / "tbl" / "_snapshots" / f"v{t.current_version()}.json"
    raw = _json.loads(p.read_text())
    raw.pop("dv_rows", None)
    p.write_text(_json.dumps(raw))
    t2 = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    t2.delete_where_mor("v", 10, 11)  # consolidates over the unknown DV
    m = t2._manifest(t2.current_version())
    rel = next(iter(m["dvs"]))
    assert rel not in m.get("dv_rows", {})  # width still unknown
    plan = t2.read()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan  # conservative shuffle join
    assert t2.read().count() == 88


def test_detail_reports_table_health(spark, tmp_path):
    """DESCRIBE DETAIL numbers a maintenance scheduler keys off:
    files/bytes, DV debt, metadata chunk counts."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    with pytest.raises(ValueError, match="empty table"):
        t.detail()
    t.append(spark.range(0, 100).select(F.col("id").alias("v")).coalesce(1))
    t.append(spark.range(100, 200).select(F.col("id").alias("v")).coalesce(1))
    d = t.detail().first()
    assert d["version"] == 2 and d["n_files"] == 2
    assert d["total_bytes"] and d["total_bytes"] > 0
    assert d["n_meta_chunks"] == 2 and d["n_tombstones"] == 0
    assert d["n_dv_files"] == 0 and d["dv_masked_rows"] == 0
    assert d["committed_at"] is not None
    t.delete_where_mor("v", 0, 9)
    d = t.detail().first()
    assert d["n_dv_files"] == 1 and d["dv_masked_rows"] == 10
    t.compact(target_rows_per_file=1000)
    d = t.detail().first()
    assert d["n_dv_files"] == 0 and d["n_files"] == 1
    assert d["n_tombstones"] >= 0  # carried chunks tombstoned or consolidated
    # r09 columns: mapping / retired / CDC seq-state observability
    assert d["n_renamed_columns"] == 0 and d["n_retired_slots"] == 0
    assert d["has_seq_state"] is False
    t.rename_column("v", "val")
    d = t.detail().first()
    assert d["n_renamed_columns"] == 1


def _vals(t):
    return sorted(r["v"] for r in t.read().collect())


def test_compact_partial_folds_only_small_files(spark, tmp_path):
    """OPTIMIZE semantics: small files fold into ~target-sized files;
    healthy files are carried by PATH (never rewritten); a second run
    with nothing to fold is a version-preserving no-op."""
    from collective_als_spark.sources.layout import _rel

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    t.append(spark.range(0, 1000).select(F.col("id").alias("v")).coalesce(1))
    t.append(spark.range(1000, 2000).select(F.col("id").alias("v")).coalesce(1))
    for i in range(3):
        lo = 2000 + 10 * i
        t.append(
            spark.range(lo, lo + 10).select(F.col("id").alias("v")).coalesce(1)
        )
    base = t._manifest(t.current_version())
    big = [
        f for f in base["files"] if base["stats"][_rel(f)]["__rows"] >= 1000
    ]
    assert len(big) == 2 and len(base["files"]) == 5
    v = t.compact_partial(target_rows_per_file=1000, small_file_max_rows=100)
    m = t._manifest(v)
    assert set(big) <= set(m["files"])  # healthy files untouched, same paths
    assert len(m["files"]) == 3  # 2 big + 1 folded
    assert _vals(t) == list(range(0, 2030))
    folded = next(f for f in m["files"] if f not in big)
    assert m["stats"][_rel(folded)]["__rows"] == 30
    # idempotent no-op: nothing small remains -> no commit
    assert t.compact_partial(1000, small_file_max_rows=100) == v
    assert t.current_version() == v


def test_compact_partial_materializes_dv_debt_without_touching_healthy(
    spark, tmp_path
):
    """A DV-masked file is selected even if large (MOR debt
    materialization); DV-free healthy files stay carried."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    t.append(spark.range(0, 500).select(F.col("id").alias("v")).coalesce(1))
    t.append(spark.range(500, 1000).select(F.col("id").alias("v")).coalesce(1))
    t.delete_where_mor("v", 0, 49)  # DV lands on file 1 only
    base = t._manifest(t.current_version())
    assert len(base.get("dvs", {})) == 1
    v = t.compact_partial(target_rows_per_file=10_000, small_file_max_rows=1)
    m = t._manifest(v)
    assert not m.get("dvs")  # debt materialized away
    assert _vals(t) == list(range(50, 1000))
    # the DV-free file was carried by path
    from collective_als_spark.sources.layout import _rel

    dv_rel = next(iter(base["dvs"]))
    carried = [f for f in base["files"] if _rel(f) != dv_rel]
    assert set(carried) <= set(m["files"])


def test_compact_partial_commutes_with_concurrent_append(spark, tmp_path):
    """The headline concurrency property: an append landing BETWEEN
    the fold's read and its commit does NOT conflict — the folded
    manifest carries the appended file (compact() would CommitConflict
    here)."""
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["v"])
    for i in range(3):
        lo = 10 * i
        t.append(
            spark.range(lo, lo + 10).select(F.col("id").alias("v")).coalesce(1)
        )
    base_v = t.current_version()
    interleaved = []
    orig_stage = t._stage

    def stage_then_append(df, **kwargs):
        out = orig_stage(df, **kwargs)
        if not interleaved:
            interleaved.append(True)
            t2 = SnapshotTable(spark, root, stats_columns=["v"])
            t2.append(
                spark.range(1000, 1010)
                .select(F.col("id").alias("v"))
                .coalesce(1)
            )
        return out

    t._stage = stage_then_append
    v = t.compact_partial(target_rows_per_file=1000, small_file_max_rows=100)
    assert v == base_v + 2  # append committed first, fold on top
    assert _vals(t) == list(range(0, 30)) + list(range(1000, 1010))


def test_compact_partial_conflicts_when_selected_file_changes(
    spark, tmp_path
):
    """A concurrent MOR delete masking rows in a SELECTED file must
    CommitConflict: the staged fold was computed without that DV and
    would silently resurrect the deleted rows."""
    from collective_als_spark.sources.logstore import CommitConflict

    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["v"])
    for i in range(3):
        lo = 10 * i
        t.append(
            spark.range(lo, lo + 10).select(F.col("id").alias("v")).coalesce(1)
        )
    interleaved = []
    orig_stage = t._stage

    def stage_then_delete(df, **kwargs):
        out = orig_stage(df, **kwargs)
        if not interleaved:
            interleaved.append(True)
            t2 = SnapshotTable(spark, root, stats_columns=["v"])
            t2.delete_where_mor("v", 0, 4)  # lands on a selected file
        return out

    t._stage = stage_then_delete
    with pytest.raises(CommitConflict, match="selected for"):
        t.compact_partial(target_rows_per_file=1000, small_file_max_rows=100)
    # the interleaved delete survives; table is consistent
    assert _vals(t) == list(range(5, 30))


def test_append_bucketed_point_read_prunes_exactly(spark, tmp_path):
    """Iceberg bucket(n, key) hidden partitioning: a hashed layout
    gives every file the FULL key range (interval stats prune nothing)
    but point reads open only the literal's bucket file(s), and the
    result equals the full-scan filter exactly."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    t.append_bucketed(df, "k", 16)
    m = t._manifest(t.current_version())
    n_files = len(m["files"])
    assert n_files >= 8  # hashed placement actually spread out
    full = sorted(
        tuple(r) for r in t.read().filter(F.col("k") == 777).collect()
    )
    pruned_df = t.read(where=("k", 777, 777))
    assert sorted(tuple(r) for r in pruned_df.collect()) == full == [
        (777, 2331)
    ]
    opened = pruned_df.select(F.input_file_name()).distinct().count()
    assert opened < n_files / 4  # bucket membership, not interval, pruned
    # a value in no bucket file still returns an exact empty result
    assert t.read(where=("k", 999999, 999999)).count() == 0


def test_bucketed_merge_prunes_candidates_and_carries_files(spark, tmp_path):
    """Merge against a bucketed layout: the source's bucket set (<= n
    values regardless of source size) shrinks candidates to matching
    buckets' files; every other file is carried BY PATH. Scattered CDC
    keys interval-overlap every file, so only the bucket metadata can
    prove files out here (no blooms configured)."""
    from collective_als_spark.sources.layout import _rel

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    t.append_bucketed(df, "k", 16)
    base = t._manifest(t.current_version())
    src = spark.createDataFrame(
        [(5, -1), (999, -2), (1777, -3), (9999, -4)], "k long, v long"
    )
    t.merge(src, "k")
    m2 = t._manifest(t.current_version())
    carried = set(base["files"]) & set(m2["files"])
    # the 4 keys hit at most 4 buckets; with ~16 files, most carry over
    assert len(carried) >= len(base["files"]) - 4
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert len(got) == 2001
    assert got[5] == -1 and got[999] == -2 and got[1777] == -3
    assert got[9999] == -4 and got[4] == 12
    # carried (bucket-pruned) files keep their bucket metadata for the
    # NEXT merge's pruning
    kept_with_meta = [
        f
        for f in carried
        if m2["stats"].get(_rel(f), {}).get("__buckets")
    ]
    assert kept_with_meta
    # mixing layouts degrades pruning, never correctness
    t.append(
        spark.createDataFrame([(50000, 1), (50001, 2)], "k long, v long")
    )
    t.merge(
        spark.createDataFrame([(50000, 7), (3, -9)], "k long, v long"), "k"
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[50000] == 7 and got[3] == -9 and len(got) == 2003


def _ts_df(spark, days, per_day=5):
    """(ts timestamp, v long) rows: per_day rows on each ISO day."""
    rows = [
        (f"{d} 0{h}:00:00", i * 100 + h)
        for i, d in enumerate(days)
        for h in range(per_day)
    ]
    return spark.createDataFrame(rows, "ts string, v long").select(
        F.to_timestamp("ts").alias("ts"), "v"
    )


def test_append_transformed_day_prunes_scattered_periods(spark, tmp_path):
    """Iceberg day(ts) hidden partitioning: a file holding SCATTERED
    days (Jan + Dec) spans the whole year in min/max band stats — only
    the transform VALUE SET can prove it out of a February probe. The
    pruned read equals the full-scan filter exactly and opens only the
    matching period's files."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["ts"])
    jan_dec = [f"2024-01-0{d}" for d in range(1, 6)] + [
        f"2024-12-0{d}" for d in range(1, 6)
    ]
    t.append_transformed(_ts_df(spark, jan_dec), "ts", "day", n_files=1)
    feb = [f"2024-02-0{d}" for d in range(1, 6)]
    t.append_transformed(_ts_df(spark, feb), "ts", "day", n_files=1)
    m = t._manifest(t.current_version())
    assert len(m["files"]) == 2
    probe = ("ts", "2024-02-01 00:00:00", "2024-02-28 23:59:59")
    full = sorted(
        tuple(r)
        for r in t.read()
        .filter(F.col("ts").between(F.lit(probe[1]), F.lit(probe[2])))
        .collect()
    )
    pruned = t.read(where=probe)
    assert sorted(tuple(r) for r in pruned.collect()) == full
    assert len(full) == 25
    # the scattered Jan+Dec file is never opened: its interval covers
    # February but its day SET does not
    opened = {f.rsplit("/", 1)[-1] for f in pruned.inputFiles()}
    assert len(opened) == 1
    # a probe inside the scattered file's interval hole opens nothing
    empty = t.read(where=("ts", "2024-06-01 00:00:00", "2024-06-30 00:00:00"))
    assert empty.count() == 0
    # boundary-spanning probe stays exact (residual always applied)
    part = t.read(where=("ts", "2024-02-03 02:00:00", "2024-12-02 00:30:00"))
    want = sorted(
        tuple(r)
        for r in t.read()
        .filter(
            F.col("ts").between(
                F.lit("2024-02-03 02:00:00"), F.lit("2024-12-02 00:30:00")
            )
        )
        .collect()
    )
    assert sorted(tuple(r) for r in part.collect()) == want


def test_append_transformed_truncate_string_prefix(spark, tmp_path):
    """truncate(2, key) on a string column: prefix-range probes prune
    by recorded prefix sets; results equal the full-scan filter."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    rows_a = [(f"aa{i:03d}", i) for i in range(20)] + [
        (f"zz{i:03d}", i) for i in range(20)
    ]
    rows_m = [(f"mm{i:03d}", i) for i in range(20)]
    t.append_transformed(
        spark.createDataFrame(rows_a, "k string, v long"),
        "k",
        "truncate",
        param=2,
        n_files=1,
    )
    t.append_transformed(
        spark.createDataFrame(rows_m, "k string, v long"),
        "k",
        "truncate",
        param=2,
        n_files=1,
    )
    pruned = t.read(where=("k", "mm000", "mm999"))
    assert pruned.count() == 20
    opened = {f.rsplit("/", 1)[-1] for f in pruned.inputFiles()}
    assert len(opened) == 1  # the aa/zz file's prefix set misses mm
    # truncate on integers: v - v mod W, negatives included
    t2 = SnapshotTable(spark, str(tmp_path / "tbl2"), stats_columns=["k"])
    t2.append_transformed(
        spark.createDataFrame(
            [(i, i) for i in range(-50, 0)], "k long, v long"
        ),
        "k",
        "truncate",
        param=10,
        n_files=1,
    )
    t2.append_transformed(
        spark.createDataFrame(
            [(i, i) for i in range(100, 150)], "k long, v long"
        ),
        "k",
        "truncate",
        param=10,
        n_files=1,
    )
    got = t2.read(where=("k", -25, -20))
    assert sorted(r["k"] for r in got.collect()) == list(range(-25, -19))
    assert len({f for f in got.inputFiles()}) == 1


def test_transformed_merge_prunes_candidates_and_carries_files(
    spark, tmp_path
):
    """Merge against a month(ts)-transformed layout: the source's
    distinct month set (bounded by the periods it touches, not its
    rows) shrinks candidates to matching months' files; every other
    file is carried BY PATH, keeping its transform metadata for the
    next merge."""
    from collective_als_spark.sources.layout import _rel

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    for mo in range(1, 7):
        days = [f"2024-{mo:02d}-{d:02d}" for d in range(1, 4)]
        t.append_transformed(_ts_df(spark, days), "ts", "month", n_files=1)
    base = t._manifest(t.current_version())
    assert len(base["files"]) == 6
    # CDC batch touching only March: merge keyed on ts
    src = spark.createDataFrame(
        [("2024-03-01 00:00:00", -1), ("2024-03-02 01:00:00", -2)],
        "ts string, v long",
    ).select(F.to_timestamp("ts").alias("ts"), "v")
    t.merge(src, "ts")
    m2 = t._manifest(t.current_version())
    carried = set(base["files"]) & set(m2["files"])
    assert len(carried) == 5  # only the March file was rewritten
    got = {r["ts"]: r["v"] for r in t.read().collect()}
    assert len(got) == 90
    # carried files keep their transform metadata
    kept_with_meta = [
        f
        for f in carried
        if m2["stats"].get(_rel(f), {}).get("__transform")
    ]
    assert len(kept_with_meta) == 5
    # mixing layouts degrades pruning, never correctness
    extra = spark.createDataFrame(
        [("2030-01-01 00:00:00", 7)], "ts string, v long"
    ).select(F.to_timestamp("ts").alias("ts"), "v")
    t.append(extra)
    t.merge(
        spark.createDataFrame(
            [("2030-01-01 00:00:00", 8), ("2024-05-01 00:00:00", 9)],
            "ts string, v long",
        ).select(F.to_timestamp("ts").alias("ts"), "v"),
        "ts",
    )
    got = {str(r["ts"]): r["v"] for r in t.read().collect()}
    assert got["2030-01-01 00:00:00"] == 8
    assert got["2024-05-01 00:00:00"] == 9
    assert len(got) == 91


def test_head_hint_bounds_version_discovery(spark, tmp_path):
    """current_version() is hint-first (_snapshots/_head.json, the
    Delta _last_checkpoint shape): a fresh hint resolves with ZERO
    directory listings; lagging, corrupt, ahead-of-reality, or
    missing hints all still resolve the true head."""
    import json as _json

    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["v"])
    for lo in (0, 100, 200):
        t.append(
            spark.range(lo, lo + 10).select(F.col("id").alias("v")).coalesce(1)
        )
    hint_path = os.path.join(root, "_snapshots", "_head.json")
    assert _json.load(open(hint_path))["version"] == 3

    calls = {"list": 0}
    orig = t.log.list_dir

    def counting(path):
        calls["list"] += 1
        return orig(path)

    t.log.list_dir = counting
    assert t.current_version() == 3
    assert calls["list"] == 0  # fresh hint: no listing at all

    # lagging hint (crashed writer): forward probe finds the head
    with open(hint_path, "w") as f:
        _json.dump({"version": 1}, f)
    assert t.current_version() == 3
    assert calls["list"] == 0
    # corrupt hint: full-listing fallback, still correct
    with open(hint_path, "w") as f:
        f.write("{not json")
    assert t.current_version() == 3
    assert calls["list"] >= 1
    # hint ahead of reality (names a missing manifest): fallback
    with open(hint_path, "w") as f:
        _json.dump({"version": 99}, f)
    assert t.current_version() == 3
    # missing hint entirely (pre-hint table): fallback
    os.remove(hint_path)
    assert t.current_version() == 3
    # the next commit repairs the hint
    t.log.list_dir = orig
    t.append(spark.range(5).select(F.col("id").alias("v")).coalesce(1))
    assert _json.load(open(hint_path))["version"] == 4
    # reads and expire still behave with hints in play
    assert t.read().count() == 35
    t.expire(keep_last=1)
    assert t.current_version() == 4
    assert t.read().count() == 35


def test_expire_unknown_mtime_is_in_grace(spark, tmp_path):
    """A store that cannot answer mtime (or a path vanishing under a
    racing committer) must be treated as IN grace — an aged orphan
    with unknown age survives expire instead of being collected, while
    manifest-released files are still collected immediately (release
    needs no age evidence)."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.append(spark.createDataFrame([(1,)], "v long"))
    t.overwrite(spark.createDataFrame([(2,)], "v long"))
    orphans = t._write_data(spark.createDataFrame([(9,)], "v long"))
    odir = os.path.dirname(orphans[0])
    # age the orphan far past the window, then blind the store's clock
    old = os.stat(odir).st_mtime - 3600
    os.utime(odir, (old, old))
    t.log.mtime = lambda _p: None
    deleted = t.expire(keep_last=1)
    assert deleted >= 1  # released-by-this-expire files still collected
    assert t.log.exists(odir)  # unknown-age orphan conservatively kept
    assert t.read().count() == 1


def test_transform_pruning_is_session_timezone_independent(spark, tmp_path):
    """day()/month() value sets persist in manifests, so a reader whose
    spark.sql.session.timeZone differs from the writer's must compute
    IDENTICAL transform values (Iceberg pins day() to UTC epoch for
    exactly this): a zone-crossing probe must never prune a file that
    contains matches, and legacy (unmarked, pre-UTC-fix) day sets must
    be ignored by pruning entirely."""
    import json as _json

    tz_key = "spark.sql.session.timeZone"
    orig_tz = spark.conf.get(tz_key)
    try:
        # writer session: UTC+5:30 — a 23:00 IST row is the PREVIOUS
        # UTC day, so session-zone rendering would record 2024-02-02
        # where UTC rendering records 2024-02-01
        spark.conf.set(tz_key, "Asia/Kolkata")
        t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["ts"])
        edge = spark.createDataFrame(
            [("2024-02-01 23:30:00", 1), ("2024-02-01 04:00:00", 2)],
            "ts string, v long",
        ).select(F.to_timestamp("ts").alias("ts"), "v")
        t.append_transformed(edge, "ts", "day", n_files=1)
        far = spark.createDataFrame(
            [("2024-09-15 12:00:00", 9)], "ts string, v long"
        ).select(F.to_timestamp("ts").alias("ts"), "v")
        t.append_transformed(far, "ts", "day", n_files=1)

        # reader session: UTC-8 — different zone, same instants
        spark.conf.set(tz_key, "America/Los_Angeles")
        r = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["ts"])
        # this PST probe window covers both edge-file instants
        probe = ("ts", "2024-01-31 12:00:00", "2024-02-01 12:00:00")
        got = r.read(where=probe)
        assert sorted(x["v"] for x in got.collect()) == [1, 2]
        # ...and the September file is still pruned across zones
        assert len({f for f in got.inputFiles()}) == 1

        # legacy manifests (no "utc" marker): never pruned on, so a
        # zone-mismatched old table can lose no rows — only pruning
        snap_dir = tmp_path / "tbl" / "_snapshots"
        hit = 0
        for p in snap_dir.iterdir():
            if not p.is_file():
                continue
            blob = p.read_text()
            if '"utc"' in blob:
                hit += 1
                p.write_text(blob.replace(', "utc"', ""))
        assert hit >= 1  # stats may live inline or in manifest chunks
        r2 = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["ts"])
        got2 = r2.read(where=probe)
        assert sorted(x["v"] for x in got2.collect()) == [1, 2]
    finally:
        spark.conf.set(tz_key, orig_tz)


def test_timestamp_time_travel(spark, tmp_path):
    """read(as_of=) resolves Delta's timestampAsOf rule: the newest
    commit at or before the instant; between-commit instants resolve
    to the earlier commit; pre-table instants raise; version/as_of
    are mutually exclusive; legacy timestamp-less manifests are never
    selected by timestamp."""
    import json as _json
    import time as _time

    import pytest as _pytest

    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["v"])
    marks = []
    for lo in (0, 100, 200):
        t.append(
            spark.range(lo, lo + 10).select(F.col("id").alias("v")).coalesce(1)
        )
        marks.append(_time.time())
        _time.sleep(0.05)
    assert t.version_at(marks[0]) == 1
    assert t.version_at(marks[1]) == 2
    assert t.read(as_of=marks[1]).count() == 20
    # a timestamp AFTER the newest commit raises (Delta's rule): a
    # typo'd future instant must not silently read a moving 'latest'
    with _pytest.raises(ValueError, match="after the newest commit"):
        t.read(as_of=marks[2] + 3600)
    with _pytest.raises(ValueError, match="no committed snapshot"):
        t.version_at(marks[0] - 3600)
    with _pytest.raises(ValueError, match="not both"):
        t.read(version=1, as_of=marks[0])
    # legacy manifest (no committed_at): invisible to timestamp travel
    p = tmp_path / "tbl" / "_snapshots" / "v1.json"
    raw = _json.loads(p.read_text())
    ct = raw.pop("committed_at")
    p.write_text(_json.dumps(raw))
    t2 = SnapshotTable(spark, root, stats_columns=["v"])
    with _pytest.raises(ValueError, match="no committed snapshot"):
        t2.version_at(ct)  # v1's own (now-stripped) instant
    assert t2.version_at(marks[1]) == 2  # newer timestamped commits fine
    assert t2.read(version=1).count() == 10  # by-version still works


# ---------------------------------------------------------------------------
# CHECK constraints (Delta ALTER TABLE ADD/DROP CONSTRAINT)
# ---------------------------------------------------------------------------


def test_check_constraint_gates_every_write_path(spark, tmp_path):
    """A table-level CHECK rejects violating batches at the staging
    choke point — append, merge, merge_mor, apply_changes, and
    update_where are all covered — leaving the version unchanged and
    the staged files orphaned (collected by expire)."""
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    t.append(
        spark.createDataFrame(
            [(i, 10 * i) for i in range(1, 6)], "k long, w long"
        ).coalesce(1)
    )
    t.add_check_constraint("w_nonneg", "w >= 0")
    v = t.current_version()
    bad = spark.createDataFrame([(99, -1)], "k long, w long")
    with pytest.raises(ValueError, match="w_nonneg"):
        t.append(bad)
    with pytest.raises(ValueError, match="w_nonneg"):
        t.merge(bad, "k")
    with pytest.raises(ValueError, match="w_nonneg"):
        t.merge_mor(bad, "k")
    with pytest.raises(ValueError, match="w_nonneg"):
        t.apply_changes(
            bad.withColumn("_op", F.lit("U")), "k"
        )
    with pytest.raises(ValueError, match="w_nonneg"):
        t.update_where("k", 2, 3, set={"w": F.lit(-5)})
    assert t.current_version() == v  # nothing committed
    assert t.read().count() == 5
    # good batches still flow, and the constraint survives them
    t.append(spark.createDataFrame([(99, 0)], "k long, w long"))
    assert t._table_checks() == {"w_nonneg": "w >= 0"}
    # orphaned staged files from the rejects are collectible
    t.expire(keep_last=100, orphan_grace_seconds=0)


def test_check_constraint_null_passes_and_validation(spark, tmp_path):
    """SQL CHECK three-valued semantics: NULL evaluations pass; adding
    a constraint existing rows violate is rejected; duplicate names
    and non-boolean junk are rejected."""
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame(
            [(1, 10), (2, None)], "k long, w long"
        ).coalesce(1)
    )
    with pytest.raises(ValueError, match="existing"):
        t.add_check_constraint("w_big", "w > 100")
    t.add_check_constraint("w_pos", "w > 0")  # NULL row passes
    with pytest.raises(ValueError, match="already exists"):
        t.add_check_constraint("w_pos", "w > 1")
    # NULL-valued rows keep passing on write too
    t.append(spark.createDataFrame([(3, None)], "k long, w long"))
    assert t.read().count() == 3
    # drop: violating writes land again
    t.drop_check_constraint("w_pos")
    t.append(spark.createDataFrame([(4, -1)], "k long, w long"))
    assert t.read().count() == 4
    with pytest.raises(ValueError, match="no such"):
        t.drop_check_constraint("w_pos")


def test_check_constraint_survives_maintenance_and_restore(spark, tmp_path):
    """Constraints ride every manifest: unrelated commits, compaction,
    and restore all carry them — a rollback of data must not silently
    drop governance."""
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    t.append(
        spark.createDataFrame([(1, 1)], "k long, w long").coalesce(1)
    )
    pre = t.current_version()
    t.add_check_constraint("w_pos", "w > 0")
    t.append(spark.createDataFrame([(2, 2)], "k long, w long"))
    t.delete_where_mor("k", 1, 1)
    t.compact(target_rows_per_file=100)
    assert t._table_checks() == {"w_pos": "w > 0"}
    t.restore(pre)  # data rollback to BEFORE the constraint existed
    assert t._table_checks() == {"w_pos": "w > 0"}  # governance kept
    with pytest.raises(ValueError, match="w_pos"):
        t.append(spark.createDataFrame([(9, -9)], "k long, w long"))


# ---------------------------------------------------------------------------
# replace_where (Delta replaceWhere: atomic band backfill)
# ---------------------------------------------------------------------------


def test_replace_where_backfills_one_band_atomically(spark, tmp_path):
    """One commit deletes the band and inserts the recomputed frame;
    out-of-band files carry over by path, NULL rows survive, and time
    travel still reads the pre-backfill band."""
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 100)
            .select(F.col("id").alias("v"), F.lit("old").alias("tag"))
            .coalesce(1)
        )
    t.append(
        spark.createDataFrame([(None, "nullrow")], "v long, tag string")
        .coalesce(1)
    )
    before = set(t._manifest(t.current_version())["files"])
    pre = t.current_version()
    fresh = spark.range(1000, 1050).select(
        F.col("id").alias("v"), F.lit("new").alias("tag")
    )
    v = t.replace_where("v", 1000, 1099, fresh)
    assert v == pre + 1  # ONE commit
    m = t._manifest(v)
    carried = before & set(m["files"])
    assert len(carried) >= 2  # the 0- and 2000-band files untouched
    got = {r["v"]: r["tag"] for r in t.read().collect() if r["v"] is not None}
    assert all(got[k] == "new" for k in range(1000, 1050))
    assert not any(k in got for k in range(1050, 1100))  # band fully replaced
    assert all(got[k] == "old" for k in range(0, 100))
    assert [r["tag"] for r in t.read().collect() if r["v"] is None] == [
        "nullrow"
    ]
    assert t.read(pre).filter("v between 1000 and 1099").count() == 100


def test_replace_where_rejects_out_of_band_data(spark, tmp_path):
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    t.append(
        spark.range(0, 10).select(F.col("id").alias("v")).coalesce(1)
    )
    with pytest.raises(ValueError, match="outside the replaced region"):
        t.replace_where(
            "v", 0, 4, spark.createDataFrame([(7,)], "v long")
        )
    with pytest.raises(ValueError, match="NULL"):
        t.replace_where(
            "v", 0, 4, spark.createDataFrame([(None,)], "v long")
        )
    assert t.current_version() == 1
    # empty replacement = pure band delete, still one commit
    t.replace_where("v", 0, 4, spark.createDataFrame([], "v long"))
    assert sorted(r["v"] for r in t.read().collect()) == list(range(5, 10))


def test_replace_where_cdf_and_stream_refusal(spark, tmp_path):
    """CDF images: matched pre-images + new-frame post-images; the
    streaming source refuses op=replace without change files."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.streaming.cdf_source import (
        register_snapshot_cdf,
    )

    register_snapshot_cdf(spark)
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), stats_columns=["v"],
        change_data_feed=True,
    )
    t.append(
        spark.range(0, 10)
        .select(F.col("id").alias("v"), F.lit("old").alias("tag"))
        .coalesce(1)
    )
    v = t.replace_where(
        "v", 3, 5,
        spark.createDataFrame([(3, "new3")], "v long, tag string"),
    )
    ch = sorted(
        (r["v"], r["_change_type"], r["tag"])
        for r in t.changes(v - 1, v).collect()
    )
    assert ch == [
        (3, "delete", "old"),
        (3, "insert", "new3"),
        (4, "delete", "old"),
        (5, "delete", "old"),
    ]
    # and a NON-cdf table's replace commit is refused by the stream
    u = SnapshotTable(spark, str(tmp_path / "plain"), stats_columns=["v"])
    u.append(spark.range(0, 5).select(F.col("id").alias("v")).coalesce(1))
    u.replace_where("v", 0, 1, spark.createDataFrame([(0,)], "v long"))
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", str(tmp_path / "plain"))
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        raised = False
    except Exception as e:
        raised = "copy-on-write replace" in str(e)
    assert raised


def test_zero_file_snapshot_reads_cleanly(spark, tmp_path):
    """A constraint (or any metadata-only commit) can precede data:
    reading the zero-file snapshot gives a clear error without a
    schema and an empty typed frame with one."""
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    t.add_check_constraint("k_pos", "k > 0")
    with pytest.raises(ValueError, match="no data files"):
        t.read()
    t.append(spark.createDataFrame([(1,)], "k long"))
    assert t.read().count() == 1
    with pytest.raises(ValueError, match="k_pos"):
        t.append(spark.createDataFrame([(-1,)], "k long"))
    # delete-all leaves a schema-carrying manifest: empty typed frame
    t.delete_where("k", 0, 100)
    df = t.read()
    assert df.count() == 0 and df.columns == ["k"]


# ---------------------------------------------------------------------------
# clone (shallow + deep)
# ---------------------------------------------------------------------------


def test_shallow_clone_is_metadata_only_and_independent(spark, tmp_path):
    """A shallow clone references the source files without copying,
    reads identically (including through DVs and constraints), then
    evolves independently — and the clone's expire never touches
    source data."""
    import os

    from collective_als_spark.sources.layout import SnapshotTable

    src = SnapshotTable(spark, str(tmp_path / "src"), stats_columns=["k"])
    src.append(
        spark.createDataFrame(
            [(i, i * 10) for i in range(20)], "k long, w long"
        ).coalesce(1)
    )
    src.add_check_constraint("w_nonneg", "w >= 0")
    src.delete_where_mor("k", 3, 4)  # DV rides into the clone
    v_src = src.current_version()
    clone = src.clone_to(str(tmp_path / "dst"))
    # nothing data-sized under the clone root
    data_dir = tmp_path / "dst" / "data"
    assert not data_dir.exists() or not any(os.scandir(data_dir))
    rows = lambda t: sorted(  # noqa: E731
        (r["k"], r["w"]) for r in t.read().collect()
    )
    assert rows(clone) == rows(src)
    # constraints carried
    with pytest.raises(ValueError, match="w_nonneg"):
        clone.append(spark.createDataFrame([(99, -1)], "k long, w long"))
    # independent evolution both directions
    clone.append(spark.createDataFrame([(100, 1)], "k long, w long"))
    src.append(spark.createDataFrame([(200, 2)], "k long, w long"))
    assert (100, 1) in rows(clone) and (100, 1) not in rows(src)
    assert (200, 2) in rows(src) and (200, 2) not in rows(clone)
    # clone maintenance never collects source data: rewrite everything
    # on the clone (dropping the source references), then expire hard
    clone.compact(target_rows_per_file=1000)
    clone.expire(keep_last=1, orphan_grace_seconds=0)
    assert src.current_version() == v_src + 1
    assert src.read(v_src).count() == 18  # source snapshot intact


def test_clone_version_pin_and_deep(spark, tmp_path):
    import shutil

    from collective_als_spark.sources.layout import SnapshotTable

    src = SnapshotTable(spark, str(tmp_path / "src"), stats_columns=["k"])
    src.append(spark.createDataFrame([(1,)], "k long").coalesce(1))
    src.append(spark.createDataFrame([(2,)], "k long").coalesce(1))
    old = src.clone_to(str(tmp_path / "old"), version=1)
    assert [r["k"] for r in old.read().collect()] == [1]
    # deep clone outlives the source entirely
    deep = src.clone_to(str(tmp_path / "deep"), deep=True)
    shutil.rmtree(str(tmp_path / "src"))
    assert sorted(r["k"] for r in deep.read().collect()) == [1, 2]
    # non-empty target rejected
    with pytest.raises(ValueError, match="not empty"):
        deep2 = SnapshotTable(spark, str(tmp_path / "deep"))
        _ = deep2  # the clone call below is the assertion
        old.clone_to(str(tmp_path / "deep"))


def test_files_metadata_table(spark, tmp_path):
    """The files() metadata table reports per-file rows/bytes/DV debt/
    stats without opening any data file — the maintenance join
    surface (compaction victims, clustering audits)."""
    import json as _json

    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    for lo in (0, 1000):
        t.append(
            spark.range(lo, lo + 100).select(F.col("id").alias("v")).coalesce(1)
        )
    t.delete_where_mor("v", 0, 9)
    rows = {r["file"]: r for r in t.files().collect()}
    assert len(rows) == 2
    for f, r in rows.items():
        assert r["n_rows"] == 100 and r["bytes"] > 0
        st = _json.loads(r["stats"])
        assert "v" in st
    masked = sorted(r["dv_masked_rows"] for r in rows.values())
    assert masked == [0, 10]
    assert sum(1 for r in rows.values() if r["dv_dir"]) == 1
    # time travel: pre-delete snapshot shows no DV debt
    old = t.files(version=2).collect()
    assert all(r["dv_masked_rows"] == 0 and r["dv_dir"] is None for r in old)


def test_expire_dry_run_deletes_nothing(spark, tmp_path):
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    for lo in (0, 100, 200):
        t.append(
            spark.range(lo, lo + 10).select(F.col("id").alias("v")).coalesce(1)
        )
    t.compact(target_rows_per_file=1000)
    would = t.expire(keep_last=1, orphan_grace_seconds=0, dry_run=True)
    assert would > 0
    # nothing actually gone: all versions still time-travelable
    for v in range(1, t.current_version() + 1):
        assert t.read(v).count() in (10, 20, 30)
    did = t.expire(keep_last=1, orphan_grace_seconds=0)
    assert did == would  # the dry run predicted the real pass exactly
    with pytest.raises(Exception):
        t.read(1)


def test_clone_on_file_uri_root(spark, tmp_path):
    """Cloning routes through the LogStore layer: URI-rooted source
    and destination behave like local paths."""
    from collective_als_spark.sources.layout import SnapshotTable

    src = SnapshotTable(
        spark, "file://" + str(tmp_path / "src"), stats_columns=["k"]
    )
    src.append(spark.range(0, 20).select(F.col("id").alias("k")).coalesce(1))
    c = src.clone_to("file://" + str(tmp_path / "dst"))
    assert c.read().count() == 20
    c.merge_mor(spark.createDataFrame([(5,), (99,)], "k long"), "k")
    assert c.read().count() == 21
    assert src.read().count() == 20


def test_auto_maintain_policy(spark, tmp_path):
    """The autopilot runs ONLY the passes the table's health numbers
    justify: no-op on a healthy table, partial compaction once small
    files accumulate or a DV lands, retention when configured."""
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    t.append(
        spark.range(0, 1000).select(F.col("id").alias("v")).coalesce(1)
    )
    # healthy: one right-sized file -> nothing to do
    out = t.auto_maintain(target_rows_per_file=1000)
    assert out == {"compacted": None, "expired_files": 0}
    assert t.current_version() == 1
    # streaming residue: ten 1-row commits -> folds
    for i in range(10):
        t.append(
            spark.createDataFrame([(100000 + i,)], "v long")
        )
    out = t.auto_maintain(target_rows_per_file=1000)
    assert out["compacted"] == t.current_version()
    assert t.read().count() == 1010
    # MOR debt alone also triggers (below the small-file count gate)
    t.delete_where_mor("v", 0, 4)
    out = t.auto_maintain(target_rows_per_file=1000)
    assert out["compacted"] is not None
    assert t._manifest(t.current_version()).get("dvs", {}) == {}
    assert t.read().count() == 1005
    # retention composes
    out = t.auto_maintain(
        target_rows_per_file=1000, keep_last=1, older_than=None
    )
    assert out["compacted"] is None and out["expired_files"] > 0
    with pytest.raises(Exception):
        t.read(1)


def test_merge_broadcast_gate_is_byte_aware(spark, tmp_path):
    """r09 verdict #7: the forced-broadcast gate budgets BYTES, not
    just rows — wide string key tuples withhold the hint where the
    row-count gate alone would have broadcast, and the merge still
    commits correctly (AQE picks the strategy)."""
    root = str(tmp_path / "tbl")
    t = SnapshotTable(
        spark,
        root,
        stats_columns=["k"],
        merge_broadcast_max_keys=1_000_000,  # row gate alone: would hint
        merge_broadcast_max_bytes=10_000,    # byte gate: ~100 wide keys
    )
    wide = F.concat(F.lit("k" * 500), F.col("id").cast("string"))
    t.append(
        spark.range(500).select(wide.alias("k"), F.col("id").alias("v"))
    )
    src = spark.range(200, 700).select(
        wide.alias("k"), (F.col("id") * 10).alias("v")
    )
    plan = t._plan_merge(src, "k")
    # 500 keys x ~550 bytes ≈ 275 KB estimated: over the byte budget,
    # under the row budget — the hint must be withheld
    assert plan["nd"] == 500 < 1_000_000
    assert plan["key_bytes"] > 10_000
    assert plan["broadcast_ok"] is False
    # correctness unchanged without the hint
    t.merge(src, "k")
    rows = {r["k"][-3:]: r["v"] for r in t.read().collect()}
    assert len(rows) == 700
    assert rows["250"] == 2500 and rows["100"] == 100
    # a narrow-key source under both budgets still gets the hint
    t2 = SnapshotTable(spark, str(tmp_path / "t2"), stats_columns=["k"])
    t2.append(spark.range(10).select(F.col("id").alias("k")))
    plan2 = t2._plan_merge(
        spark.range(5).select(F.col("id").alias("k")), "k"
    )
    assert plan2["broadcast_ok"] is True


# ---------------------------------------------------------------------------
# manifest-log checkpointing (r10 verdict #5): _last_checkpoint bounds
# the commit path's head resolution to a forward probe
# ---------------------------------------------------------------------------


def _rename_churn(t, n):
    """n fast metadata-only commits (rename there and back)."""
    for i in range(n // 2):
        t.rename_column("w", "w_tmp")
        t.rename_column("w_tmp", "w")


def test_checkpoint_marker_bounds_head_resolution(spark, tmp_path):
    """~200-version log: every 25th commit advances
    ``_last_checkpoint.json``, and ``_listed_version`` resolves the
    head by probing forward from the marker WITHOUT listing the
    ``_snapshots`` dir. Removing the marker falls back to the full
    listing with the same answer; a marker naming an expired version
    is ignored (fallback), never trusted."""
    import json as _json

    import shutil

    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(
        spark.range(10).select(F.col("id").alias("v"), F.col("id").alias("w"))
    )
    _rename_churn(t, 200)
    head = t.current_version()
    assert head == 201
    assert t._checkpoint_version() == 200  # last 25-multiple committed
    calls = []
    real_list_dir = t.log.list_dir
    t.log.list_dir = lambda p: (calls.append(p), real_list_dir(p))[1]
    try:
        assert t._listed_version() == head
        # probe path: never LISTs the O(retained-versions) _snapshots
        # dir itself (the O(few)-name _checkpoints dir is the marker)
        assert all(p.endswith("_checkpoints") for p in calls)
        # no marker -> full listing, same head
        shutil.rmtree(t._checkpoint_dir())
        calls.clear()
        assert t._listed_version() == head
        assert any(p.endswith("_snapshots") for p in calls)
        # stale marker naming an expired/absent version -> fallback
        calls.clear()
        os.makedirs(t._checkpoint_dir(), exist_ok=True)
        with open(f"{t._checkpoint_dir()}/v1", "w") as f:
            _json.dump({"version": 1}, f)
        os.remove(f"{t.root}/_snapshots/v1.json")
        assert t._listed_version() == head
        assert any(p.endswith("_snapshots") for p in calls)
        # a pre-r12 legacy single-file marker is still read as a floor
        shutil.rmtree(t._checkpoint_dir())
        with open(t._legacy_checkpoint_path(), "w") as f:
            _json.dump({"version": 175}, f)
        assert t._checkpoint_version() == 175
        calls.clear()
        assert t._listed_version() == head
        assert not any(p.endswith("_snapshots") for p in calls)
    finally:
        t.log.list_dir = real_list_dir
    # commits still work against the fallback-resolved head
    t.rename_column("w", "w_fin")
    assert t.current_version() == head + 1


def test_expire_advances_checkpoint_before_deleting(spark, tmp_path):
    """Every expire advances the marker to ITS head before deleting a
    single manifest — the invariant _listed_version's probe re-read
    relies on for fork-safety — so post-expire head resolution stays
    on the probe path and commits land strictly after the real head."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(
        spark.range(10).select(F.col("id").alias("v"), F.col("id").alias("w"))
    )
    _rename_churn(t, 60)  # head 61, marker 50
    assert t._checkpoint_version() == 50
    t.expire(keep_last=2)
    head = t.current_version()
    assert t._checkpoint_version() == head == 61
    # expire pruned marker files strictly below its own (max intact)
    assert os.listdir(t._checkpoint_dir()) == ["v61"]
    calls = []
    real_list_dir = t.log.list_dir
    t.log.list_dir = lambda p: (calls.append(p), real_list_dir(p))[1]
    try:
        assert t._listed_version() == head
        assert all(p.endswith("_checkpoints") for p in calls)
    finally:
        t.log.list_dir = real_list_dir
    # and the pure-python writer-side resolver agrees (no listing API
    # to instrument there; equality is the contract)
    from collective_als_spark.streaming.cdf_source import _listed_version

    assert _listed_version(t.root) == head


def test_expire_aborts_before_deleting_when_marker_write_fails(
    spark, tmp_path
):
    """r11-verdict #1: the expire-path marker advance is MANDATORY —
     'marker MUST advance BEFORE any manifest deletion' is what makes
    _listed_version's probe re-read fork-safe. Inject a failing marker
    write (object-store transient) and prove expire deletes NOTHING
    and surfaces the failure, instead of swallowing it and deleting
    behind a stale marker."""
    import pytest as _pytest

    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(
        spark.range(10).select(F.col("id").alias("v"), F.col("id").alias("w"))
    )
    _rename_churn(t, 60)  # head 61, marker 50
    before = sorted(t.log.list_dir(f"{t.root}/_snapshots"))
    real_write = t.log.write_text

    def failing_write(path, content):
        if "/_checkpoints/" in path:
            raise OSError("injected: marker PUT failed")
        return real_write(path, content)

    t.log.write_text = failing_write
    try:
        with _pytest.raises(OSError, match="injected"):
            t.expire(keep_last=2)
    finally:
        t.log.write_text = real_write
    after = sorted(t.log.list_dir(f"{t.root}/_snapshots"))
    assert after == before  # nothing deleted, nothing half-done
    # the table is fully usable and a clean expire succeeds after
    assert t._listed_version() == 61
    t.expire(keep_last=2)
    assert t._checkpoint_version() == 61


def test_expire_aborts_when_head_manifest_unverifiable(spark, tmp_path):
    """r12 ADVICE medium: a transient exists() fault on the head
    manifest during expire must ABORT (nothing deleted), not silently
    skip the marker advance and then delete manifests — that would
    recreate the delete-behind-a-stale-marker fork the strict write
    exists to prevent."""
    import pytest as _pytest

    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(
        spark.range(10).select(F.col("id").alias("v"), F.col("id").alias("w"))
    )
    _rename_churn(t, 60)  # head 61, marker 50
    before = sorted(t.log.list_dir(f"{t.root}/_snapshots"))
    head_path = t._manifest_path(61)
    real_exists = t.log.exists

    def flaky_exists(path):
        if path == head_path:
            return False  # injected: transient object-store fault
        return real_exists(path)

    # pin head resolution (the fault models a transient miss on the
    # VERIFICATION read specifically, not a vanished head)
    t.current_version = lambda: 61
    t.log.exists = flaky_exists
    try:
        with _pytest.raises(RuntimeError, match="not verifiable"):
            t.expire(keep_last=2)
    finally:
        t.log.exists = real_exists
        del t.current_version
    after = sorted(t.log.list_dir(f"{t.root}/_snapshots"))
    assert after == before  # nothing deleted under the fault
    # marker untouched (no partial advance), clean expire works after
    assert t._checkpoint_version() == 50
    t.expire(keep_last=2)
    assert t._checkpoint_version() == 61


def test_explicit_empty_config_clears_table_property(spark, tmp_path):
    """r12 ADVICE low: a handle constructed with EXPLICIT empty
    stats/bloom lists persists an explicit empty config — the
    commit-time carry must not resurrect the previous manifest's
    config, and future config-less handles inherit the cleared
    state ("explicit arguments, including explicit empty lists,
    always win" now holds at the TABLE level too)."""
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stats_columns=["k"], bloom_columns=["k"]
    )
    t.append(spark.range(10).select(F.col("id").alias("k")).coalesce(1))
    assert t._manifest(1)["config"]["stats_columns"] == ["k"]
    # explicit-[] handle commits: config persisted as EXPLICIT empty
    e = SnapshotTable(spark, t.root, stats_columns=[], bloom_columns=[])
    v = e.append(
        spark.range(10, 20).select(F.col("id").alias("k")).coalesce(1)
    )
    assert e._manifest(v)["config"] == {
        "stats_columns": [], "bloom_columns": []
    }
    # config-less handles now inherit the CLEARED config
    h = SnapshotTable(spark, t.root)
    assert h.stats_columns == [] and h.bloom_columns == []
    v2 = h.append(
        spark.range(20, 30).select(F.col("id").alias("k")).coalesce(1)
    )
    # ...and keep it cleared across their own commits
    assert h._manifest(v2).get("config", {}).get("stats_columns") == []
    # partial explicitness: stats cleared, blooms re-enabled
    p = SnapshotTable(spark, t.root, bloom_columns=["k"])
    v3 = p.append(
        spark.range(30, 40).select(F.col("id").alias("k")).coalesce(1)
    )
    assert p._manifest(v3)["config"] == {
        "stats_columns": [], "bloom_columns": ["k"]
    }


def test_checkpoint_marker_cannot_regress_from_stalled_writer(
    spark, tmp_path
):
    """r11-ADVICE medium: under the old single-file marker, a stalled
    writer's read-check-OVERWRITE landing after an expire advanced the
    marker regressed it. Versioned marker files make monotonicity
    structural: replay the exact stall interleaving and prove the
    marker max never regresses."""
    import json as _json

    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(
        spark.range(10).select(F.col("id").alias("v"), F.col("id").alias("w"))
    )
    _rename_churn(t, 60)  # head 61, marker 50
    # stalled writer: read cur (50), pause — meanwhile expire advances
    stalled_version = t._checkpoint_version()
    assert stalled_version == 50
    t.expire(keep_last=2)
    assert t._checkpoint_version() == 61
    # ...the stalled PUT now lands raw (its guard read is long stale;
    # bypass _write_checkpoint's freshness check entirely, as a
    # paused-then-resumed writer effectively does)
    t.log.write_text(
        f"{t._checkpoint_dir()}/v{stalled_version}",
        _json.dumps({"version": stalled_version}),
    )
    assert t._checkpoint_version() == 61  # max intact, no regression
    # and the probe still resolves the true head without _snapshots
    # listings
    calls = []
    real_list_dir = t.log.list_dir
    t.log.list_dir = lambda p: (calls.append(p), real_list_dir(p))[1]
    try:
        assert t._listed_version() == 61
        assert all(p.endswith("_checkpoints") for p in calls)
    finally:
        t.log.list_dir = real_list_dir


def test_checkpoint_probe_safe_under_racing_expire_and_commits(
    spark, tmp_path
):
    """Live race: one thread expires (keep_last=2, repeatedly) while
    another commits metadata-only renames in a loop. The commit path's
    checkpoint-probe head resolution must never fork the log — at the
    end the manifest log is strictly sequential above the last expire
    floor, every commit landed exactly once, and the head equals the
    committed count."""
    import threading

    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(
        spark.range(10).select(F.col("id").alias("v"), F.col("id").alias("w"))
    )
    _rename_churn(t, 60)  # seed past several checkpoint intervals
    start = t.current_version()
    t2 = SnapshotTable(spark, t.root, stats_columns=["v"])  # racing handle
    stop = threading.Event()
    errs = []

    def expirer():
        try:
            while not stop.is_set():
                t2.expire(keep_last=2)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    th = threading.Thread(target=expirer)
    th.start()
    n_commits = 40
    try:
        for i in range(n_commits // 2):
            t.rename_column("w", "w_x")
            t.rename_column("w_x", "w")
    finally:
        stop.set()
        th.join()
    assert not errs, errs
    head = t.current_version()
    assert head == start + n_commits  # every commit landed exactly once
    # the retained log is gap-free from its floor to the head
    import re as _re

    names = t.log.list_dir(f"{t.root}/_snapshots")
    versions = sorted(
        int(m.group(1))
        for m in (_re.fullmatch(r"v(\d+)\.json", n) for n in names)
        if m
    )
    assert versions[-1] == head
    assert versions == list(range(versions[0], head + 1))
    # and the fast probe agrees with the listing
    assert t._listed_version() == head
