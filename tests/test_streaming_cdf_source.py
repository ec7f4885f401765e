"""Streaming CDF source (streaming/cdf_source.py): the snapshot table
consumed via `spark.readStream.format("snapshot_cdf")`.

Contract under test: the stream's cumulative output equals
`SnapshotTable.changes_by_version` over the same window (per-commit
attribution, MOR deletes as DV-position deltas, compaction commits
skipped), and a restarted stream resumes from its checkpoint —
consuming only commits that landed after the first run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.streaming.cdf_source import (
    SnapshotCdfDataSource,
    register_snapshot_cdf,
)


def _run_available_now(spark, root: str, out_path: str, ckpt: str):
    """Drain everything currently available into a parquet sink."""
    stream = (
        spark.readStream.format("snapshot_cdf")
        .option("path", root)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive


def _collect_sorted(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def registered(spark):
    register_snapshot_cdf(spark)
    return spark


def _docs(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit(tag), F.col("id")).alias("s")
    )


def test_cdf_stream_equals_changes_by_version(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "tbl")
    t = SnapshotTable(
        spark, root, stats_columns=["k"], change_data_feed=True
    )
    t.append(_docs(spark, 0, 20, "a").coalesce(1))
    t.append(_docs(spark, 20, 40, "a").coalesce(2))
    t.delete_where_mor("k", 5, 9)  # MOR: DV-position delta
    t.merge(
        spark.createDataFrame([(38, "upd"), (100, "new")], "k long, s string"),
        "k",
    )  # COW merge -> writer-recorded change files
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_available_now(spark, root, out, ckpt)
    got = spark.read.parquet(out)
    cols = ["k", "s", "_change_type", "_commit_version"]
    expected = t.changes_by_version(0, t.current_version())
    assert _collect_sorted(got, cols) == _collect_sorted(expected, cols)
    # spot-check the MOR delete surfaced with its commit attribution
    mor = got.filter(
        (F.col("_commit_version") == 3) & (F.col("_change_type") == "delete")
    )
    assert sorted(r["k"] for r in mor.collect()) == [5, 6, 7, 8, 9]
    # and the COW merge surfaced pre+post images, not rewrite churn
    m4 = got.filter(F.col("_commit_version") == 4)
    assert _collect_sorted(m4, ["k", "s", "_change_type"]) == [
        (38, "a38", "delete"),
        (38, "upd", "insert"),
        (100, "new", "insert"),
    ]


def test_cdf_stream_refuses_cow_commit_without_change_files(
    registered, tmp_path
):
    spark = registered
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["k"])  # CDF off
    t.append(_docs(spark, 0, 10, "a").coalesce(1))
    t.delete_where("k", 0, 4)  # COW delete, no change files
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="change_data_feed|skipChangeCommits"):
        _run_available_now(spark, root, out, ckpt)
    # Delta's escape hatch: skipChangeCommits drops those commits
    stream = (
        spark.readStream.format("snapshot_cdf")
        .option("path", root)
        .option("skipChangeCommits", "true")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 10  # only the append's inserts
    assert {r["_change_type"] for r in got.collect()} == {"insert"}


def test_cdf_stream_resumes_from_checkpoint_and_skips_compaction(
    registered, tmp_path
):
    spark = registered
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["v"])
    for i in range(3):
        t.append(
            spark.range(10 * i, 10 * i + 10)
            .select(F.col("id").alias("v"))
            .coalesce(1)
        )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_available_now(spark, root, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 30
    assert {r["_change_type"] for r in first.collect()} == {"insert"}
    # maintenance + one real append land after the first drain
    t.compact(target_rows_per_file=1000)  # op=compact: dataChange=false
    t.append(spark.range(100, 105).select(F.col("id").alias("v")).coalesce(1))
    _run_available_now(spark, root, out, ckpt)
    second = spark.read.parquet(out)
    # ONLY the appended rows arrive: no replay of the first 30, and the
    # compaction rewrite (30 deletes + 30 inserts of identical rows)
    # was skipped entirely via the manifest op field
    assert second.count() == 35
    new_rows = second.filter(F.col("v") >= 100)
    assert sorted(r["v"] for r in new_rows.collect()) == [100, 101, 102, 103, 104]
    assert {r["_change_type"] for r in new_rows.collect()} == {"insert"}


def test_cdf_source_schema_and_missing_table(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root)
    t.append(
        spark.createDataFrame([(1, "a")], "k long, s string").coalesce(1)
    )
    st = (
        spark.readStream.format("snapshot_cdf")
        .option("path", root)
        .load()
        .schema
    )
    assert [f.name for f in st.fields] == [
        "k",
        "s",
        "_change_type",
        "_commit_version",
    ]
    ds = SnapshotCdfDataSource({"path": str(tmp_path / "absent")})
    with pytest.raises(ValueError, match="no committed snapshot"):
        ds.schema()


def test_cdf_stream_on_file_uri_root(registered, tmp_path):
    """The whole plan/read path (version discovery, manifest JSON,
    cdc listing, parquet + DV reads) routes through pyarrow.fs when
    the table root carries a URI scheme — where a 100 TB table
    actually lives. Same assertions as the local-path suite."""
    spark = registered
    root = "file://" + str(tmp_path / "tbl")
    t = SnapshotTable(
        spark, root, stats_columns=["k"], change_data_feed=True
    )
    t.append(_docs(spark, 0, 20, "a").coalesce(1))
    t.delete_where_mor("k", 5, 9)  # MOR: DV-position delta partitions
    t.merge(
        spark.createDataFrame([(18, "upd"), (100, "new")], "k long, s string"),
        "k",
    )  # COW merge -> cdc change files, listed through the fs layer
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_available_now(spark, root, out, ckpt)
    got = spark.read.parquet(out)
    cols = ["k", "s", "_change_type", "_commit_version"]
    expected = t.changes_by_version(0, t.current_version())
    assert _collect_sorted(got, cols) == _collect_sorted(expected, cols)


def _offset_versions(ckpt: str) -> list[int]:
    """Per-micro-batch end versions from the stream checkpoint's
    offsets log — the ground truth for admission-control assertions."""
    import json
    import os

    odir = os.path.join(ckpt, "offsets")
    out = []
    names = [n for n in os.listdir(odir) if n.isdigit()]
    for name in sorted(names, key=int):
        with open(os.path.join(odir, name)) as f:
            last = f.read().strip().splitlines()[-1]
        out.append(int(json.loads(last)["version"]))
    return out


def test_cdf_restart_throttles_backlog(registered, tmp_path):
    """A restarted stream facing a backlog > maxVersionsPerBatch must
    catch up in BOUNDED micro-batches, not one giant batch: the
    admission-control cursor persisted on commit() re-seeds the clamp
    that the checkpoint-recovery path never hands latestOffset."""
    spark = registered
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["v"])

    def _drain(out, ckpt):
        # availableNow falls back to ONE batch for Python sources, so
        # a throttled catch-up needs a live stream: processAllAvailable
        # runs clamped micro-batches until the backlog is drained
        q = (
            spark.readStream.format("snapshot_cdf")
            .option("path", root)
            .option("maxVersionsPerBatch", "2")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q.awaitTermination(60)

    for i in range(3):
        t.append(
            spark.range(10 * i, 10 * i + 10)
            .select(F.col("id").alias("v"))
            .coalesce(1)
        )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(out, ckpt)
    # a 6-commit backlog lands while the stream is down
    for i in range(3, 9):
        t.append(
            spark.range(10 * i, 10 * i + 10)
            .select(F.col("id").alias("v"))
            .coalesce(1)
        )
    _drain(out, ckpt)  # restart against the same checkpoint
    assert spark.read.parquet(out).count() == 90  # nothing lost/duped
    versions = _offset_versions(ckpt)
    deltas = [b - a for a, b in zip(versions, versions[1:])]
    # EVERY advance is clamped — including the first one after the
    # restart, which without the cursor would swallow all 6 commits
    assert versions[0] <= 2 and all(d <= 2 for d in deltas), versions
    assert len(versions) >= 5  # the backlog took multiple batches


def test_cdf_preop_rewrite_guard(registered, tmp_path):
    """A pre-op manifest (no "op" recorded — older table layout) whose
    file diff is rewrite-shaped is indistinguishable from a COW
    merge/delete: the stream must refuse it (or skip it under
    skipChangeCommits), never replay carried rows as delete+insert."""
    import json as _json
    import os as _os

    spark = registered
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["k"])
    t.append(_docs(spark, 0, 10, "a").coalesce(1))
    t.delete_where("k", 0, 4)  # COW rewrite (op=delete)
    # age the manifest back to the pre-op layout
    mpath = _os.path.join(root, "_snapshots", "v2.json")
    with open(mpath) as f:
        raw = _json.load(f)
    raw.pop("op", None)
    with open(mpath, "w") as f:
        _json.dump(raw, f)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="pre-op|skipChangeCommits"):
        _run_available_now(spark, root, out, ckpt)
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", root)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 10  # only the append; the rewrite skipped
    assert {r["_change_type"] for r in got.collect()} == {"insert"}


def test_cdf_stale_cursor_self_heals(registered, tmp_path):
    """A lagging admission-control cursor (deleted/regressed file, or
    a foreign writer) makes the engine plan a BACKWARD batch (end <
    committed start). The source must self-heal — emit nothing for
    that batch, raise its seed, and resume forward — rather than
    dead-ending the stream or re-emitting committed versions."""
    import json as _json
    import os as _os

    spark = registered
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["v"])

    def _drain(out, ckpt):
        q = (
            spark.readStream.format("snapshot_cdf")
            .option("path", root)
            .option("maxVersionsPerBatch", "2")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q.awaitTermination(60)

    for i in range(5):  # v1..v5
        t.append(
            spark.range(10 * i, 10 * i + 10)
            .select(F.col("id").alias("v"))
            .coalesce(1)
        )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(out, ckpt)
    assert spark.read.parquet(out).count() == 50
    # sabotage: regress the cursor far below the checkpoint, so the
    # restarted stream's first latestOffset (seed 1 + max 2 = 3) lands
    # BELOW the committed start (5) — the backward-batch shape
    cpath = _os.path.join(root, "_cursors", "default.json")
    with open(cpath, "w") as f:
        _json.dump({"version": 1}, f)
    for i in range(5, 7):  # v6, v7 land while "down"
        t.append(
            spark.range(10 * i, 10 * i + 10)
            .select(F.col("id").alias("v"))
            .coalesce(1)
        )
    _drain(out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 70  # nothing lost...
    assert got.select("v").distinct().count() == 70  # ...nothing duped
    # the cursor never stays below the committed floor (the engine's
    # recovery commit and/or the heal path repairs it; the very last
    # batch's commit callback can be skipped on stop, so exact head
    # position is not guaranteed — monotone non-regression is)
    assert _json.load(open(cpath))["version"] >= 5


def test_cdf_backward_batch_heals_without_reemit(registered, tmp_path):
    """Direct reader-level exercise of the backward-batch heal: when
    the engine hands partitions() an end BELOW the committed start
    (lagging cursor seed), the source emits nothing, repairs its seed
    and cursor, and the NEXT batch resumes strictly after the floor —
    no version is ever planned twice."""
    import json as _json
    import os as _os

    from pyspark.sql.types import StructType

    from collective_als_spark.streaming.cdf_source import (
        SnapshotCdfStreamReader,
    )

    spark = registered
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["v"])
    for i in range(7):  # v1..v7
        t.append(
            spark.range(10 * i, 10 * i + 10)
            .select(F.col("id").alias("v"))
            .coalesce(1)
        )
    r = SnapshotCdfStreamReader(
        StructType(), {"path": root, "maxversionsperbatch": "2"}
    )
    # engine state: committed through v5; a stale seed produced end=3
    parts = r.partitions({"version": 5}, {"version": 3})
    assert [p.kind for p in parts] == ["noop"]
    # the heal raised the seed: next offset moves FORWARD, clamped
    assert r.latestOffset()["version"] == 7
    # committing the healed batch keeps the persisted cursor monotonic
    r.commit({"version": 3})
    cur = _json.load(
        open(_os.path.join(root, "_cursors", "default.json"))
    )
    assert cur["version"] == 5 and cur["floor"] == 5
    # the follow-up batch plans ONLY versions past the floor, even
    # though the engine's start offset regressed with the noop batch
    parts2 = r.partitions({"version": 3}, {"version": 7})
    assert {p.version for p in parts2} == {6, 7}
    assert all(p.kind == "insert" for p in parts2)
    # a crash here restarts a reader that still refuses to re-emit:
    # the floor was persisted with the heal
    r2 = SnapshotCdfStreamReader(
        StructType(), {"path": root, "maxversionsperbatch": "2"}
    )
    parts3 = r2.partitions({"version": 3}, {"version": 7})
    assert {p.version for p in parts3} == {6, 7}


def test_cdc_replication_source_to_target(registered, tmp_path):
    """Table-to-table CDC replication: the snapshot_cdf stream piped
    into streaming_sink(cdc_key=...) makes the target CONVERGE to the
    source after every drain — appends, MOR upserts (delete+insert
    pairs), and MOR deletes all replay correctly, across multiple
    stream runs sharing one checkpoint."""
    spark = registered
    src_root = str(tmp_path / "src")
    tgt_root = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    src = SnapshotTable(spark, src_root, stats_columns=["k"])
    tgt = SnapshotTable(spark, tgt_root, stats_columns=["k"])

    def replicate():
        stream = (
            spark.readStream.format("snapshot_cdf")
            .option("path", src_root)
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(
                tgt.streaming_sink(ckpt, cdc_key="k")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert not q.isActive

    def rows(t):
        return sorted((r["k"], r["tag"]) for r in t.read().collect())

    # run 1: two appends + an upsert + a delete, drained in one batch
    src.append(
        spark.createDataFrame(
            [(i, f"a{i}") for i in range(6)], "k long, tag string"
        ).coalesce(1)
    )
    src.append(
        spark.createDataFrame([(10, "b10"), (11, "b11")], "k long, tag string")
    )
    src.merge_mor(
        spark.createDataFrame([(3, "upd3"), (12, "new12")], "k long, tag string"),
        "k",
    )
    src.delete_where_mor("k", 10, 10)
    replicate()
    assert rows(tgt) == rows(src)

    # run 2: more changes against the SAME checkpoint — only the new
    # commits replay, and a second upsert of an already-replicated key
    # supersedes the copy in the target
    src.merge_mor(
        spark.createDataFrame([(3, "upd3b"), (11, "upd11")], "k long, tag string"),
        "k",
    )
    src.delete_where_mor("k", 0, 1)
    replicate()
    assert rows(tgt) == rows(src)
    assert dict(rows(tgt))[3] == "upd3b"

    # run 3: nothing new — the drain is a no-op, target unchanged
    v = tgt.current_version()
    replicate()
    assert tgt.current_version() == v


def test_cdf_max_bytes_per_batch(registered, tmp_path):
    """Byte-based admission: commits are admitted until their
    changed-file bytes exceed the budget, so mixed small/huge commits
    drain in bounded micro-batches — and an oversized SINGLE commit
    still progresses (at least one commit per batch)."""
    spark = registered
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["v"])
    # v1..v5: one BIG append (10k rows) then four tiny ones
    t.append(
        spark.range(0, 10000).select(F.col("id").alias("v")).coalesce(1)
    )
    for i in range(4):
        t.append(
            spark.range(20000 + i, 20001 + i)
            .select(F.col("id").alias("v"))
            .coalesce(1)
        )
    small = _file_sizes_smallest(root)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", root)
        # budget ~ a couple of tiny files: the big commit must ride
        # alone, and the tiny ones group a few per batch
        .option("maxBytesPerBatch", str(int(small * 2.5)))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    q.awaitTermination(60)
    assert spark.read.parquet(out).count() == 10004  # nothing lost
    versions = _offset_versions(ckpt)
    # the oversized v1 was admitted ALONE (progress guarantee), and
    # no batch jumped the whole backlog in one go
    assert versions[0] == 1, versions
    assert len(versions) >= 3, versions
    assert versions[-1] == 5


def _file_sizes_smallest(root: str) -> int:
    """Smallest data-file size in the table — the tiny-commit unit the
    byte-budget test prices its batches in."""
    import os

    sizes = []
    for dirpath, _dirs, names in os.walk(root):
        if "_snapshots" in dirpath or "_cursors" in dirpath:
            continue
        for n in names:
            if n.endswith(".parquet"):
                sizes.append(os.path.getsize(os.path.join(dirpath, n)))
    return min(sizes)


def test_cdc_replication_covers_cow_dml(registered, tmp_path):
    """Replication converges across the COW DML verbs too: on a
    change_data_feed source, update_where / replace_where / merge
    stream as exact writer change files and replay into the target as
    upserts/deletes through the same sink."""
    spark = registered
    src_root = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    src = SnapshotTable(
        spark, src_root, stats_columns=["k"], change_data_feed=True
    )
    tgt = SnapshotTable(spark, str(tmp_path / "tgt"), stats_columns=["k"])

    def replicate():
        q = (
            spark.readStream.format("snapshot_cdf")
            .option("path", src_root)
            .load()
            .writeStream.foreachBatch(tgt.streaming_sink(ckpt, cdc_key="k"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    def rows(t):
        return sorted((r["k"], r["w"]) for r in t.read().collect())

    src.append(
        spark.createDataFrame(
            [(i, i * 10) for i in range(10)], "k long, w long"
        ).coalesce(1)
    )
    src.update_where("k", 2, 4, set={"w": F.col("w") + 1})
    src.replace_where(
        "k", 6, 8, spark.createDataFrame([(7, 777)], "k long, w long")
    )
    src.merge(
        spark.createDataFrame([(0, -1), (50, 500)], "k long, w long"), "k"
    )
    replicate()
    assert rows(tgt) == rows(src)
    # second wave against the same checkpoint
    src.update_where("k", 7, 7, set={"w": F.lit(778).cast("long")})
    src.delete_where("k", 0, 1)
    replicate()
    assert rows(tgt) == rows(src)
    assert dict(rows(tgt))[7] == 778


def test_throttled_cdc_replication_converges(registered, tmp_path):
    """Composition: byte-throttled CDF admission + the cdc_key apply
    sink — a backlog drains in multiple bounded micro-batches and the
    target still converges exactly once."""
    spark = registered
    src_root = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    src = SnapshotTable(spark, src_root, stats_columns=["k"])
    tgt = SnapshotTable(spark, str(tmp_path / "tgt"), stats_columns=["k"])
    for i in range(5):
        src.append(
            spark.range(10 * i, 10 * i + 10)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
            .coalesce(1)
        )
    src.merge_mor(
        spark.createDataFrame([(3, -1), (44, -2)], "k long, w long"), "k"
    )
    small = _file_sizes_smallest(src_root)
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", src_root)
        .option("maxBytesPerBatch", str(int(small * 1.5)))
        .load()
        .writeStream.foreachBatch(tgt.streaming_sink(ckpt, cdc_key="k"))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    q.awaitTermination(60)
    rows = lambda t: sorted(  # noqa: E731
        (r["k"], r["w"]) for r in t.read().collect()
    )
    assert rows(tgt) == rows(src)
    assert dict(rows(tgt))[3] == -1
    versions = _offset_versions(ckpt)
    assert len(versions) >= 3  # the backlog took multiple micro-batches


def test_cdf_starting_timestamp(registered, tmp_path):
    """startingTimestamp (r09, Delta parity): the stream begins at the
    first commit at or after the instant; a between-commit instant
    anchors to the next commit; future instants error instead of
    silently streaming nothing."""
    import time

    spark = registered
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["k"])
    t.append(_docs(spark, 0, 10, "a").coalesce(1))
    time.sleep(0.05)
    mark = time.time()
    time.sleep(0.05)
    t.append(_docs(spark, 10, 30, "b").coalesce(1))
    t.append(_docs(spark, 30, 35, "c").coalesce(1))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", root)
        .option("startingTimestamp", str(mark))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # only v2 + v3 rows (25), none of v1's
    assert got.count() == 25
    assert sorted({r["_commit_version"] for r in got.collect()}) == [2, 3]
    # both anchors given: error
    with pytest.raises(Exception, match="not both"):
        (
            spark.readStream.format("snapshot_cdf")
            .option("path", root)
            .option("startingTimestamp", str(mark))
            .option("startingVersion", "2")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(300)
        )
    # a future instant errors (nothing to stream from it)
    with pytest.raises(Exception, match="after the newest commit"):
        (
            spark.readStream.format("snapshot_cdf")
            .option("path", root)
            .option("startingTimestamp", str(time.time() + 3600))
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt3"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(300)
        )
