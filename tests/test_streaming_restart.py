"""Checkpoint restart: a stopped streaming aggregation must resume its
state store, not recount — the exactly-once property that lets a 100 TB
ingest pipeline survive restarts."""

import glob
import shutil

from pyspark.sql import functions as F

from collective_als_spark.sources.testdata import load_table


def _dump_files(df, tmp_dir, target_dir, tag):
    """Write df as parquet and move its part-files into the stream
    input dir under unique names (the file-stream source picks up new
    FILES, so each drop simulates an arriving micro-batch)."""
    staging = f"{tmp_dir}/_stage_{tag}"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    for i, part in enumerate(sorted(glob.glob(f"{staging}/part-*.parquet"))):
        shutil.copy(part, f"{target_dir}/{tag}_{i}.parquet")


def test_streaming_checkpoint_restart_resumes_state(spark, sf_small, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, sf_small, "events").select("event_id", "user_id", "value")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    _dump_files(first, str(tmp_path), str(src), "a")

    schema = "event_id bigint, user_id bigint, value double"

    def run(query_name):
        stream = spark.readStream.schema(schema).parquet(str(src))
        agg = stream.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {(r.user_id, r.n, r.total) for r in spark.table(query_name).collect()}

    got_first = run("restart_run1")
    want_first = {
        (r.user_id, r.n, r.total)
        for r in first.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert got_first == want_first

    # new files arrive while the query is DOWN; the restart must resume
    # the checkpointed offsets+state and produce totals over ALL data
    # having read only the new files
    _dump_files(second, str(tmp_path), str(src), "b")
    got_all = run("restart_run2")
    want_all = {
        (r.user_id, r.n, r.total)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert got_all == want_all
    # and restarting again with NO new input must not double-count:
    # either nothing is emitted (no micro-batch ran — old files were
    # NOT re-read) or, if an empty batch triggers, the complete-mode
    # re-emission must still equal the true totals
    got_idem = run("restart_run3")
    assert got_idem in (set(), want_all)


def test_streaming_upserts_feed_incremental_view_end_to_end(spark, tmp_path):
    """The round-6 composition: a micro-batch upsert stream lands via
    merge-on-read deletion vectors (no candidate rewrite per batch),
    and an incremental materialized view follows the change feed —
    after every batch the view equals the defining query recomputed
    from scratch, and replayed batches change nothing."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.matview import IncrementalAggView

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    sink = t.streaming_sink(str(tmp_path / "ckpt"), merge_key="k")
    view = IncrementalAggView(
        spark, t, str(tmp_path / "mv"), group_by=["grp"],
        sums={"total": "val"},
    )
    batches = [
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        [(2, "a", 25), (4, "b", 40)],   # upsert k=2
        [(1, "b", 11), (5, "a", 50)],   # re-group k=1
    ]
    files_after_first = None
    for i, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, "k long, grp string, val long"), i)
        view.refresh()
        got = sorted(
            (r["grp"], r["total"], r["n_rows"]) for r in view.read().collect()
        )
        want = sorted(
            (r["grp"], r["total"], r["n_rows"])
            for r in view.recompute().collect()
        )
        assert got == want, f"batch {i}: {got} != {want}"
        if i == 0:
            files_after_first = set(t._manifest(t.current_version())["files"])
    # merge-on-read: batch 0's files never rewritten by later upserts
    assert files_after_first <= set(t._manifest(t.current_version())["files"])
    assert got == [("a", 75, 2), ("b", 81, 3)]
    # replay of the last batch: no table commit, refresh is a no-op
    v_t, v_mv = t.current_version(), view.table.current_version()
    sink(spark.createDataFrame([(9, "z", 9)], "k long, grp string, val long"), 2)
    view.refresh()
    assert (t.current_version(), view.table.current_version()) == (v_t, v_mv)


def test_streaming_quarantine_sink(spark, tmp_path):
    """expect_or_drop sink: passing rows land in the main table,
    failing rows (tagged with their violations) in the quarantine
    table; replays are no-ops on BOTH sides, and a crash between the
    two commits converges on replay without duplicating either."""
    import hashlib

    from collective_als_spark.sources.layout import SnapshotTable

    ckpt = str(tmp_path / "ckpt")
    main = SnapshotTable(spark, str(tmp_path / "main"), stats_columns=["k"])
    quar = SnapshotTable(spark, str(tmp_path / "quar"))
    checks = [
        {"kind": "not_null", "column": "k"},
        {"kind": "range", "column": "w", "lo": 0, "hi": 100},
    ]
    sink = main.streaming_sink(
        ckpt, expect_or_drop=checks, quarantine=quar
    )
    b0 = spark.createDataFrame(
        [(1, 10), (None, 5), (2, -1)], "k long, w long"
    )
    sink(b0, 0)
    assert sorted(r["k"] for r in main.read().collect()) == [1]
    bad = {
        (r["k"]): sorted(r["_violations"]) for r in quar.read().collect()
    }
    assert bad == {None: ["not_null_k"], 2: ["range_w"]}
    # full replay: neither table moves
    vm, vq = main.current_version(), quar.current_version()
    sink(b0, 0)
    assert (main.current_version(), quar.current_version()) == (vm, vq)
    # crash between the two commits: main landed batch 1, quarantine
    # didn't — the replay must catch the quarantine up WITHOUT
    # double-appending the main rows
    writer_id = hashlib.md5(ckpt.encode()).hexdigest()[:12]
    main.append(
        spark.createDataFrame([(3, 30)], "k long, w long"),
        _markers={writer_id: 1},
    )
    b1 = spark.createDataFrame([(3, 30), (4, 999)], "k long, w long")
    sink(b1, 1)
    assert sorted(r["k"] for r in main.read().collect()) == [1, 3]
    assert sorted(r["k"] for r in quar.read().collect() if r["k"]) == [2, 4]


def test_streaming_apply_changes_sink(spark, tmp_path):
    """apply_key sink: op/seq-shaped micro-batches (the Debezium feed
    shape) apply atomically per batch — upserts, deletes, within-batch
    sequence ordering — and replays are no-ops."""
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    sink = t.streaming_sink(
        str(tmp_path / "ckpt"), apply_key="k", seq_col="seq"
    )
    sink(
        spark.createDataFrame(
            [(1, "a", "I", 1), (2, "b", "I", 1)],
            "k long, tag string, _op string, seq long",
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            # k=1: update then delete (delete wins); k=3 insert
            [(1, "a2", "U", 1), (1, None, "D", 2), (3, "c", "I", 1)],
            "k long, tag string, _op string, seq long",
        ),
        1,
    )
    rows = lambda: sorted(  # noqa: E731
        (r["k"], r["tag"]) for r in t.read().collect()
    )
    assert rows() == [(2, "b"), (3, "c")]
    v = t.current_version()
    # replay of batch 1: nothing moves
    sink(
        spark.createDataFrame(
            [(9, "x", "I", 1)], "k long, tag string, _op string, seq long"
        ),
        1,
    )
    assert t.current_version() == v and rows() == [(2, "b"), (3, "c")]


def test_self_maintaining_sink(spark, tmp_path):
    """streaming_sink(maintain=...) folds micro-batch residue on the
    configured cadence without an external scheduler — and the
    maintenance commit is dataChange=false, so CDF consumers skip it."""
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    sink = t.streaming_sink(
        str(tmp_path / "ckpt"),
        merge_key="k",
        maintain={"target_rows_per_file": 1000, "min_files_to_fold": 4},
        maintain_every=5,
    )
    for i in range(5):
        sink(
            spark.createDataFrame([(i, i * 10)], "k long, w long"), i
        )
    m = t._manifest(t.current_version())
    # batches folded to one file by the 5th batch's maintenance pass
    assert len(m["files"]) == 1
    assert m.get("op") == "compact"
    assert t.read().count() == 5
    # replays still no-op (maintenance doesn't disturb the markers)
    v = t.current_version()
    sink(spark.createDataFrame([(9, 9)], "k long, w long"), 4)
    assert t.current_version() == v
