"""Deletion vectors: merge-on-read DELETE for the snapshot table
(sources/layout.py::SnapshotTable.delete_where_mor).

The storage-engine contract: a MOR delete commits ONLY metadata + a
position file (no data-file rewrite — manifest file list identical),
yet every read path (read, where-pruned read, time travel, merge
survivors, copy-on-write rewrites, the change feed) sees exactly the
rows a copy-on-write delete would produce. Compaction/overwrite
materialize DVs away; expire treats DV dirs like any other
referenced-or-orphaned file set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from collective_als_spark.sources.layout import SnapshotTable, _rel


def _manifest(t, version=None):
    v = t.current_version() if version is None else version
    return t._manifest(v)


def _three_band_table(spark, path, col="v"):
    t = SnapshotTable(spark, path, stats_columns=[col])
    for lo in (0, 1000, 2000):
        t.append(spark.range(lo, lo + 100).select(F.col("id").alias(col)).coalesce(1))
    return t


def test_mor_delete_masks_rows_without_rewriting_files(spark, tmp_path):
    t = _three_band_table(spark, str(tmp_path / "tbl"))
    before = set(_manifest(t)["files"])
    pre_version = t.current_version()
    v = t.delete_where_mor("v", 1000, 1049)
    assert v == pre_version + 1
    m = _manifest(t)
    # the commit is metadata-only: identical data file list
    assert set(m["files"]) == before
    # only the in-band file carries a DV (stats bounded the scan)
    assert len(m["dvs"]) == 1
    got = sorted(r["v"] for r in t.read().collect())
    assert got == list(range(0, 100)) + list(range(1050, 1100)) + list(
        range(2000, 2100)
    )
    # time travel pre-delete intact
    assert t.read(pre_version).count() == 300
    # where-pruned read applies the DV too
    banded = sorted(
        r["v"] for r in t.read(where=("v", 1000, 1099)).collect()
    )
    assert banded == list(range(1050, 1100))
    # band hitting nothing: no-op, no new version
    assert t.delete_where_mor("v", 50000, 60000) == v
    # band overlapping stats but matching no live rows: no-op too
    assert t.delete_where_mor("v", 1000, 1049) == v


def test_mor_equals_cow_delete(spark, tmp_path):
    a = _three_band_table(spark, str(tmp_path / "cow"))
    b = _three_band_table(spark, str(tmp_path / "mor"))
    a.delete_where("v", 950, 2050)
    b.delete_where_mor("v", 950, 2050)
    assert sorted(r["v"] for r in a.read().collect()) == sorted(
        r["v"] for r in b.read().collect()
    )


def test_mor_deletes_stack_and_consolidate(spark, tmp_path):
    t = _three_band_table(spark, str(tmp_path / "tbl"))
    t.delete_where_mor("v", 1000, 1019)
    v2_dv = _manifest(t)["dvs"]
    t.delete_where_mor("v", 1010, 1039)  # overlaps the first delete
    m = _manifest(t)
    # still one DV pointer per file, now consolidated into a new dir
    assert len(m["dvs"]) == 1
    assert list(m["dvs"].values()) != list(v2_dv.values())
    got = sorted(r["v"] for r in t.read().collect())
    assert got == list(range(0, 100)) + list(range(1040, 1100)) + list(
        range(2000, 2100)
    )
    # the intermediate version still reads through ITS dv only
    assert t.read(version=4).count() == 280
    assert t.read(version=5).count() == 260


def test_compact_materializes_dvs(spark, tmp_path):
    t = _three_band_table(spark, str(tmp_path / "tbl"))
    t.delete_where_mor("v", 0, 49)
    t.compact(target_rows_per_file=1000)
    m = _manifest(t)
    assert "dvs" not in m
    assert sorted(r["v"] for r in t.read().collect()) == list(
        range(50, 100)
    ) + list(range(1000, 1100)) + list(range(2000, 2100))


def test_cow_rewrites_respect_and_drop_dvs(spark, tmp_path):
    """A copy-on-write delete over a DV'd file must not resurrect the
    masked rows, and the rewritten file sheds its DV pointer."""
    t = _three_band_table(spark, str(tmp_path / "tbl"))
    t.delete_where_mor("v", 1000, 1009)
    t.delete_where("v", 1050, 1059)  # COW rewrite of the same file
    m = _manifest(t)
    assert m.get("dvs", {}) == {}
    got = sorted(r["v"] for r in t.read().collect())
    assert got == list(range(0, 100)) + list(range(1010, 1050)) + list(
        range(1060, 1100)
    ) + list(range(2000, 2100))


def test_merge_survivors_respect_dvs(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    t.append(
        spark.range(0, 10)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("val"))
        .coalesce(1)
    )
    t.delete_where_mor("k", 3, 4)
    # merge updates k=5 — the rewrite must not resurrect k=3,4
    t.merge(spark.createDataFrame([(5, -1)], "k long, val long"), "k")
    rows = {r["k"]: r["val"] for r in t.read().collect()}
    assert 3 not in rows and 4 not in rows
    assert rows[5] == -1 and rows[2] == 4 and len(rows) == 8
    assert _manifest(t).get("dvs", {}) == {}  # materialized by the rewrite


def test_changes_cdf_sees_mor_deletes(spark, tmp_path):
    t = _three_band_table(spark, str(tmp_path / "tbl"))
    v3 = t.current_version()
    t.delete_where_mor("v", 1000, 1004)
    ch = t.changes(v3).collect()
    assert sorted(r["v"] for r in ch) == [1000, 1001, 1002, 1003, 1004]
    assert {r["_change_type"] for r in ch} == {"delete"}
    # over a window containing append + its mor-delete, the rows net out
    ch_all = t.changes(0)
    assert ch_all.filter(F.col("_change_type") == "delete").count() == 0
    assert ch_all.count() == 295


def test_restore_and_expire_with_dvs(spark, tmp_path):
    t = _three_band_table(spark, str(tmp_path / "tbl"))
    t.delete_where_mor("v", 0, 9)  # v4
    t.delete_where_mor("v", 10, 19)  # v5 (consolidates v4's dv)
    v4_dirs = set(_manifest(t, 4)["dvs"].values())
    t.restore(4)  # v6 points back at v4's dv
    assert set(_manifest(t)["dvs"].values()) == v4_dirs
    assert t.read().count() == 290
    # expire to the restored version only: v4's dv dir is still
    # referenced and must survive; v5's consolidated dir is orphaned
    deleted = t.expire(keep_last=1)
    assert deleted > 0
    assert t.read().count() == 290
    assert sorted(r["v"] for r in t.read(where=("v", 0, 99)).collect()) == list(
        range(10, 100)
    )


def test_concurrent_disjoint_mor_deletes_both_commit(spark, tmp_path):
    """Two racing MOR deletes over DISJOINT bands (different files):
    the CAS loser re-splits against the fresh manifest, finds its
    candidate set and their DV pointers untouched by the winner, and
    commits — both masks land, versions strictly sequential."""
    import threading

    t = _three_band_table(spark, str(tmp_path / "tbl"))
    barrier = threading.Barrier(2)
    errs = []

    def deleter(lo):
        try:
            barrier.wait()
            t.delete_where_mor("v", lo, lo + 9)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=deleter, args=(lo,)) for lo in (0, 2000)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert t.current_version() == 5
    assert sorted(r["v"] for r in t.read().collect()) == list(
        range(10, 100)
    ) + list(range(1000, 1100)) + list(range(2010, 2100))
    assert len(_manifest(t)["dvs"]) == 2


def test_mor_delete_on_file_uri_root(spark, tmp_path):
    """DV staging (Spark write), masking reads, and expire's DV-dir
    collection all work through the Hadoop IO path a URI-scheme table
    uses — where 100 TB actually lives."""
    from collective_als_spark.sources.logstore import HadoopLogStore

    t = SnapshotTable(
        spark, "file:" + str(tmp_path / "htbl"), stats_columns=["v"]
    )
    assert isinstance(t.log, HadoopLogStore)
    t.append(spark.range(100).select(F.col("id").alias("v")))
    t.delete_where_mor("v", 10, 19)
    assert t.read().count() == 90
    t.compact(target_rows_per_file=1000)
    deleted = t.expire(keep_last=1)
    assert deleted > 0  # pre-compaction data files AND the dv dir
    assert t.read().count() == 90


def test_concurrent_mor_and_cow_conflict_detected(spark, tmp_path):
    """A MOR delete computed against a manifest whose candidate set a
    concurrent COW rewrite then changed must surface a conflict, not
    silently mis-apply positions to rewritten files."""
    from collective_als_spark.sources.logstore import CommitConflict

    t = _three_band_table(spark, str(tmp_path / "tbl"))
    manifest = _manifest(t)
    candidates, _ = t._split_by_band(manifest, "v", 1000, 1049)
    # simulate: another writer COW-rewrites the band before our commit
    t.delete_where("v", 1040, 1049)
    matched = (
        t._scan_live(manifest, candidates, keep_pos=True)
        .filter(F.col("v").between(1000, 1049))
        .select(F.col("__dv_rel").alias("file"), F.col("__dv_pos").alias("pos"))
    )
    dv_dir = t._write_dv(matched)
    affected = {_rel(f) for f in candidates}

    def build(version, prev):
        cands, _ = t._split_by_band(prev, "v", 1000, 1049)
        if set(cands) != set(candidates):
            raise CommitConflict("candidate set changed")
        return prev

    with pytest.raises(CommitConflict):
        t._commit(build)
    assert dv_dir  # staged dv is an orphan; expire collects it
    before = t.read().count()
    t.expire(keep_last=1)
    assert t.read().count() == before


# ---------------------------------------------------------------------------
# merge-on-read MERGE + DV scale guards (r05 verdict #3/#4)
# ---------------------------------------------------------------------------


def test_merge_mor_equals_cow_merge(spark, tmp_path):
    """merge_mor is result-equivalent to the copy-on-write merge:
    matched rows replaced, unmatched inserted — including over an
    existing deletion vector and with schema auto-evolution."""
    a = _three_band_table(spark, str(tmp_path / "cow"))
    b = _three_band_table(spark, str(tmp_path / "mor"))
    for t in (a, b):
        t.delete_where_mor("v", 10, 19)  # pre-existing DV participates
    src = spark.createDataFrame(
        [(15, "resurrected"), (1005, "updated"), (9999, "inserted")],
        "v long, tag string",
    )
    a.merge(src, "v")
    b.merge_mor(src, "v")
    rows = lambda t: sorted(  # noqa: E731
        (r["v"], r["tag"]) for r in t.read().collect()
    )
    assert rows(a) == rows(b)
    assert (15, "resurrected") in rows(b)  # key matching a DV-masked row inserts
    assert (1005, "updated") in rows(b)
    # and a second upsert on the SAME key through merge_mor wins
    b.merge_mor(spark.createDataFrame([(1005, "updated2")], "v long, tag string"), "v")
    got = dict(rows(b))
    assert got[1005] == "updated2"
    assert a.read().count() == b.read().count() == 292


def test_merge_mor_never_rewrites_candidate_files(spark, tmp_path):
    """The MOR merge commit is append + metadata: every pre-existing
    data file is still in the manifest, batch after batch."""
    t = _three_band_table(spark, str(tmp_path / "tbl"))
    files_before = set(_manifest(t)["files"])
    for i in range(3):
        t.merge_mor(
            spark.createDataFrame([(1005 + i, i)], "v long, val long"), "v"
        )
        m = _manifest(t)
        assert files_before <= set(m["files"])  # nothing rewritten, ever
        files_before = set(m["files"])
    # matched row is masked exactly once per upsert; DV width tracked
    m = _manifest(t)
    assert sum(m.get("dv_rows", {}).values()) >= 1
    # compact materializes DVs and the small appended files away
    t.compact(target_rows_per_file=1000)
    m = _manifest(t)
    assert m.get("dvs", {}) == {}
    assert t.read().count() == 300  # three in-place updates, no inserts


def test_streaming_merge_sink_is_merge_on_read(spark, tmp_path):
    """The streaming upsert path must not rewrite candidate data files
    per micro-batch (write amplification at commit frequency)."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    sink = t.streaming_sink(str(tmp_path / "ckpt"), merge_key="k")
    sink(spark.createDataFrame([(1, 10), (2, 20)], "k long, val long"), 0)
    base_files = set(_manifest(t)["files"])
    sink(spark.createDataFrame([(2, 99), (3, 30)], "k long, val long"), 1)
    sink(spark.createDataFrame([(3, 31), (4, 40)], "k long, val long"), 2)
    m = _manifest(t)
    assert base_files <= set(m["files"])  # batch 0's files never rewritten
    assert {r["k"]: r["val"] for r in t.read().collect()} == {
        1: 10, 2: 99, 3: 31, 4: 40,
    }
    # replay still a no-op
    v = t.current_version()
    sink(spark.createDataFrame([(4, -4)], "k long, val long"), 2)
    assert t.current_version() == v


def test_wide_mor_delete_falls_back_to_cow(spark, tmp_path):
    """Past mor_fallback_max_rows matched rows, delete_where_mor
    rewrites (copy-on-write) instead of building a giant DV."""
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), stats_columns=["v"],
        mor_fallback_max_rows=10,
    )
    t.append(spark.range(0, 100).select(F.col("id").alias("v")).coalesce(1))
    v = t.delete_where_mor("v", 0, 49)  # 50 matched > 10 → COW
    m = _manifest(t)
    assert "dvs" not in m  # no deletion vector: the file was rewritten
    assert t.read().count() == 50
    # narrow delete under the threshold still uses a DV
    t.delete_where_mor("v", 50, 52)
    m = _manifest(t)
    assert len(m.get("dvs", {})) == 1
    assert m["dv_rows"] == {next(iter(m["dvs"])): 3}
    assert t.read().count() == 47


def test_wide_mor_merge_falls_back_to_cow(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), stats_columns=["v"],
        mor_fallback_max_rows=5,
    )
    t.append(spark.range(0, 100).select(F.col("id").alias("v")).coalesce(1))
    files_before = set(_manifest(t)["files"])
    src = spark.range(0, 50).select(F.col("id").alias("v"), F.lit(1).alias("x"))
    t.merge_mor(src, "v")  # 50 matched > 5 → routed to COW merge
    m = _manifest(t)
    assert "dvs" not in m
    assert not (files_before & set(m["files"]))  # candidate was rewritten
    assert t.read().count() == 100


def test_dv_broadcast_guard_switches_join_strategy(spark, tmp_path):
    """Under the threshold the DV anti-join is broadcast; over it the
    plan must NOT broadcast the position list (an executor-OOM at real
    DV widths)."""
    small = SnapshotTable(spark, str(tmp_path / "s"), stats_columns=["v"])
    small.append(spark.range(0, 100).select(F.col("id").alias("v")).coalesce(1))
    small.delete_where_mor("v", 0, 9)
    plan_small = small.read()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small

    wide = SnapshotTable(
        spark, str(tmp_path / "w"), stats_columns=["v"],
        dv_broadcast_max_rows=5, mor_fallback_max_rows=10_000,
    )
    wide.append(spark.range(0, 100).select(F.col("id").alias("v")).coalesce(1))
    wide.delete_where_mor("v", 0, 49)  # 50 positions > 5 → shuffle join
    df = wide.read()
    plan_wide = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_wide
    assert df.count() == 50  # strategy change, identical result


def test_concurrent_disjoint_mor_merges_both_commit(spark, tmp_path):
    """Two racing merge_mor upserts over DISJOINT key bands: the CAS
    loser re-plans against the fresh manifest (its candidate files and
    their DV pointers untouched by the winner) and commits — both
    upserts land, no lost update, files strictly append-only."""
    import threading

    t = _three_band_table(spark, str(tmp_path / "tbl"))
    files_before = set(_manifest(t)["files"])
    barrier = threading.Barrier(2)
    errs = []

    def merger(key):
        try:
            barrier.wait()
            t.merge_mor(
                spark.createDataFrame([(key, "upd")], "v long, tag string"),
                "v",
            )
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [
        threading.Thread(target=merger, args=(k,)) for k in (50, 2050)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert t.current_version() == 5
    got = {r["v"]: r["tag"] for r in t.read().collect()}
    assert len(got) == 300  # both were updates: count invariant
    assert got[50] == "upd" and got[2050] == "upd"
    assert got[51] is None
    assert files_before <= set(_manifest(t)["files"])  # append-only


def test_delete_where_keeps_null_rows(spark, tmp_path):
    """NULL BETWEEN lo AND hi is NULL (not matched) under SQL
    three-valued logic, so a band DELETE must KEEP NULL-valued rows —
    on the COW path, the MOR path, and in the change feed. Guards the
    r07 regression where the COW survivor filter ~between() silently
    dropped NULL rows from the rewrite."""
    rows = [(i, f"k{i}") for i in range(10)] + [(None, "n1"), (None, "n2")]
    df = spark.createDataFrame(rows, "v long, tag string").coalesce(1)

    cow = SnapshotTable(
        spark, str(tmp_path / "cow"), stats_columns=["v"],
        change_data_feed=True,
    )
    cow.append(df)
    v = cow.delete_where("v", 3, 5)
    got = cow.read()
    # NULL rows survive the rewrite
    assert sorted(
        r["tag"] for r in got.filter(F.col("v").isNull()).collect()
    ) == ["n1", "n2"]
    assert sorted(
        r["v"] for r in got.filter(F.col("v").isNotNull()).collect()
    ) == [0, 1, 2, 6, 7, 8, 9]

    # the change feed reports EXACTLY the deleted rows — feed == table
    # delta, NULL rows in neither
    ch = cow.changes(v - 1, v).collect()
    assert {r["_change_type"] for r in ch} == {"delete"}
    assert sorted(r["v"] for r in ch) == [3, 4, 5]

    # MOR agrees with COW row-for-row
    mor = SnapshotTable(spark, str(tmp_path / "mor"), stats_columns=["v"])
    mor.append(df)
    mor.delete_where_mor("v", 3, 5)
    key = lambda r: (r["v"] if r["v"] is not None else -1, r["tag"])
    assert sorted(map(key, mor.read().collect())) == sorted(
        map(key, got.collect())
    )


def _merge_optimized_plans(spark, monkeypatch, table, source, key):
    """Run table.merge/merge_mor capturing the optimized logical plan
    of every DataFrame the commit materializes (stage writes and
    localCheckpoints) — the only places the key-tuple join can hide."""
    _DF = type(spark.range(1))  # the concrete (classic) DataFrame class

    plans = []
    orig_stage = table._stage

    def stage_spy(df, **kwargs):
        plans.append(df._jdf.queryExecution().optimizedPlan().toString())
        return orig_stage(df, **kwargs)

    monkeypatch.setattr(table, "_stage", stage_spy)
    orig_ckpt = _DF.localCheckpoint

    def ckpt_spy(self, eager=True):
        plans.append(self._jdf.queryExecution().optimizedPlan().toString())
        return orig_ckpt(self, eager=eager)

    monkeypatch.setattr(_DF, "localCheckpoint", ckpt_spy)
    return plans


def test_merge_broadcast_guard_cow_and_mor(spark, tmp_path, monkeypatch):
    """Both merge paths hint broadcast on the source key tuples only
    while nd <= merge_broadcast_max_keys; past the guard neither path
    may force a broadcast (a backfill key set OOMs the executors).
    auto-broadcast is disabled so the assertion sees exactly the
    hint's effect, and results must be identical either side."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        base = spark.range(0, 200).select(F.col("id").alias("v"))
        src = spark.range(100, 300).select(
            F.col("id").alias("v"), (F.col("id") * 2).alias("x")
        )
        results = {}
        for name, cap in (("hinted", 4_000_000), ("guarded", 5)):
            for path, meth in (("cow", "merge"), ("mor", "merge_mor")):
                t = SnapshotTable(
                    spark, str(tmp_path / f"{name}_{path}"),
                    stats_columns=["v"], merge_broadcast_max_keys=cap,
                )
                t.append(base.coalesce(1))
                plans = _merge_optimized_plans(spark, monkeypatch, t, src, "v")
                getattr(t, meth)(src, "v")
                monkeypatch.undo()
                joined = "\n".join(plans)
                if name == "hinted":  # nd=200 <= cap → hint applied
                    assert "strategy=broadcast" in joined, (name, path)
                else:  # nd=200 > cap → NO forced broadcast anywhere
                    assert "strategy=broadcast" not in joined, (name, path)
                results[(name, path)] = sorted(
                    (r["v"], r["x"]) for r in t.read().collect()
                )
        expect = [(v, None) for v in range(0, 100)] + [
            (v, 2 * v) for v in range(100, 300)
        ]
        for k, got in results.items():
            assert got == expect, k
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_merge_mor_prejoin_fallback_skips_semijoin(spark, tmp_path):
    """nd > mor_fallback_max_rows routes merge_mor to COW BEFORE the
    matched semi-join runs: the positional candidate scan
    (keep_pos=True) must never execute — the fallback no longer pays
    the broadcast join + checkpoint it is falling back from."""
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), stats_columns=["v"],
        mor_fallback_max_rows=5,
    )
    t.append(spark.range(0, 100).select(F.col("id").alias("v")).coalesce(1))
    pos_scans = []
    orig = t._scan_live

    def spy(manifest, files, keep_pos=False):
        if keep_pos:
            pos_scans.append(files)
        return orig(manifest, files, keep_pos=keep_pos)

    t._scan_live = spy
    src = spark.range(0, 50).select(F.col("id").alias("v"), F.lit(1).alias("x"))
    t.merge_mor(src, "v")  # nd=50 > 5 → COW decided pre-join
    assert pos_scans == []  # the MOR semi-join never planned a scan
    m = _manifest(t)
    assert "dvs" not in m
    assert t.read().count() == 100


def test_merge_mor_insert_heavy_source_stays_mor(spark, tmp_path):
    """nd alone must not force COW: a mostly-new-keys upsert whose nd
    exceeds mor_fallback_max_rows but whose MEASURED matched count is
    tiny keeps the merge-on-read path — a small DV plus appended
    files, no candidate rewrite (the r08 review's insert-heavy CDC
    regression)."""
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), stats_columns=["v"],
        mor_fallback_max_rows=5,
    )
    t.append(spark.range(0, 100).select(F.col("id").alias("v")).coalesce(1))
    files_before = set(_manifest(t)["files"])
    # 3 existing keys + 50 brand-new keys: nd = 53 > 5, matched = 3
    src = (
        spark.range(0, 3).union(spark.range(1000, 1050))
        .select(F.col("id").alias("v"), F.lit(1).alias("x"))
    )
    t.merge_mor(src, "v")
    m = _manifest(t)
    assert len(m.get("dvs", {})) == 1  # MOR, not COW
    assert m["dv_rows"] == {next(iter(m["dvs"])): 3}
    assert files_before <= set(m["files"])  # candidate NOT rewritten
    assert t.read().count() == 150
    got = {r["v"]: r["x"] for r in t.read().filter(F.col("v") < 5).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: None, 4: None}


# ---------------------------------------------------------------------------
# apply_changes: CDC upserts + deletes in one commit
# ---------------------------------------------------------------------------


def _cdc_table(spark, path):
    t = SnapshotTable(spark, path, stats_columns=["v"])
    t.append(
        spark.createDataFrame(
            [(i, f"base{i}") for i in range(10)], "v long, tag string"
        ).coalesce(1)
    )
    return t


def test_apply_changes_mixed_batch_is_one_commit(spark, tmp_path):
    """Upserts and deletes from a single CDC batch land atomically:
    one new version, MOR commit never rewrites candidate files, and
    the COW path produces identical rows."""
    a = _cdc_table(spark, str(tmp_path / "mor"))
    b = _cdc_table(spark, str(tmp_path / "cow"))
    batch = spark.createDataFrame(
        [
            (3, "updated3", "U"),
            (42, "inserted42", "I"),
            (7, None, "D"),
            (999, None, "D"),  # absent key: delete is a no-op
        ],
        "v long, tag string, _op string",
    )
    files_before = set(_manifest(a)["files"])
    pre = a.current_version()
    assert a.apply_changes(batch, "v") == pre + 1  # ONE commit
    assert files_before <= set(_manifest(a)["files"])  # MOR: no rewrite
    b.apply_changes(batch, "v", mor=False)
    want = sorted(
        [(i, f"base{i}") for i in range(10) if i not in (3, 7)]
        + [(3, "updated3"), (42, "inserted42")]
    )
    rows = lambda t: sorted(  # noqa: E731
        (r["v"], r["tag"]) for r in t.read().collect()
    )
    assert rows(a) == want
    assert rows(b) == want
    # the op column never leaks into the table schema
    assert set(a.read().columns) == {"v", "tag"}


def test_apply_changes_sequence_orders_within_batch(spark, tmp_path):
    """seq_col resolves out-of-order capture per key: only the
    greatest-sequence change applies — a late delete wins over an
    earlier upsert and vice versa."""
    t = _cdc_table(spark, str(tmp_path / "tbl"))
    batch = spark.createDataFrame(
        [
            # key 1: insert@1, update@2, delete@3 -> deleted
            (1, "first", "U", 1),
            (1, "second", "U", 2),
            (1, None, "D", 3),
            # key 2: delete@1 then update@2 -> updated (delete discarded)
            (2, None, "D", 1),
            (2, "revived2", "U", 2),
            # key 50: lone insert
            (50, "new50", "I", 1),
        ],
        "v long, tag string, _op string, seq long",
    )
    t.apply_changes(batch, "v", seq_col="seq")
    got = dict((r["v"], r["tag"]) for r in t.read().collect())
    assert 1 not in got
    assert got[2] == "revived2"
    assert got[50] == "new50"
    assert len(got) == 10  # 10 base - 1 del + 1 ins


def test_apply_changes_rejects_ambiguous_batches(spark, tmp_path):
    t = _cdc_table(spark, str(tmp_path / "tbl"))
    # tie on the winning sequence: applying either row is a coin flip
    tie = spark.createDataFrame(
        [(1, "a", "U", 5), (1, "b", "U", 5)],
        "v long, tag string, _op string, seq long",
    )
    with pytest.raises(ValueError, match="tie"):
        t.apply_changes(tie, "v", seq_col="seq")
    # duplicate keys without a sequence column: order undefined
    dup = spark.createDataFrame(
        [(1, "a", "U"), (1, None, "D")], "v long, tag string, _op string"
    )
    with pytest.raises(ValueError, match="duplicate"):
        t.apply_changes(dup, "v")
    # NULL op: neither delete nor upsert
    nullop = spark.createDataFrame(
        [(1, "a", None)], "v long, tag string, _op string"
    )
    with pytest.raises(ValueError, match="NULL '_op'"):
        t.apply_changes(nullop, "v")
    # NULL key
    nullkey = spark.createDataFrame(
        [(None, "a", "U")], "v long, tag string, _op string"
    )
    with pytest.raises(ValueError, match="NULL key"):
        t.apply_changes(nullkey, "v")
    # nothing committed by any of the rejects
    assert t.current_version() == 1


def test_apply_changes_delete_only_batch_is_metadata_sized(spark, tmp_path):
    """A delete-only batch through the MOR path is DV + manifest work:
    candidate data files are untouched and no live data is rewritten."""
    t = _cdc_table(spark, str(tmp_path / "tbl"))
    files_before = set(_manifest(t)["files"])
    batch = spark.createDataFrame(
        [(0, None, "D"), (1, None, "D")], "v long, tag string, _op string"
    )
    t.apply_changes(batch, "v")
    m = _manifest(t)
    assert files_before <= set(m["files"])
    assert sum(m.get("dv_rows", {}).values()) == 2
    assert t.read().count() == 8
    assert sorted(r["v"] for r in t.read().collect()) == list(range(2, 10))


def test_apply_changes_cdf_records_exact_changes(spark, tmp_path):
    """COW apply_changes on a change_data_feed table writes exact
    change rows: a deleted key appears as a pre-image-only delete, an
    updated key as a delete+insert pair, an insert as insert-only."""
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), stats_columns=["v"], change_data_feed=True
    )
    t.append(
        spark.createDataFrame(
            [(i, f"base{i}") for i in range(5)], "v long, tag string"
        ).coalesce(1)
    )
    batch = spark.createDataFrame(
        [(2, "updated2", "U"), (4, None, "D"), (77, "new77", "I")],
        "v long, tag string, _op string",
    )
    v = t.apply_changes(batch, "v", mor=False)
    ch = {
        (r["v"], r["_change_type"]): r["tag"]
        for r in t.changes(v - 1, v).collect()
    }
    assert ch[(2, "delete")] == "base2" and ch[(2, "insert")] == "updated2"
    assert ch[(4, "delete")] == "base4" and (4, "insert") not in ch
    assert ch[(77, "insert")] == "new77" and (77, "delete") not in ch
    assert len(ch) == 4


def test_apply_changes_into_empty_table(spark, tmp_path):
    """Changes into an empty table: upserts insert, deletes are
    no-op rows; the op/seq columns stay out of the table schema."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    batch = spark.createDataFrame(
        [(1, "a", "I", 1), (2, None, "D", 1)],
        "v long, tag string, _op string, seq long",
    )
    t.apply_changes(batch, "v", seq_col="seq")
    assert [(r["v"], r["tag"]) for r in t.read().collect()] == [(1, "a")]
    assert set(t.read().columns) == {"v", "tag"}


# ---------------------------------------------------------------------------
# update_where: copy-on-write UPDATE
# ---------------------------------------------------------------------------


def test_update_where_band_pruned_rewrite(spark, tmp_path):
    """UPDATE rewrites only candidate files: out-of-band files carry
    over by path, matched rows get the SET applied (SQL-expression
    strings over the row work), NULL rows never match, and the count
    is invariant."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 100)
            .select(
                F.col("id").alias("v"),
                (F.col("id") * 2).alias("w"),
            )
            .coalesce(1)
        )
    t.append(
        spark.createDataFrame([(None, -1)], "v long, w long").coalesce(1)
    )
    before = set(_manifest(t)["files"])
    pre = t.current_version()
    v = t.update_where("v", 1000, 1049, set={"w": "w + v"})
    assert v == pre + 1
    m = _manifest(t)
    # only the in-band file (and the NULL-row file, whose stats are
    # all-NULL and thus unpruneable-but-skipped... it has no interval)
    carried = before & set(m["files"])
    assert len(before - set(m["files"])) <= 2  # at most band+NULL files
    assert len(carried) >= 2  # the two out-of-band files never rewritten
    got = {r["v"]: r["w"] for r in t.read().collect() if r["v"] is not None}
    for k in range(1000, 1050):
        assert got[k] == 2 * k + k  # updated
    for k in list(range(0, 100)) + list(range(1050, 1100)) + list(
        range(2000, 2100)
    ):
        assert got[k] == 2 * k  # untouched
    # NULL row carried unchanged, not updated, not dropped
    nulls = [r["w"] for r in t.read().collect() if r["v"] is None]
    assert nulls == [-1]
    assert t.read().count() == 301
    # time travel pre-update intact
    assert t.read(pre).filter("v = 1000").first()["w"] == 2000


def test_update_where_rejects_bad_set(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    t.append(
        spark.range(0, 10)
        .select(F.col("id").alias("v"), F.lit("x").alias("tag"))
        .coalesce(1)
    )
    with pytest.raises(ValueError, match="not in the table"):
        t.update_where("v", 0, 5, set={"nope": F.lit(1)})
    with pytest.raises(ValueError, match="type"):
        t.update_where("v", 0, 5, set={"tag": F.lit(7)})
    # out-of-band update: no-op, no commit
    assert t.update_where("v", 500, 600, set={"tag": F.lit("y")}) == 1
    assert t.current_version() == 1


def test_update_where_cdf_pre_post_images(spark, tmp_path):
    """On a change_data_feed table the update commit records exact
    pre/post images: matched rows only, as delete+insert pairs."""
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), stats_columns=["v"],
        change_data_feed=True,
    )
    t.append(
        spark.range(0, 10)
        .select(F.col("id").alias("v"), (F.col("id") * 10).alias("w"))
        .coalesce(1)
    )
    v = t.update_where("v", 3, 4, set={"w": F.col("w") + 1})
    ch = sorted(
        (r["v"], r["_change_type"], r["w"])
        for r in t.changes(v - 1, v).collect()
    )
    assert ch == [
        (3, "delete", 30),
        (3, "insert", 31),
        (4, "delete", 40),
        (4, "insert", 41),
    ]


def test_update_where_streams_like_other_cow_rewrites(spark, tmp_path):
    """The CDF stream refuses an op=update commit on a table without
    change files (carried rows are indistinguishable from changes) and
    skips it under skipChangeCommits — the COW merge/delete rule."""
    from collective_als_spark.streaming.cdf_source import (
        register_snapshot_cdf,
    )

    register_snapshot_cdf(spark)
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root, stats_columns=["v"])
    t.append(
        spark.range(0, 10)
        .select(F.col("id").alias("v"), F.lit(0).alias("w"))
        .coalesce(1)
    )
    t.update_where("v", 0, 4, set={"w": F.lit(1)})

    def drain(opts):
        reader = spark.readStream.format("snapshot_cdf").option("path", root)
        for k, val in opts.items():
            reader = reader.option(k, val)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    with pytest.raises(Exception, match="copy-on-write update"):
        try:
            drain({})
        except Exception as e:  # unwrap StreamingQueryException
            raise RuntimeError(str(e)) from e
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
    shutil.rmtree(str(tmp_path / "out"), ignore_errors=True)
    drain({"skipChangeCommits": "true"})
    # only the append's rows streamed; the update commit was skipped
    assert spark.read.parquet(str(tmp_path / "out")).count() == 10


def test_apply_changes_randomized_against_model(spark, tmp_path):
    """Seeded randomized CDC batches vs a dict reference model: after
    every batch the MOR and COW tables both equal the model exactly —
    upsert/delete interleavings, re-inserts after deletes, absent-key
    deletes, and sequence shuffling within each batch."""
    import random

    rng = random.Random(8)
    mor = SnapshotTable(spark, str(tmp_path / "mor"), stats_columns=["k"])
    cow = SnapshotTable(spark, str(tmp_path / "cow"), stats_columns=["k"])
    model: dict[int, int] = {}
    base = [(k, k * 10) for k in range(30)]
    for t in (mor, cow):
        t.append(spark.createDataFrame(base, "k long, w long").coalesce(2))
    model.update(dict(base))

    for batch_no in range(4):
        keys = rng.sample(range(50), rng.randint(5, 15))
        rows = []
        for k in keys:
            n_changes = rng.randint(1, 3)
            for seq in range(1, n_changes + 1):
                if rng.random() < 0.35:
                    rows.append((k, None, "D", seq))
                else:
                    rows.append((k, k * 100 + batch_no * 10 + seq, "U", seq))
            # the model applies only the greatest-sequence change
            last = rows[-1]
            if last[2] == "D":
                model.pop(k, None)
            else:
                model[k] = last[1]
        rng.shuffle(rows)  # out-of-order capture
        batch = spark.createDataFrame(
            rows, "k long, w long, _op string, seq long"
        )
        mor.apply_changes(batch, "k", seq_col="seq")
        cow.apply_changes(batch, "k", seq_col="seq", mor=False)
        for t in (mor, cow):
            got = {r["k"]: r["w"] for r in t.read().collect()}
            assert got == model, f"batch {batch_no}: {t.root}"


def test_concurrent_disjoint_apply_changes_both_commit(spark, tmp_path):
    """Two racing apply_changes batches over DISJOINT key bands (one
    upsert+insert, one delete): the CAS loser re-plans and commits —
    both CDC batches land exactly once."""
    import threading

    t = _three_band_table(spark, str(tmp_path / "tbl"))
    barrier = threading.Barrier(2)
    errs = []

    def applier(rows):
        try:
            barrier.wait()
            t.apply_changes(
                spark.createDataFrame(rows, "v long, tag string, _op string"),
                "v",
            )
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    # keys chosen so even the staged files' [min,max] bands stay
    # disjoint across the two batches — an insert that widened batch
    # A's band over batch B's keys would (correctly) CommitConflict
    a = [(50, "upd50", "U"), (150, "new", "I")]
    b = [(2050, None, "D")]
    threads = [threading.Thread(target=applier, args=(r,)) for r in (a, b)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert t.current_version() == 5
    got = {r["v"]: r["tag"] for r in t.read().collect()}
    assert got[50] == "upd50" and got[150] == "new"
    assert 2050 not in got
    assert len(got) == 300  # 300 base + 1 insert - 1 delete


def test_apply_changes_schema_evolution(spark, tmp_path):
    """A CDC batch that ADDS a column widens the table (additive
    evolution, the merge rule): pre-existing rows read the new column
    as NULL, upserts carry it, deletes in the same batch still apply."""
    t = _cdc_table(spark, str(tmp_path / "tbl"))
    batch = spark.createDataFrame(
        [
            (3, "updated3", "extra3", "U", 1),
            (42, "new42", "extra42", "I", 1),
            (7, None, None, "D", 1),
        ],
        "v long, tag string, extra string, _op string, seq long",
    )
    t.apply_changes(batch, "v", seq_col="seq")
    got = {r["v"]: (r["tag"], r["extra"]) for r in t.read().collect()}
    assert got[3] == ("updated3", "extra3")
    assert got[42] == ("new42", "extra42")
    assert 7 not in got
    assert got[0] == ("base0", None)  # old rows NULL-pad the new column
    assert len(got) == 10


def test_mor_point_delete_prunes_buckets(spark, tmp_path):
    """A single-key MOR delete (the GDPR shape) on a bucketed layout:
    bucket membership — not the useless full-range interval — bounds
    the candidate scan, and the DV lands only on matching buckets'
    files. Result equals the unpruned delete exactly."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["k"])
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    t.append_bucketed(df, "k", 16)
    n_files = len(_manifest(t)["files"])
    assert n_files >= 8
    v = t.delete_where_mor("k", 777, 777)
    m = _manifest(t)
    # the DV touches only the literal's bucket file(s)
    assert 1 <= len(m["dvs"]) < n_files / 4
    assert t.read().count() == 1999
    assert t.read(where=("k", 777, 777)).count() == 0
    # time travel intact, second delete of the same key no-ops
    assert t.read(v - 1).count() == 2000
    assert t.delete_where_mor("k", 777, 777) == v


def test_cow_point_dml_prunes_buckets(spark, tmp_path):
    """COW delete_where and update_where share the point-lookup
    bucket proofs: a single-key rewrite on a bucketed layout carries
    all non-matching buckets' files BY PATH (no rewrite churn) and
    equals the unpruned result."""
    a = SnapshotTable(spark, str(tmp_path / "a"), stats_columns=["k"])
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    a.append_bucketed(df, "k", 16)
    before = set(_manifest(a)["files"])
    n_files = len(before)
    a.delete_where("k", 777, 777)
    carried = before & set(_manifest(a)["files"])
    assert len(before - carried) < n_files / 4  # only the bucket rewrote
    assert a.read().count() == 1999
    b = SnapshotTable(spark, str(tmp_path / "b"), stats_columns=["k"])
    b.append_bucketed(df, "k", 16)
    before_b = set(_manifest(b)["files"])
    b.update_where("k", 777, 777, set={"v": F.lit(-1).cast("long")})
    carried_b = before_b & set(_manifest(b)["files"])
    assert len(before_b - carried_b) < len(before_b) / 4
    got = {r["k"]: r["v"] for r in b.read().collect()}
    assert got[777] == -1 and got[778] == 2334 and len(got) == 2000
