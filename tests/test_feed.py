"""Change-feed consumer cursor (sources/feed.py) + clustered
compaction (layout.py::compact(cluster_by=...)).

Feed contract: poll/commit delivers every net change exactly once in
commit order when commits interleave with polls; uncommitted polls
replay identically; positions only move forward; falling behind
retention errors instead of skipping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from collective_als_spark.sources.feed import (
    ChangeFeedReader,
    FeedCursorError,
    FeedLagError,
)
from collective_als_spark.sources.layout import SnapshotTable


def _vals(df):
    return sorted((r["v"], r["_change_type"]) for r in df.collect())


def test_poll_commit_delivers_each_change_once(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    r = ChangeFeedReader(t, str(tmp_path / "cursor.json"))
    assert r.poll() is None  # empty table, nothing to consume
    t.append(spark.createDataFrame([(1,), (2,)], "v long"))
    ch, to = r.poll()
    assert _vals(ch) == [(1, "insert"), (2, "insert")]
    # crash-before-commit: identical replay
    ch2, to2 = r.poll()
    assert to2 == to and _vals(ch2) == _vals(ch)
    r.commit(to)
    assert r.poll() is None
    # two more commits consumed as ONE net window
    t.append(spark.createDataFrame([(3,)], "v long"))
    t.delete_where_mor("v", 1, 1)
    ch, to = r.poll()
    assert _vals(ch) == [(1, "delete"), (3, "insert")]
    r.commit(to)
    assert r.poll() is None
    assert r.position() == t.current_version()


def test_cursor_monotonic_and_lag_detected(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    r = ChangeFeedReader(t, str(tmp_path / "cursor.json"))
    for i in range(4):
        t.append(spark.createDataFrame([(i,)], "v long"))
    ch, to = r.poll()
    r.commit(2)  # partially consume (e.g. bounded batch)
    with pytest.raises(ValueError, match="forward only"):
        r.commit(1)
    # retention passes the cursor: expire keeps only the last version
    t.expire(keep_last=1)
    with pytest.raises(FeedLagError, match="expired"):
        r.poll()


def test_commit_bounded_by_table_head(spark, tmp_path):
    """Committing a position the table has not reached would silently
    skip every change between the real head and the bogus version once
    the table catches up (ADVICE r05) — rejected instead."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    r = ChangeFeedReader(t, str(tmp_path / "cursor.json"))
    t.append(spark.createDataFrame([(1,)], "v long"))
    with pytest.raises(ValueError, match="commit only the to_version"):
        r.commit(7)
    ch, to = r.poll()
    r.commit(to)  # the poll-returned version is always accepted
    assert r.position() == 1


def test_corrupt_cursor_is_a_clear_recoverable_error(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.append(spark.createDataFrame([(1,)], "v long"))
    state = tmp_path / "cursor.json"
    r = ChangeFeedReader(t, str(state))
    ch, to = r.poll()
    r.commit(to)
    state.write_text('{"version": 1')  # externally truncated
    with pytest.raises(FeedCursorError, match="unreadable"):
        r.position()
    state.unlink()  # documented recovery: replay from genesis
    assert r.position() == 0
    assert _vals(r.poll()[0]) == [(1, "insert")]


def test_two_consumers_independent(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    a = ChangeFeedReader(t, str(tmp_path / "a.json"))
    b = ChangeFeedReader(t, str(tmp_path / "b.json"))
    t.append(spark.createDataFrame([(1,)], "v long"))
    ch, to = a.poll()
    a.commit(to)
    t.append(spark.createDataFrame([(2,)], "v long"))
    # b sees both appends; a only the second
    assert _vals(b.poll()[0]) == [(1, "insert"), (2, "insert")]
    assert _vals(a.poll()[0]) == [(2, "insert")]


def test_compact_clustered_restores_pruning(spark, tmp_path):
    """Round-robin compaction widens every file's stats to the full
    range; cluster_by compaction restores narrow bands so banded
    snapshot reads prune again."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    # interleaved appends: each commit spans the whole value range
    for i in range(4):
        t.append(
            spark.createDataFrame([(i + 4 * j,) for j in range(250)], "v long")
        )
    t.compact(target_rows_per_file=250, cluster_by=["v"])
    banded = t.read(where=("v", 0, 99))
    assert banded.count() == 100
    n_total = len(t.read().inputFiles())
    assert len(banded.inputFiles()) < n_total
    assert sorted(r["v"] for r in banded.collect()) == list(range(100))
    # DVs are materialized by the clustered rewrite too
    t.delete_where_mor("v", 500, 509)
    t.compact(target_rows_per_file=250, cluster_by=["v"])
    assert "dvs" not in t._manifest(t.current_version())
    assert t.read().count() == 990


def test_changes_by_version_attributes_each_commit(spark, tmp_path):
    """Per-commit CDC: every change carries _commit_version; churn
    inside the window is NOT netted (insert@v2 + delete@v3 both
    surface), while the netted form drops it."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_columns=["v"])
    t.append(spark.createDataFrame([(1,), (2,)], "v long"))   # v1
    t.append(spark.createDataFrame([(3,)], "v long"))          # v2
    t.delete_where_mor("v", 3, 3)                              # v3
    ch = t.changes_by_version(0).collect()
    got = sorted((r["v"], r["_change_type"], r["_commit_version"]) for r in ch)
    assert got == [
        (1, "insert", 1),
        (2, "insert", 1),
        (3, "delete", 3),
        (3, "insert", 2),
    ]
    # the netted window hides the intra-window churn entirely
    assert sorted(r["v"] for r in t.changes(0).collect()) == [1, 2]
    with pytest.raises(ValueError, match="empty window"):
        t.changes_by_version(3, 3)
    # reader passthrough
    r = ChangeFeedReader(t, str(tmp_path / "cursor.json"))
    pc, to = r.poll(per_commit=True)
    assert to == 3 and pc.count() == 4
    assert "_commit_version" in pc.columns


def test_time_based_retention(spark, tmp_path):
    """expire(older_than=...) keeps versions inside the time window
    even beyond keep_last; aging a manifest's commit timestamp makes
    it expirable."""
    import json as _json

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for i in range(4):
        t.append(spark.createDataFrame([(i,)], "v long"))
    hist = {r["version"]: r["committed_at"] for r in t.history().collect()}
    assert all(ts is not None for ts in hist.values())
    # everything is fresh: nothing but orphans may go
    t.expire(keep_last=1, older_than=3600)
    for v in range(1, 5):
        assert t.read(version=v).count() == v  # all still readable
    # age v1/v2 artificially (manifests are plain files)
    for v in (1, 2):
        p = tmp_path / "tbl" / "_snapshots" / f"v{v}.json"
        raw = _json.loads(p.read_text())
        raw["committed_at"] = raw["committed_at"] - 7200
        p.write_text(_json.dumps(raw))
    t.expire(keep_last=1, older_than=3600)
    for v in (1, 2):
        with pytest.raises(FileNotFoundError):
            t._manifest(v)
    assert t.read(version=3).count() == 3  # in-window survivor
    assert t.read().count() == 4


def test_per_commit_poll_past_retention_is_lag_error(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for i in range(3):
        t.append(spark.createDataFrame([(i,)], "v long"))
    t.expire(keep_last=1)
    r = ChangeFeedReader(t, str(tmp_path / "cursor.json"))
    # netted poll from genesis works (endpoints only)
    assert r.poll() is not None
    with pytest.raises(FeedLagError, match="per-commit replay"):
        r.poll(per_commit=True)
