"""Incremental materialized view maintenance (sources/matview.py).

Contract: after ANY sequence of snapshot-table commits — appends,
copy-on-write merges/deletes, merge-on-read (deletion-vector) deletes,
restores — ``refresh()`` folds only the change feed into the view and
the result EQUALS the defining query recomputed from scratch,
including groups that vanish (count reaches zero). The watermark rides
the view's own manifest, so replays are no-ops and racing refreshers
conflict instead of double-applying.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.logstore import CommitConflict
from collective_als_spark.sources.matview import IncrementalAggView


def _rows(df):
    return sorted(
        (r["k"], r["sum_v"], r["n_rows"]) for r in df.collect()
    )


@pytest.fixture()
def fact_and_view(spark, tmp_path):
    fact = SnapshotTable(spark, str(tmp_path / "fact"), stats_columns=["v"])
    fact.append(
        spark.createDataFrame(
            [(1, 10), (1, 20), (2, 5), (3, 7)], "k long, v long"
        )
    )
    view = IncrementalAggView(
        spark, fact, str(tmp_path / "mv"), group_by=["k"], sums={"sum_v": "v"}
    )
    return fact, view


def test_initial_materialize_equals_recompute(spark, fact_and_view):
    fact, view = fact_and_view
    v = view.refresh()
    assert v == fact.current_version()
    assert _rows(view.read()) == [(1, 30, 2), (2, 5, 1), (3, 7, 1)]
    assert _rows(view.read()) == _rows(view.recompute())


def test_refresh_folds_appends_and_is_idempotent(spark, fact_and_view):
    fact, view = fact_and_view
    view.refresh()
    mv_version = view.table.current_version()
    # source unchanged: pure no-op, not even a view commit
    view.refresh()
    assert view.table.current_version() == mv_version
    fact.append(spark.createDataFrame([(1, 100), (4, 1)], "k long, v long"))
    view.refresh()
    assert _rows(view.read()) == _rows(view.recompute())
    assert (1, 130, 3) in _rows(view.read())
    assert view.last_source_version() == fact.current_version()


def test_refresh_folds_merge_updates(spark, fact_and_view):
    """An upsert arrives in the feed as delete+insert; the fold must
    retract the old value and add the new one."""
    fact, view = fact_and_view
    view.refresh()
    # the fact table keys on v for merge purposes: update row v=5 -> k=9
    fact.merge(
        spark.createDataFrame([(9, 5), (9, 999)], "k long, v long"), "v"
    )
    view.refresh()
    assert _rows(view.read()) == _rows(view.recompute())
    got = dict((k, (s, n)) for k, s, n in _rows(view.read()))
    assert 2 not in got  # its only row was re-keyed to 9
    assert got[9] == (1004, 2)


def test_refresh_drops_vanished_groups_cow_and_mor(spark, fact_and_view):
    fact, view = fact_and_view
    view.refresh()
    fact.delete_where("v", 5, 7)  # removes all of k=2 and k=3
    view.refresh()
    assert _rows(view.read()) == [(1, 30, 2)]
    fact.delete_where_mor("v", 20, 20)  # DV-masked delete of one k=1 row
    view.refresh()
    assert _rows(view.read()) == [(1, 10, 1)]
    assert _rows(view.read()) == _rows(view.recompute())


def test_stale_refresh_conflicts_instead_of_double_applying(
    spark, fact_and_view
):
    fact, view = fact_and_view
    view.refresh()
    state = view.read()
    with pytest.raises(CommitConflict, match="moved"):
        view.table.overwrite(
            state,
            _markers={"mv:src_version": 99},
            _expect_markers={"mv:src_version": view.last_source_version() + 1},
        )


def test_minmax_fold_and_partial_recompute(spark, tmp_path):
    """MIN/MAX: inserts fold without touching the fact table; a delete
    that removes a group's extremum triggers the partial recompute of
    just that group and lands on the runner-up."""
    fact = SnapshotTable(spark, str(tmp_path / "fact"), stats_columns=["v"])
    fact.append(
        spark.createDataFrame(
            [(1, 10), (1, 20), (1, 30), (2, 5)], "k long, v long"
        )
    )
    view = IncrementalAggView(
        spark,
        fact,
        str(tmp_path / "mv"),
        group_by=["k"],
        sums={"sum_v": "v"},
        mins={"min_v": "v"},
        maxs={"max_v": "v"},
    )
    view.refresh()

    def rows():
        return sorted(
            (r["k"], r["sum_v"], r["min_v"], r["max_v"], r["n_rows"])
            for r in view.read().collect()
        )

    assert rows() == [(1, 60, 10, 30, 3), (2, 5, 5, 5, 1)]
    # insert-only window: new extremes fold in
    fact.append(spark.createDataFrame([(1, 1), (2, 99)], "k long, v long"))
    view.refresh()
    assert rows() == [(1, 61, 1, 30, 4), (2, 104, 5, 99, 2)]
    # delete the group-1 minimum (MOR) — runner-up must surface
    fact.delete_where_mor("v", 1, 1)
    view.refresh()
    assert rows() == [(1, 60, 10, 30, 3), (2, 104, 5, 99, 2)]
    # delete group 2 entirely (both its rows, one per delete flavor):
    # vanishes despite being 'dirty'
    fact.delete_where("v", 99, 99)
    fact.delete_where_mor("v", 5, 5)
    view.refresh()
    assert rows() == sorted(
        (r["k"], r["sum_v"], r["min_v"], r["max_v"], r["n_rows"])
        for r in view.recompute().collect()
    )
    assert [r[0] for r in rows()] == [1]


def test_minmax_partial_recompute_null_group_key(spark, tmp_path):
    """groupBy treats NULL as a real group, so the dirty-group
    restriction and the fix join must use null-safe equality: deleting
    the NULL group's extremum must surface its runner-up, not leave a
    stale MIN/MAX (ADVICE r05)."""
    fact = SnapshotTable(spark, str(tmp_path / "fact"), stats_columns=["v"])
    fact.append(
        spark.createDataFrame(
            [(None, 10), (None, 20), (1, 5)], "k long, v long"
        )
    )
    view = IncrementalAggView(
        spark,
        fact,
        str(tmp_path / "mv"),
        group_by=["k"],
        sums={"sum_v": "v"},
        mins={"min_v": "v"},
        maxs={"max_v": "v"},
    )
    view.refresh()

    def rows():
        key = lambda t: (t[0] is None, t[0] or 0)  # noqa: E731
        return sorted(
            (
                (r["k"], r["sum_v"], r["min_v"], r["max_v"], r["n_rows"])
                for r in view.read().collect()
            ),
            key=key,
        ), sorted(
            (
                (r["k"], r["sum_v"], r["min_v"], r["max_v"], r["n_rows"])
                for r in view.recompute().collect()
            ),
            key=key,
        )

    got, want = rows()
    assert got == want == [(1, 5, 5, 5, 1), (None, 30, 10, 20, 2)]
    # delete the NULL group's maximum — runner-up (10) must surface
    fact.delete_where("v", 20, 20)
    view.refresh()
    got, want = rows()
    assert got == want == [(1, 5, 5, 5, 1), (None, 10, 10, 10, 1)]
    # and a MOR delete removing the NULL group's minimum entirely
    fact.delete_where_mor("v", 10, 10)
    view.refresh()
    got, want = rows()
    assert got == want == [(1, 5, 5, 5, 1)]


def test_view_requires_a_measure_and_unique_outputs(spark, tmp_path):
    fact = SnapshotTable(spark, str(tmp_path / "f"))
    with pytest.raises(ValueError, match="at least one measure"):
        IncrementalAggView(spark, fact, str(tmp_path / "m"), ["k"])
    with pytest.raises(ValueError, match="duplicate output"):
        IncrementalAggView(
            spark, fact, str(tmp_path / "m2"), ["k"],
            sums={"x": "v"}, mins={"x": "v"},
        )


def test_reserved_count_column_rejected(spark, tmp_path):
    fact = SnapshotTable(spark, str(tmp_path / "f"))
    with pytest.raises(ValueError, match="reserved"):
        IncrementalAggView(
            spark, fact, str(tmp_path / "m"), ["k"], {"n_rows": "v"}
        )


def test_minmax_partial_recompute_opens_only_dirty_group_files(spark, tmp_path):
    """Pin the pruning claim (r05 verdict #8): with the fact table
    clustered on the group key and the key in stats_columns, the
    MIN/MAX fix scan is a manifest-banded read that opens ONLY the
    dirty groups' files — not the table."""
    fact = SnapshotTable(
        spark, str(tmp_path / "fact"), stats_columns=["k", "v"]
    )
    # one file per group: clustered layout the pruning relies on
    for k in (1, 2, 3):
        fact.append(
            spark.createDataFrame(
                [(k, 10 * k), (k, 20 * k)], "k long, v long"
            ).coalesce(1)
        )
    view = IncrementalAggView(
        spark,
        fact,
        str(tmp_path / "mv"),
        group_by=["k"],
        sums={"sum_v": "v"},
        mins={"min_v": "v"},
        maxs={"max_v": "v"},
    )
    view.refresh()
    last = view.last_source_version()
    # delete group 2's maximum (v=40): only k=2 becomes dirty
    fact.delete_where("v", 40, 40)
    delta = fact.changes(last, fact.current_version())
    dirty = (
        delta.filter(F.col("_change_type") == "delete").select("k").distinct()
    )
    scan = view._dirty_fact_scan(fact.current_version(), dirty)
    opened = [f for f in scan.inputFiles() if "/data/" in f]
    all_files = [
        f for f in fact.read().inputFiles() if "/data/" in f
    ]
    assert len(all_files) == 3
    assert len(opened) == 1  # ONLY the dirty group's (rewritten) file
    assert sorted(r["k"] for r in scan.select("k").distinct().collect()) == [2]
    # and the refresh lands on the recompute exactly
    view.refresh()
    got = sorted(
        (r["k"], r["sum_v"], r["min_v"], r["max_v"], r["n_rows"])
        for r in view.read().collect()
    )
    want = sorted(
        (r["k"], r["sum_v"], r["min_v"], r["max_v"], r["n_rows"])
        for r in view.recompute().collect()
    )
    assert got == want
    assert (2, 20, 20, 20, 1) in got
    # insert-only window: the dirty scan short-circuits to ZERO files
    fact.append(spark.createDataFrame([(1, 99)], "k long, v long"))
    empty_dirty = dirty.filter(F.lit(False))
    scan2 = view._dirty_fact_scan(fact.current_version(), empty_dirty)
    assert scan2.count() == 0
    assert [f for f in scan2.inputFiles() if "/data/" in f] == []
    view.refresh()
    assert sorted(
        (r["k"], r["sum_v"]) for r in view.read().collect()
    ) == sorted((r["k"], r["sum_v"]) for r in view.recompute().collect())
