"""SCD TYPE 2 apply_changes (r10 verdict #7): history-preserving CDC
apply with ``__START_AT`` / ``__END_AT`` interval columns — DLT's
``APPLY CHANGES .. STORED AS SCD TYPE 2`` semantics.

Invariants driven here:
- every sequenced change appends an interval; the open row is the
  current state; deletes close without opening;
- the current-state view (``__END_AT IS NULL``) equals what
  scd_type=1 would have produced from the same batches;
- ``track_seq=True`` gates stale cross-batch changes off the history
  itself (no tombstone side file), so replays and late batches no-op;
- validation refuses unsequenced batches, (key, seq) ties, reserved
  column clashes, and non-SCD2-managed tables.
"""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, w string, _op string, seq long")


def _t(spark, path, **kw):
    return SnapshotTable(spark, str(path), stats_columns=["k"], **kw)


def _hist(t):
    return sorted(
        (r["k"], r["w"], r["__START_AT"], r["__END_AT"])
        for r in t.read().collect()
    )


@pytest.mark.parametrize("mor", [True, False])
def test_scd2_lifecycle_intervals(spark, tmp_path, mor):
    t = _t(spark, tmp_path / "t")
    t.apply_changes(
        _batch(spark, [(1, "a", "U", 10), (2, "b", "U", 10)]),
        "k", seq_col="seq", scd_type=2, mor=mor,
    )
    assert _hist(t) == [(1, "a", 10, None), (2, "b", 10, None)]
    t.apply_changes(
        _batch(spark, [(1, "a2", "U", 20), (2, None, "D", 15)]),
        "k", seq_col="seq", scd_type=2, mor=mor,
    )
    assert _hist(t) == [
        (1, "a", 10, 20),
        (1, "a2", 20, None),
        (2, "b", 10, 15),
    ]
    current = {
        r["k"]: r["w"]
        for r in t.read().filter(F.col("__END_AT").isNull()).collect()
    }
    assert current == {1: "a2"}


def test_scd2_multi_change_single_batch(spark, tmp_path):
    """Unlike scd_type=1 (winner only), EVERY sequenced change gets
    its interval; a trailing delete closes the chain."""
    t = _t(spark, tmp_path / "t")
    t.apply_changes(
        _batch(
            spark,
            [(1, "v1", "U", 10), (1, "v2", "U", 20), (1, None, "D", 30)],
        ),
        "k", seq_col="seq", scd_type=2,
    )
    assert _hist(t) == [(1, "v1", 10, 20), (1, "v2", 20, 30)]
    assert t.read().filter(F.col("__END_AT").isNull()).count() == 0


def test_scd2_reopen_after_delete(spark, tmp_path):
    t = _t(spark, tmp_path / "t")
    t.apply_changes(
        _batch(spark, [(2, "b", "U", 10)]), "k", seq_col="seq", scd_type=2
    )
    t.apply_changes(
        _batch(spark, [(2, None, "D", 15)]), "k", seq_col="seq", scd_type=2
    )
    t.apply_changes(
        _batch(spark, [(2, "b2", "U", 25)]), "k", seq_col="seq", scd_type=2
    )
    assert _hist(t) == [(2, "b", 10, 15), (2, "b2", 25, None)]


def test_scd2_track_seq_gates_stale_batches(spark, tmp_path):
    t = _t(spark, tmp_path / "t", bloom_columns=["k"])
    t.apply_changes(
        _batch(spark, [(1, "a", "U", 10), (2, "b", "U", 10)]),
        "k", seq_col="seq", scd_type=2, track_seq=True,
    )
    v = t.apply_changes(
        _batch(spark, [(1, "a2", "U", 20), (2, None, "D", 18)]),
        "k", seq_col="seq", scd_type=2, track_seq=True,
    )
    want = [(1, "a", 10, 20), (1, "a2", 20, None), (2, "b", 10, 18)]
    assert _hist(t) == want
    # stale regression + stale resurrection: ignored row-for-row,
    # version-preserving no-op (floor = max(coalesce(end, start)))
    v2 = t.apply_changes(
        _batch(spark, [(1, "OLD", "U", 15), (2, "ZOMBIE", "U", 17)]),
        "k", seq_col="seq", scd_type=2, track_seq=True,
    )
    assert v2 == v and _hist(t) == want
    # replay of the applied batch: no-op too (<= floor)
    v3 = t.apply_changes(
        _batch(spark, [(1, "a2", "U", 20), (2, None, "D", 18)]),
        "k", seq_col="seq", scd_type=2, track_seq=True,
    )
    assert v3 == v and _hist(t) == want
    # mixed batch: the fresh row applies, the stale one gates out
    t.apply_changes(
        _batch(spark, [(1, "a3", "U", 30), (2, "stale", "U", 12)]),
        "k", seq_col="seq", scd_type=2, track_seq=True,
    )
    assert _hist(t) == [
        (1, "a", 10, 20),
        (1, "a2", 20, 30),
        (1, "a3", 30, None),
        (2, "b", 10, 18),
    ]


def test_scd2_current_view_matches_scd1(spark, tmp_path):
    """The open rows of an SCD2 table equal the scd_type=1 table's
    state after the same (shuffled) batch sequence."""
    s1 = _t(spark, tmp_path / "s1")
    s2 = _t(spark, tmp_path / "s2")
    batches = [
        [(k, f"v{k}-1", "U", 10) for k in range(8)],
        [(k, f"v{k}-2", "U", 20) for k in range(0, 8, 2)]
        + [(k, None, "D", 20) for k in range(1, 8, 2)],
        [(3, "late", "U", 15)],  # stale for k=3 (deleted at 20)
    ]
    for b in batches:
        s1.apply_changes(
            _batch(spark, b), "k", seq_col="seq", track_seq=True
        )
        s2.apply_changes(
            _batch(spark, b), "k", seq_col="seq", scd_type=2, track_seq=True
        )
    got1 = sorted(
        (r["k"], r["w"]) for r in s1.read().select("k", "w").collect()
    )
    got2 = sorted(
        (r["k"], r["w"])
        for r in s2.read()
        .filter(F.col("__END_AT").isNull())
        .select("k", "w")
        .collect()
    )
    assert got1 == got2 == [(k, f"v{k}-2") for k in range(0, 8, 2)]


def test_scd2_validation(spark, tmp_path):
    t = _t(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="needs seq_col"):
        t.apply_changes(
            _batch(spark, [(1, "a", "U", 1)]), "k", scd_type=2
        )
    with pytest.raises(ValueError, match="tie on \\(key"):
        t.apply_changes(
            _batch(spark, [(1, "a", "U", 10), (1, "b", "U", 10)]),
            "k", seq_col="seq", scd_type=2,
        )
    with pytest.raises(ValueError, match="reserved"):
        t.apply_changes(
            _batch(spark, [(1, "a", "U", 10)]).withColumn(
                "__START_AT", F.lit(1)
            ),
            "k", seq_col="seq", scd_type=2,
        )
    with pytest.raises(ValueError, match="scd_type must be 1 or 2"):
        t.apply_changes(
            _batch(spark, [(1, "a", "U", 10)]), "k", seq_col="seq", scd_type=3
        )
    # a table not born under SCD2 is refused (no silent history forgery)
    t.append(spark.createDataFrame([(1, "x")], "k long, w string"))
    with pytest.raises(ValueError, match="not\\s+SCD2-managed"):
        t.apply_changes(
            _batch(spark, [(1, "a", "U", 10)]), "k", seq_col="seq", scd_type=2
        )


def test_scd2_time_travel_and_cdf_ride_merge_machinery(spark, tmp_path):
    t = _t(spark, tmp_path / "t", change_data_feed=True)
    t.apply_changes(
        _batch(spark, [(1, "a", "U", 10)]), "k", seq_col="seq", scd_type=2
    )
    v1 = t.current_version()
    t.apply_changes(
        _batch(spark, [(1, "a2", "U", 20)]), "k", seq_col="seq", scd_type=2
    )
    # time travel shows the pre-update history
    assert _hist_at(t, v1) == [(1, "a", 10, None)]
    feed = t.changes(v1, t.current_version())
    kinds = sorted(
        r["_change_type"] for r in feed.select("_change_type").collect()
    )
    # closing the open row is a delete+insert pair; the new interval
    # is an insert
    assert kinds == ["delete", "insert", "insert"]


def _hist_at(t, version):
    return sorted(
        (r["k"], r["w"], r["__START_AT"], r["__END_AT"])
        for r in t.read(version=version).collect()
    )


def test_streaming_apply_sink_scd2(spark, tmp_path):
    """The apply_key streaming sink with scd_type=2: each micro-batch
    appends intervals, a replayed batch id no-ops via the in-manifest
    markers, a stale later batch gates off the history floor."""

    def batch(rows):
        return spark.createDataFrame(
            rows, "k long, w string, _op string, seq long"
        )

    t = _t(spark, tmp_path / "t")
    sink = t.streaming_sink(
        str(tmp_path / "ckpt"),
        apply_key="k",
        seq_col="seq",
        track_seq=True,
        scd_type=2,
    )
    sink(batch([(1, "a", "U", 10), (2, "b", "U", 10)]), 0)
    sink(batch([(1, "a", "U", 10), (2, "b", "U", 10)]), 0)  # replay
    assert _hist(t) == [(1, "a", 10, None), (2, "b", 10, None)]
    sink(batch([(1, "a2", "U", 20), (2, "stale", "U", 5)]), 1)
    assert _hist(t) == [
        (1, "a", 10, 20),
        (1, "a2", 20, None),
        (2, "b", 10, None),
    ]


def test_scd2_plans_lint_clean(spark, tmp_path):
    """The SCD2 machinery's distributed reads carry no scale smells:
    the pruned history scan and the current-state view lint clean
    (no cartesians, no global windows, no row-UDFs, no wide scans) —
    the per-batch lead(seq) window is KEY-partitioned by design."""
    from collective_als_spark.plans.lint import lint_plan

    t = _t(spark, tmp_path / "t")
    t.apply_changes(
        _batch(spark, [(i, f"v{i}", "U", 1) for i in range(200)]),
        "k", seq_col="seq", scd_type=2, track_seq=True,
    )
    t.apply_changes(
        _batch(spark, [(i, "x", "U", 9) for i in range(0, 200, 7)]),
        "k", seq_col="seq", scd_type=2, track_seq=True,
    )
    m = t._base_manifest(t.current_version())
    latest = _batch(spark, [(i, "y", "U", 20) for i in range(0, 200, 13)])
    hist = t._scd2_key_history(m, latest, ["k"])
    assert lint_plan(hist) == []
    cur = t.read().filter(F.col("__END_AT").isNull())
    assert lint_plan(cur) == []
