"""Deequ-style expectations engine (operators/expectations.py):
violation counting per check kind, pass/fail semantics, and the
fusion contract (all row-level checks = ONE scan of the table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from collective_als_spark.operators.expectations import run_checks


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, 10.0, "A", 100),
        (2, -5.0, "A", 100),   # range violation
        (2, 20.0, "B", 200),   # duplicate id
        (None, 30.0, "C", 100),  # null id, bad status
        (4, 40.0, "A", 999),   # orphan fk
    ]
    return spark.createDataFrame(rows, "id int, amount double, status string, fk int")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(100,), (200,)], "key int")


def test_all_kinds(spark, dirty, dim):
    out = run_checks(
        dirty,
        [
            {"kind": "not_null", "column": "id"},
            {"kind": "unique", "column": "id"},
            {"kind": "range", "column": "amount", "lo": 0, "hi": 100},
            {"kind": "in_set", "column": "status", "values": ["A", "B"]},
            {"kind": "row_count_min", "n": 3},
            {"kind": "ref_integrity", "column": "fk", "ref": dim, "ref_column": "key"},
        ],
    )
    got = {r["check"]: (r["metric"], r["passed"]) for r in out.collect()}
    assert got["not_null_id"] == (1, False)
    assert got["unique_id"] == (1, False)       # one row beyond first occurrence of 2
    assert got["range_amount"] == (1, False)
    assert got["in_set_status"] == (1, False)
    assert got["row_count_min_3"] == (5, True)
    assert got["ref_integrity_fk"] == (1, False)


def test_clean_table_passes(spark, dim):
    clean = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id int, amount double")
    out = run_checks(
        clean,
        [
            {"kind": "not_null", "column": "id"},
            {"kind": "unique", "column": "id"},
            {"kind": "range", "column": "amount", "lo": 0, "hi": 10},
            {"kind": "row_count_min", "n": 2},
        ],
    )
    assert all(r["passed"] for r in out.collect())


def test_row_level_checks_fuse_to_one_scan(spark, sf_med):
    """The fusion contract: N row-level checks must not scan N times."""
    from collective_als_spark.sources.testdata import load_table

    orders = load_table(spark, sf_med, "orders")
    out = run_checks(
        orders,
        [
            {"kind": "not_null", "column": "o_orderkey"},
            {"kind": "unique", "column": "o_orderkey"},
            {"kind": "range", "column": "o_totalprice", "lo": 0, "hi": 1e9},
            {"kind": "in_set", "column": "o_orderstatus", "values": ["O", "F", "P"]},
            {"kind": "row_count_min", "n": 1},
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan


def test_unknown_kind_raises(spark, dirty):
    with pytest.raises(ValueError, match="unknown check kind"):
        run_checks(dirty, [{"kind": "frobnicate", "column": "id"}])


def test_empty_suite_raises(spark, dirty):
    with pytest.raises(ValueError, match="empty check suite"):
        run_checks(dirty, [])


def test_duplicate_checks_get_unique_names(spark, dirty):
    out = run_checks(
        dirty,
        [
            {"kind": "range", "column": "amount", "lo": 0, "hi": 100},
            {"kind": "range", "column": "amount", "lo": -100, "hi": 25},
            {"kind": "range", "column": "amount", "lo": 0, "hi": 5,
             "name": "amount_tight_band"},
        ],
    )
    got = {r["check"]: r["metric"] for r in out.collect()}
    # amounts are (10, -5, 20, 30, 40): one below 0; two above 25;
    # all five outside [0, 5]
    assert got == {"range_amount": 1, "range_amount_2": 2, "amount_tight_band": 5}


def test_empty_table_metrics_are_zero_not_null(spark):
    empty = spark.range(0).withColumn("v", F.col("id"))
    out = run_checks(
        empty,
        [{"kind": "not_null", "column": "id"},
         {"kind": "range", "column": "v", "lo": 0, "hi": 1},
         {"kind": "in_set", "column": "v", "values": [0]}],
    )
    for r in out.collect():
        assert r["metric"] == 0 and r["passed"] is True


def test_unsafe_check_name_rejected(spark):
    """Regression (ADVICE r04): names are interpolated into the fused
    stack() expression — quotes/backticks must be rejected, not
    injected."""
    df = spark.range(3)
    for bad in ["a'b", "a`b", "a, 1) --", "x y"]:
        with pytest.raises(ValueError, match="unsafe check name"):
            run_checks(df, [{"kind": "not_null", "column": "id", "name": bad}])


def test_statistical_checks_values_and_bounds(spark):
    """mean/stddev/quantile checks report the observed statistic and
    pass iff it lands inside [lo, hi]."""
    df = spark.createDataFrame([(float(v),) for v in (10, 20, 30, 40)], "x double")
    out = {
        r["check"]: r
        for r in run_checks(
            df,
            [
                {"kind": "mean_between", "column": "x", "lo": 20, "hi": 30},
                {"kind": "mean_between", "column": "x", "lo": 0, "hi": 5,
                 "name": "mean_too_low"},
                {"kind": "stddev_between", "column": "x", "lo": 10, "hi": 15},
                {"kind": "quantile_between", "column": "x", "q": 0.5,
                 "lo": 15, "hi": 35},
            ],
        ).collect()
    }
    assert out["mean_between_x"]["metric"] == 25.0
    assert out["mean_between_x"]["passed"] is True
    assert out["mean_too_low"]["passed"] is False
    assert abs(out["stddev_between_x"]["metric"] - 12.909944) < 1e-4
    assert out["stddev_between_x"]["passed"] is True
    assert out["quantile_between_x"]["passed"] is True
    assert out["quantile_between_x"]["metric"] in (20.0, 30.0)  # approx median


def test_statistical_checks_fuse_with_row_level(spark, sf_med):
    """A MIXED suite (row-level + statistical) still compiles to ONE
    scan — the r05 statistical tier rides the same hash aggregate."""
    from collective_als_spark.sources.testdata import load_table

    orders = load_table(spark, sf_med, "orders")
    out = run_checks(
        orders,
        [
            {"kind": "not_null", "column": "o_orderkey"},
            {"kind": "unique", "column": "o_orderkey"},
            {"kind": "range", "column": "o_totalprice", "lo": 0, "hi": 1e9},
            {"kind": "row_count_min", "n": 1},
            {"kind": "mean_between", "column": "o_totalprice", "lo": 0, "hi": 1e9},
            {"kind": "stddev_between", "column": "o_totalprice", "lo": 0, "hi": 1e9},
            {"kind": "quantile_between", "column": "o_totalprice", "q": 0.9,
             "lo": 0, "hi": 1e9},
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan
    assert all(r["passed"] for r in out.collect())


def test_statistical_check_fails_on_empty_batch(spark):
    """No rows -> no statistic -> the drift check FAILS (passed False,
    never NULL); violation-count checks on the same batch stay
    vacuously clean."""
    empty = spark.range(0).select(F.col("id").cast("double").alias("x"))
    out = {
        r["check"]: r
        for r in run_checks(
            empty,
            [
                {"kind": "mean_between", "column": "x", "lo": 0, "hi": 1},
                {"kind": "not_null", "column": "x"},
            ],
        ).collect()
    }
    assert out["mean_between_x"]["passed"] is False
    assert out["mean_between_x"]["metric"] is None
    assert out["not_null_x"]["passed"] is True


def test_wap_commit_gated_on_mean_drift(spark, tmp_path):
    """The WAP integration the statistical tier exists for: an ingest
    batch whose mean drifts outside the band never becomes visible."""
    from collective_als_spark.sources.layout import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    checks = [{"kind": "mean_between", "column": "amount", "lo": 50, "hi": 150}]
    good = spark.createDataFrame([(float(v),) for v in (90, 100, 110)], "amount double")
    v1 = t.wap_commit(good, checks)
    assert v1 == 1 and t.read().count() == 3
    drifted = spark.createDataFrame(
        [(float(v),) for v in (900, 1000, 1100)], "amount double"
    )
    with pytest.raises(ValueError, match="mean_between_amount"):
        t.wap_commit(drifted, checks)
    assert t.current_version() == 1 and t.read().count() == 3


# ---------------------------------------------------------------------------
# row-level expect-or-drop (split_by_expectations)
# ---------------------------------------------------------------------------


def test_split_by_expectations_routes_rows(spark):
    from collective_als_spark.operators.expectations import (
        split_by_expectations,
    )

    ref = spark.createDataFrame([(1,), (2,)], "rk long")
    df = spark.createDataFrame(
        [
            (1, 10, "A", 1),      # clean
            (None, 10, "A", 2),   # not_null(k)
            (2, -5, "A", 1),      # range(w) AND expr(w+rk>0) both fail
            (3, 10, "Z", 9),      # in_set(tag) and ref_integrity(rk)
            (4, None, "A", None), # NULLs pass range/expr/ref -> clean
        ],
        "k long, w long, tag string, rk long",
    )
    checks = [
        {"kind": "not_null", "column": "k"},
        {"kind": "range", "column": "w", "lo": 0, "hi": 100},
        {"kind": "in_set", "column": "tag", "values": ["A", "B"]},
        {"kind": "expr", "expr": "w + rk > 0", "name": "w_plus_rk_pos"},
        {"kind": "ref_integrity", "column": "rk", "ref": ref,
         "ref_column": "rk"},
    ]
    good, bad = split_by_expectations(df, checks)
    assert sorted(r["k"] for r in good.collect() if r["k"]) == [1, 4]
    assert set(good.columns) == {"k", "w", "tag", "rk"}  # no tag col leaks
    viol = {r["k"]: sorted(r["_violations"]) for r in bad.collect()}
    assert viol[2] == ["range_w", "w_plus_rk_pos"]
    assert viol[3] == ["in_set_tag", "ref_integrity_rk"]
    assert viol[None] == ["not_null_k"]
    assert good.count() + bad.count() == 5


def test_split_by_expectations_rejects_suite_level_kinds(spark):
    from collective_als_spark.operators.expectations import (
        split_by_expectations,
    )

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="suite-level"):
        split_by_expectations(df, [{"kind": "unique", "column": "k"}])
    with pytest.raises(ValueError, match="explicit 'name'"):
        split_by_expectations(df, [{"kind": "expr", "expr": "k > 0"}])
