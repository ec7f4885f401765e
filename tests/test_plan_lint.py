"""Plan linter (plans/lint.py): each scale-smell rule must fire on a
plan constructed to exhibit it and stay silent on the clean version.

(No ``from __future__ import annotations`` here: it stringifies the
pandas_udf type hints that Spark resolves at decoration time.)"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from collective_als_spark.plans import assert_clean, lint_plan


def _rules(findings):
    return {f["rule"] for f in findings}


def test_clean_plan(spark):
    df = (
        spark.range(100)
        .withColumn("k", F.col("id") % 10)
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
    )
    assert lint_plan(df) == []
    assert_clean(df)  # no raise


def test_cartesian_detected(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    df = a.crossJoin(b)
    assert _rules(lint_plan(df)) == {"cartesian-join"}
    assert lint_plan(df, allow={"cartesian-join"}) == []
    with pytest.raises(AssertionError, match="cartesian-join"):
        assert_clean(df)


def test_global_window_detected(spark):
    df = spark.range(100).withColumn(
        "rk", F.row_number().over(Window.orderBy("id"))
    )
    assert "global-window" in _rules(lint_plan(df))


def test_row_udf_detected_and_arrow_udf_clean(spark):
    from pyspark.sql.types import LongType

    @F.udf(LongType())
    def slow_double(x):
        return x * 2

    df = spark.range(100).withColumn("y", slow_double(F.col("id")))
    assert "row-udf" in _rules(lint_plan(df))

    import pandas as pd

    @F.pandas_udf(LongType())
    def fast_double(x: pd.Series) -> pd.Series:
        return x * 2

    df2 = spark.range(100).withColumn("y", fast_double(F.col("id")))
    assert "row-udf" not in _rules(lint_plan(df2))


def test_wide_scan_detected(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/lineitem.parquet")  # all 11 cols
    assert "wide-scan" in _rules(lint_plan(df, wide_scan_cols=11))
    narrow = df.select("l_orderkey", "l_quantity")
    assert "wide-scan" not in _rules(lint_plan(narrow, wide_scan_cols=11))


def test_unknown_allow_rule_rejected(spark):
    with pytest.raises(ValueError, match="unknown lint rules"):
        lint_plan(spark.range(1), allow={"frobnicate"})
