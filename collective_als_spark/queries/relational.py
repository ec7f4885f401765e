"""Relational-spine queries (SURVEY §2.1-§2.8) over the TPC-H-ish tables.

Each query is written DataFrame-first (Catalyst handles pushdown /
pruning / join selection) with a DuckDB oracle in matching column
names. Aggregate floats are rounded in BOTH engines to absorb
summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from collective_als_spark.functions.vector import checked_cast
from collective_als_spark.registry import register
from collective_als_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------- S3/A scans+agg
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped groupBy-agg (scan S3 + aggregation A-family)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ------------------------------------------------------------------ P1/P2 casts
@register(
    "checked_cast_projection",
    oracle="""
    SELECT CAST(user_id AS INTEGER) AS src,
           CAST(event_id AS INTEGER) AS dst,
           CAST(value AS FLOAT) AS rating
    FROM events
    WHERE user_id IS NOT NULL
    """,
)
def checked_cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: select + checkedCast projection into (src, dst, rating)
    — reference CollectiveALS.scala:104-116."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("user_id").isNotNull()).select(
        checked_cast(F.col("user_id")).alias("src"),
        checked_cast(F.col("event_id")).alias("dst"),
        F.col("value").cast("float").alias("rating"),
    )
