"""Bucketed co-located joins: the plan must prove the shuffle is gone."""

import pytest

from pyspark.sql import functions as F

from collective_als_spark.plans import plan_summary
from collective_als_spark.sources.bucketing import co_located_join, write_bucketed
from collective_als_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], n_buckets=8, path=str(wh / "orders_b")
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        n_buckets=8,
        path=str(wh / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, sf_small, bucketed_tables):
    left, right = bucketed_tables
    # disable auto-broadcast: at test scale the planner would broadcast
    # the small side and skip bucketing entirely; at the 100 TB scale
    # bucketing targets, neither side is broadcastable
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, left, right, ["o_orderkey"])
        s = plan_summary(joined)
        assert s["n_exchanges"] == 0, s["plan"]
        assert s["n_sortmerge_joins"] == 1, s["plan"]

        # same join ad hoc (unbucketed) shuffles BOTH sides — the
        # baseline that proves bucketing removed real work
        orders = load_table(spark, sf_small, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        li = load_table(spark, sf_small, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
        )
        adhoc = plan_summary(orders.join(li, "o_orderkey"))
        assert adhoc["n_exchanges"] >= 2, adhoc["plan"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_adhoc_result(spark, sf_small, bucketed_tables):
    left, right = bucketed_tables
    got = (
        co_located_join(spark, left, right, ["o_orderkey"])
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("s"),
        )
        .collect()[0]
    )
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    want = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("s"),
        )
        .collect()[0]
    )
    assert (got.n, got.s) == (want.n, want.s)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("t"))
    s = plan_summary(agg)
    assert s["n_exchanges"] == 0, s["plan"]
