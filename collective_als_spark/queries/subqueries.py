"""Subquery patterns + TPC-H-style multi-join analytics + array
higher-order functions.

Correlated EXISTS / IN / scalar subqueries go through ``spark.sql`` so
Catalyst's subquery decorrelation (rewrite to semi/anti/left joins) is
exercised — that rewrite is exactly what makes these patterns viable at
100 TB (a naive per-row subquery would be O(N·M)). The TPC-H-shaped
queries stress join ordering + broadcast selection over the star
schema. Array ops stay in native higher-order functions (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collective_als_spark.registry import register
from collective_als_spark.sources import load_table, register_views


@register(
    "exists_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    AND NOT EXISTS (
        SELECT 1 FROM events e WHERE e.user_id = c.c_custkey
    )
    """,
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS — Catalyst decorrelates to a
    left-semi ⨝ left-anti chain (one hash shuffle each, no per-row
    execution)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        AND NOT EXISTS (
            SELECT 1 FROM events e WHERE e.user_id = c.c_custkey
        )
        """
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT avg(c_acctbal) FROM customer i
        WHERE i.c_nationkey = c.c_nationkey
    )
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above-nation-average balance) —
    decorrelated to an aggregate + join, not N scalar executions."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer i
            WHERE i.c_nationkey = c.c_nationkey
        )
        """
    )


@register(
    "in_subquery_high_value",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    )
    """,
)
def in_subquery_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join rewrite."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        )
        """
    )


@register(
    "shipping_priority_top10",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           epoch_ms(o_orderdate) AS orderdate_ms, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate  > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → revenue agg →
    global top-10 (TakeOrderedAndProject, no full sort). Filters push
    to all three scans; customer broadcasts."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1996-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1996-03-15"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "returned_items_by_nation",
    oracle="""
    SELECT n_name,
           count(DISTINCT c_custkey) AS n_customers,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY n_name
    """,
)
def returned_items_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item lost revenue rolled up to nation.
    Quarter + returnflag filters push down; nation/customer broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("lost_revenue"),
        )
    )


@register(
    "latest_event_per_user_type",
    oracle="""
    SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC
        ) AS rk
        FROM events
    ) WHERE rk = 1
    """,
)
def latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup (the standard CDC/pipeline compaction):
    partitioned row_number, no global sort; at scale this is the
    pattern for upsert-log compaction."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_id", "user_id", "event_type", F.unix_millis("ts").alias("ts_ms"))
    )


@register(
    "array_functions_suite",
    oracle="""
    SELECT vec_id,
           round(list_aggregate(list_transform(embedding, x -> CAST(x*x AS DOUBLE)), 'sum'), 4) AS sq_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(CAST(embedding[1] AS DOUBLE), 4) AS first_dim
    FROM embeddings
    WHERE vec_id < 200
    """,
)
def array_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (transform/filter/aggregate) —
    JVM-side lambda expressions inside codegen, the no-UDF way to
    process array<float> columns (SURVEY §2.8 F4 generalized)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    d = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.transform(d, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            ),
            4,
        ).alias("sq_norm"),
        F.size(F.filter(d, lambda x: x > 0)).alias("n_pos"),
        F.round(F.element_at(d, 1), 4).alias("first_dim"),
    )


@register(
    "select_list_scalar_subquery",
    oracle="""
    SELECT c_custkey,
           round(c_acctbal, 2) AS acctbal,
           (SELECT round(CAST(sum(CAST(round(i.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                         / count(*) / 100.0, 2)
            FROM customer i WHERE i.c_nationkey = c.c_nationkey) AS nation_avg
    FROM customer c
    WHERE c_custkey <= 500
    """,
)
def select_list_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the SELECT list — the OTHER
    decorrelation shape: where the WHERE-clause form
    (scalar_subquery_above_avg) rewrites to a filtering join, this one
    must PRESERVE every outer row and attach the aggregate, so Catalyst
    plans aggregate-then-LEFT-OUTER-join on the correlation key — no
    per-row subquery execution at any scale.

    The emitted average is integer-cent sum / count (exact bigint sum,
    one double division) — avg(double) would differ between engines in
    summation order and flip round(.,2) boundaries."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey,
               round(c_acctbal, 2) AS acctbal,
               (SELECT round(CAST(sum(CAST(round(i.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                             / count(*) / 100.0, 2)
                FROM customer i WHERE i.c_nationkey = c.c_nationkey) AS nation_avg
        FROM customer c
        WHERE c_custkey <= 500
        """
    )
