"""Second extended-coverage batch: full-outer contribution merge (the
CMF J5 analog as a relational query), GROUPING SETS, equi+range join,
lead/ntile windows, and date arithmetic.

Reference parity notes:
  - full_outer_merge mirrors ``CollectiveALS.scala:1037-1047`` (per-ID
    merge of per-relation contributions via fullOuterJoin) expressed
    relationally over the driver testdata.
  - The rest are SURVEY §2 "absent in reference, free in Spark" rows
    (§2.3 range joins, §2.4 grouping sets, §2.5 lag/lead/ntile,
    §2.8 date arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from collective_als_spark.registry import register
from collective_als_spark.sources import load_table


@register(
    "full_outer_merge",
    oracle="""
    WITH a AS (
        SELECT o_custkey AS id, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS spend
        FROM orders GROUP BY o_custkey
    ),
    b AS (
        SELECT user_id AS id, count(*) AS n_events,
               round(sum(value), 2) AS activity
        FROM events GROUP BY user_id
    )
    SELECT coalesce(a.id, b.id) AS id,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(spend, 0.0) AS spend,
           coalesce(n_events, 0) AS n_events,
           coalesce(activity, 0.0) AS activity
    FROM a FULL OUTER JOIN b ON a.id = b.id
    """,
)
def full_outer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 analog: per-ID merge of contributions from two relations via
    FULL OUTER join + coalesce (reference CollectiveALS.scala:1037-1047,
    where per-entity normal equations from every touching relation are
    fullOuterJoin-merged). Both sides pre-aggregate (map-side combine)
    before the join, so the shuffle carries one row per ID per side."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    a = orders.groupBy(F.col("o_custkey").alias("id")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("spend"),
    )
    b = events.groupBy(F.col("user_id").alias("id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("activity"),
    )
    return a.join(b, "id", "full_outer").select(
        F.col("id"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("spend", F.lit(0.0)).alias("spend"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("activity", F.lit(0.0)).alias("activity"),
    )


@register(
    "grouping_sets_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the native DataFrame API (Spark 4
    ``groupingSets``) — partial aggregation + a single Expand, one
    shuffle regardless of the number of sets."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))


@register(
    "range_join_attribution",
    oracle="""
    SELECT p.event_id, count(*) AS n_prior, round(sum(c.value), 2) AS prior_v
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts <  p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range join (attribution window): each purchase joined to
    the same user's activity in the preceding hour. The equi key
    (user_id) hash-partitions the join; the time-range predicate
    evaluates as a residual filter inside the same stage — no cross
    product, cost scales with per-user match counts, and AQE splits
    skewed users. (SURVEY §2.3 — range joins absent in reference.)"""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").alias("p")
    c = e.alias("c")
    j = p.join(
        c,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("c.ts") >= F.timestamp_add("HOUR", F.lit(-1), F.col("p.ts")))
        & (F.col("c.ts") < F.col("p.ts")),
    )
    return j.groupBy(F.col("p.event_id").alias("event_id")).agg(
        F.count(F.lit(1)).alias("n_prior"),
        F.round(F.sum(F.col("c.value")), 2).alias("prior_v"),
    )


@register(
    "lead_ntile_window",
    oracle="""
    SELECT event_id, user_id,
           lead(event_id) OVER w AS next_event_id,
           ntile(4) OVER w AS quartile
    FROM events
    WHERE user_id < 100
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lead_ntile_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead + ntile analytic functions, partitioned per user (SURVEY
    §2.5 — absent in reference). Partitioned window → parallel across
    users, no global sort."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lead("event_id").over(w).alias("next_event_id"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "date_arithmetic",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           round(avg(date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE))), 4) AS avg_ship_days,
           count(*) AS n
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc + day difference + monthly rollup (SURVEY §2.8 — the
    reference's only date op is Date→millis, F3). Join keys prune both
    scans to 2-3 columns; the monthly groupBy pre-aggregates map-side."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        j.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            F.datediff("l_shipdate", "o_orderdate").alias("ship_days"),
        )
        .groupBy("order_month")
        .agg(F.round(F.avg("ship_days"), 4).alias("avg_ship_days"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "window_distribution_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           first_value(l_quantity) OVER w AS smallest_qty
    FROM lineitem
    WHERE l_orderkey < 200
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)
    """,
)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / first_value distribution analytics
    (SURVEY §2.5 — absent in reference, free in Spark). Partitioned by
    returnflag → parallel, no global sort."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("l_quantity").over(w).alias("smallest_qty"),
    )
