"""Classic TPC-H-shaped analytics beyond the ones already registered
(Q1→pricing_summary, Q3→shipping_priority_top10, Q5-ish→
star_join_revenue, Q10-ish→returned_items_by_nation): multi-way
nation-pair volume analysis, promo revenue share, HAVING-gated large
orders, and OR-of-ANDs predicate revenue. Each exercises a distinct
optimizer shape (join reordering over 6 tables, scalar ratio of
conditional aggregates, aggregate-then-semi-join, disjunctive pushdown)
with the usual DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collective_als_spark.registry import register
from collective_als_spark.sources.testdata import load_table


@register(
    "volume_shipping_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                 / 100.0, 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    HAVING sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
           > 100000000
    """,
)
def volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: international trade volume between distinct
    nation pairs by ship year — a 6-table join where Catalyst's
    reordering + dim broadcasts decide the cost. The two nation
    lookups are independent broadcast joins of the same tiny dim.

    Revenue sums EXACT integer cents: each line's double revenue is
    bit-identical in both engines, but the 4200 per-group sums of
    ~10^3 doubles land within float error of .005 boundaries often
    enough that round-after-double-sum flipped 3 groups at sf0.1 —
    integer-cent sums are order-independent, so the HAVING gate and
    the emitted value are deterministic at any scale."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        s.join(li, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.sum(cents).alias("_cents"))
        .filter(F.col("_cents") > 100000000)
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round(F.col("_cents") / 100.0, 2).alias("revenue"),
        )
    )


@register(
    "promo_revenue_q14",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY date_trunc('month', l_shipdate)
    """,
)
def promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share per ship month — the
    conditional-aggregate ratio pattern (one scan, no self-join); the
    part dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month"))
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"))
    )


@register(
    "large_orders_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN big ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def large_orders_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with very large orders — aggregate
    first to find qualifying keys, then semi-join the hot set back
    (the aggregate-then-join pattern that avoids carrying detail rows
    through the HAVING gate)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(
            li.select(F.col("l_orderkey").alias("lk"), "l_quantity"),
            F.col("lk") == o.o_orderkey,
        )
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "part_predicate_revenue_q19",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def part_predicate_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides — exercises disjunctive predicate pushdown (the
    per-side conjuncts Catalyst can factor out reach each scan) over a
    broadcast equi-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(cond).agg(F.round(F.sum(rev), 2).alias("revenue"))


@register(
    "customer_distribution_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts with
    a join-side predicate (non-urgent orders only) — the canonical
    outer-join-then-double-aggregate plan. The predicate lives in the
    JOIN condition, not a WHERE (a WHERE would turn the outer join
    inner and silently drop zero-order customers).

    Scale: one shuffle joins orders to customers on custkey, the first
    aggregate is key-partitioned on the same key (no extra exchange
    under AQE), and the second aggregate's key space is tiny (max
    orders per customer), so its shuffle is a few hundred rows.
    Reference parity: optimizer-shape coverage beyond SURVEY §2's J/A
    rows (`queries/tpch_extra.py` family, r03 verdict-endorsed)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "top_supplier_q15",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS cents
        FROM lineitem
        WHERE l_shipdate >= DATE '1998-01-01'
          AND l_shipdate < DATE '1998-07-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(r.cents / 100.0, 2) AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.cents = (SELECT max(cents) FROM rev)
    """,
)
def top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum revenue
    in a ship-date window — an aggregate reused twice (once as the
    join input, once reduced to a scalar max), the view-reuse pattern
    Q15 exists to test.

    Revenue accumulates exact integer cents (order-independent sums —
    the q7 determinism note) so the `= max` equality is exact in both
    engines; a double sum would make tie detection float-fragile.

    Scale: the revenue aggregate shuffles on l_suppkey once; the
    scalar max is a 1-row reduction broadcast back; the supplier join
    is dimension-sized. No window, no second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-07-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(cents).alias("cents"))
    )
    best = rev.agg(F.max("cents").alias("best_cents"))
    return (
        rev.join(F.broadcast(best), rev.cents == best.best_cents)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("cents") / 100.0, 2).alias("total_revenue"),
        )
    )


@register(
    "small_quantity_revenue_q17",
    oracle="""
    SELECT CAST(round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                 / 100.0 / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def small_quantity_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one
    brand's parts, where "small" is a correlated scalar subquery
    (20% of that part's average quantity). Expressed through
    ``spark.sql`` so Catalyst performs the textbook decorrelation:
    the correlated aggregate becomes a per-partkey aggregate joined
    back — exactly the plan you would hand-write, derived
    automatically.

    Scale: the decorrelated per-part average is one shuffle on
    l_partkey; the brand filter prunes the part dim before its join
    (broadcast-sized after the filter); integer-cent sum for the
    deterministic scalar output (q7 note)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_q17_l")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("_q17_p")
    return spark.sql(
        """
        SELECT CAST(round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                     / 100.0 / 7.0, 2) AS DOUBLE) AS avg_yearly
        FROM _q17_l l
        JOIN _q17_p p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM _q17_l l2
              WHERE l2.l_partkey = l.l_partkey
          )
        """
    )


@register(
    "dormant_segment_balance_q22",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0, 2)
               AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT avg(c2.c_acctbal) FROM customer c2
            WHERE c2.c_acctbal > 0.0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
              AND year(o.o_orderdate) >= 2001
          )
    GROUP BY c.c_mktsegment
    """,
)
def dormant_segment_balance_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance-above-average customers with
    no recent urgent order, totalled per market segment — an
    uncorrelated scalar subquery (global average) gating a NOT EXISTS
    anti join. (The classic phone-prefix predicate is adapted to the
    driver schema: segment replaces country code, "no urgent 2001+
    order" replaces "no orders" since every synthetic customer
    orders.)

    Scale: the scalar average is a 1-row broadcast; NOT EXISTS
    becomes a left-anti hash join against the filtered orders
    projection (filter pushed below the join, one column read);
    integer-cent balance sum (q7 note)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.year("o_orderdate") >= 2001)
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, o.o_custkey == c.c_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(cents) / 100.0, 2).alias("totacctbal"),
        )
    )


@register(
    "late_shipment_priority_q4",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1998-01-01'
      AND o.o_orderdate < DATE '1998-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def late_shipment_priority_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter with at least one
    late-shipped line (>30 days after order date, standing in for the
    reference schema's missing commit/receipt dates), counted per
    priority — the correlated EXISTS that Catalyst turns into a
    left-semi hash join BEFORE the aggregate, so each order is counted
    once however many lines qualify.

    Scale: the date filter pushes into the orders scan; the semi join
    co-groups on the order key and short-circuits per order; the
    closing aggregate is |priorities|-sized."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    qualified = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return qualified.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )
