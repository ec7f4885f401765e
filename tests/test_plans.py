"""Plan-shape regression tests: pushdown, pruning, broadcast choice,
and no accidental cartesian products (the 100 TB guardrails)."""

from pyspark.sql import functions as F

from collective_als_spark.plans import plan_summary
from collective_als_spark.registry import spark_queries
from collective_als_spark.sources import load_table


def test_filter_pushdown_reaches_scan(spark, sf_med):
    li = load_table(spark, sf_med, "lineitem")
    df = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    s = plan_summary(df)
    scan = s["scans"][0]
    assert any("l_shipdate" in f for f in scan["pushed_filters"]), scan
    # column pruning: only the 3 needed columns read, not all 11
    assert set(scan["read_columns"]) == {"l_orderkey", "l_quantity", "l_shipdate"}


def test_star_join_broadcasts_dims(spark, sf_med):
    s = plan_summary(spark_queries()["star_join_revenue"](spark, sf_med))
    assert s["n_broadcast_joins"] >= 2  # nation + region at minimum
    assert s["n_cartesian"] == 0
    # fact scans are pruned to join keys + agg inputs
    li_scan = next(
        sc for sc in s["scans"] if sc["read_columns"] and "l_extendedprice" in sc["read_columns"]
    )
    assert len(li_scan["read_columns"]) == 3


def test_agg_query_prunes_columns(spark, sf_med):
    s = plan_summary(spark_queries()["pricing_summary"](spark, sf_med))
    scan = s["scans"][0]
    assert len(scan["read_columns"]) == 5
    # map-side combine: partial aggregation before the shuffle
    assert "partial_sum" in s["plan"]


def test_prediction_join_no_cartesian(spark):
    from collective_als_spark.cmf import CollectiveALS

    df = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0)], "user int, item int, rating double"
    )
    model = CollectiveALS("user", "item", rank=2, max_iter=1, seed=1, num_blocks=2).fit(df)
    s = plan_summary(model.predict(df, "user", "item"))
    assert s["n_cartesian"] == 0


def test_minhash_map_only(spark, sf_med):
    s = plan_summary(spark_queries()["minhash_signature"](spark, sf_med))
    # r04 rewrite: per-doc array_min replaces explode + groupBy — the
    # signature pass never shuffles the SHINGLE frame. r16 adds one
    # round-robin spread of the raw doc rows ahead of the hash chain
    # (testdata.spread, parallelism floor for single-split scans); the
    # hash/min work itself must stay un-keyed — no hash exchange.
    assert s["n_exchanges"] <= 1, s["n_exchanges"]
    assert "hashpartitioning" not in s["plan"], s["plan"]


def test_approx_split_has_no_global_window(spark, sf_med):
    """The scale path of split_chronologically must not funnel data
    through a single-partition window (the exact path's known cost)."""
    from collective_als_spark.operators.split import split_chronologically
    from collective_als_spark.sources import load_table

    ev = load_table(spark, sf_med, "events")
    train, test = split_chronologically(ev, [0.9, 0.1], "ts", exact=False)
    for df in (train, test):
        plan = plan_summary(df)["plan"]
        assert "Window" not in plan, plan
    # slices are disjoint and cover ~everything
    n = ev.count()
    nt, ns = train.count(), test.count()
    assert nt + ns == n
    assert 0.85 <= nt / n <= 0.95


def test_ranking_metrics_plan_shape(spark, sf_med):
    """The A11 plan at the full reference k-set {5,10,20,50,100} must
    keep its three scale invariants (r03 verdict #1: the truth joins ARE
    broadcast; the cost is intrinsic k-set width, not a plan miss):
    - WindowGroupLimit: top-max_k pruning runs BEFORE the full rank
      window (partial+final), so per-user work is bounded by max(ks);
    - both relevance joins (truth pairs, n_rel counts) broadcast —
      no sort-merge join anywhere;
    - the per-user groupBy reuses the window's hash partitioning: a
      constant number of exchanges regardless of len(ks)."""
    s = plan_summary(spark_queries()["ranking_metrics_at_k"](spark, sf_med))
    assert "WindowGroupLimit" in s["plan"], s["plan"]
    assert s["n_broadcast_joins"] == 2, s["plan"]
    assert s["n_sortmerge_joins"] == 0
    assert s["n_cartesian"] == 0
    assert s["n_exchanges"] <= 6, s["n_exchanges"]


def test_join_strategy_hints_control_plan(spark, sf_med):
    """Strategy hints override Catalyst's default pick — the manual
    control used when stats mislead the planner at scale."""
    from pyspark.sql import functions as F

    from collective_als_spark.plans import plan_summary
    from collective_als_spark.sources.testdata import load_table

    orders = load_table(spark, sf_med, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_med, "lineitem").select("l_orderkey", "l_quantity")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cond = li.l_orderkey == orders.o_orderkey
        default = plan_summary(li.join(orders, cond))
        assert default["n_sortmerge_joins"] == 1, default["plan"]
        hashed = plan_summary(li.join(orders.hint("shuffle_hash"), cond))
        assert hashed["n_shuffledhash_joins"] == 1, hashed["plan"]
        bcast = plan_summary(li.join(F.broadcast(orders), cond))
        assert bcast["n_broadcast_joins"] == 1, bcast["plan"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_med):
    """Runtime bloom-filter join pruning (the 100 TB selective-join
    technique): a filtered dimension side injects a bloom_filter_agg
    whose BloomFilterMightContain pre-filters the fact side BEFORE the
    join shuffle, cutting shuffled fact rows to ~the join's selectivity.
    At cluster scale this engages automatically (the application-side
    scan threshold defaults to 10GB); at test scale we lower the
    threshold to 0 to witness the mechanism, and assert correctness is
    unchanged against the plain-join result."""
    from pyspark.sql import functions as F

    from collective_als_spark.plans import plan_summary
    from collective_als_spark.sources.testdata import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}

    def build():
        o = load_table(spark, sf_med, "orders").filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 400000)
        )
        li = load_table(spark, sf_med, "lineitem")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum(F.round("l_extendedprice", 0)).alias("s"))
        )

    baseline = {tuple(r) for r in build().collect()}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = build()
        s = plan_summary(df)
        assert "bloom_filter_agg" in s["plan"], s["plan"]
        assert {tuple(r) for r in df.collect()} == baseline
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_metrics_explain_analyze(spark, sf_med):
    """The EXPLAIN-ANALYZE utility must report metrics from the plan
    that actually ran: scan rows match the table, the final aggregate's
    output rows match the query result, and the shuffle carried
    records."""
    from pyspark.sql import functions as F

    from collective_als_spark.plans import runtime_metrics
    from collective_als_spark.sources.testdata import load_table

    df = (
        load_table(spark, sf_med, "orders")
        .groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    metrics = runtime_metrics(df)
    n_groups = df.count()
    agg_rows = [
        m["value"]
        for m in metrics
        if m["node"] == "HashAggregate" and m["metric"] == "numOutputRows"
    ]
    # partial + final aggregate both report; the final one equals the
    # group count
    assert n_groups in agg_rows, (agg_rows, n_groups)
    shuffled = [
        m["value"]
        for m in metrics
        if m["node"] == "Exchange" and m["metric"] == "shuffleRecordsWritten"
    ]
    assert shuffled and all(v > 0 for v in shuffled), shuffled
    scans = [
        m["value"]
        for m in metrics
        if m["node"].startswith("Scan") and m["metric"] == "numOutputRows"
    ]
    assert load_table(spark, sf_med, "orders").count() in scans, scans
