"""Semantic tests for operators beyond oracle parity: LSH recall,
as-of edge cases, approx split, multimodal stub behavior."""

import pytest
from pyspark.sql import functions as F

from collective_als_spark.operators.asof import asof_join
from collective_als_spark.operators.similarity import brute_force_topk, lsh_topk
from collective_als_spark.operators.split import split_chronologically
from collective_als_spark.sources import load_table


def test_lsh_recall_vs_brute_force(spark, sf_med):
    emb = load_table(spark, sf_med, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 50)
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_topk(emb, k=5, n_planes=4, n_tables=8)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.filter(F.col("query_id") < 50).collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.5, f"LSH recall too low: {recall}"


def test_asof_no_prior_match_is_null(spark):
    left = spark.createDataFrame([(1, 100, "p1"), (1, 5, "p0")], "k int, t int, pid string")
    right = spark.createDataFrame([(1, 50, "c1"), (1, 99, "c2"), (2, 1, "cx")],
                                  "k int, t int, cid string")
    out = asof_join(left, right, key="k", left_ts="t", right_ts="t",
                    right_payload=["cid"], tie_break="pid")
    rows = {r.pid: r.asof_cid for r in out.collect()}
    assert rows == {"p1": "c2", "p0": None}


def test_asof_equal_ts_inclusive(spark):
    left = spark.createDataFrame([(1, 50, "p")], "k int, t int, pid string")
    right = spark.createDataFrame([(1, 50, "c")], "k int, t int, cid string")
    out = asof_join(left, right, key="k", left_ts="t", right_ts="t",
                    right_payload=["cid"])
    assert out.collect()[0].asof_cid == "c"


def test_split_approx_mode(spark, sf_med):
    ev = load_table(spark, sf_med, "events")
    train, test = split_chronologically(ev, [0.8, 0.2], "ts", exact=False)
    n, tr, te = ev.count(), train.count(), test.count()
    assert tr + te == n
    assert abs(tr / n - 0.8) < 0.05
    # no time overlap
    assert train.agg(F.max("ts")).collect()[0][0] <= test.agg(F.min("ts")).collect()[0][0]


def test_multimodal_decode_stub():
    from collective_als_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_checked_cast_overflow_raises(spark):
    # reference checkedCast semantics (CollectiveALS.scala:85-92):
    # out-of-Int-range and fractional values error instead of wrapping
    from pyspark.sql import functions as F

    from collective_als_spark.functions.vector import checked_cast

    ok = spark.createDataFrame([(1.0,), (-2147483648.0,), (2147483647.0,), (None,)], "v double")
    got = [r[0] for r in ok.select(checked_cast("v").alias("i")).collect()]
    assert got == [1, -2147483648, 2147483647, None]

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    for bad in [2147483648.0, -2147483649.0, 1.5]:
        df = spark.createDataFrame([(bad,)], "v double")
        with _pytest.raises((PySparkException, Py4JJavaError)):
            df.select(checked_cast("v").alias("i")).collect()
