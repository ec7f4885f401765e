"""The reference's core correctness check, rebuilt (SURVEY §5):
a 3-entity collective fit must produce metrics comparable to the stock
2-entity ALS baseline on the same chronological split — reference
MovieLensCollectiveALS.scala:9-51 vs MovieLensALS.scala:8-46.

Here: events -> (user, event_type) implicit strength ratings, side
relation (event_type, hour-of-day) occurrence counts."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from collective_als_spark.cmf import CollectiveALS
from collective_als_spark.operators.evaluation import regression_metrics
from collective_als_spark.operators.split import split_chronologically
from collective_als_spark.sources import load_table


def _prepare(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    type_dict = (
        ev.select("event_type").distinct()
        .withColumn("type_code", F.row_number().over(Window.orderBy("event_type")) - 1)
    )
    coded = ev.join(F.broadcast(type_dict), "event_type")
    train_ev, test_ev = split_chronologically(
        coded, [0.9, 0.1], "ts", tie_break=["event_id"]
    )

    def ratings(df):
        return df.groupBy("user_id", "type_code").agg(
            F.sum("value").cast("float").alias("rating")
        )

    side = coded.withColumn("hour_code", F.hour("ts")).groupBy(
        "type_code", "hour_code"
    ).agg(F.count(F.lit(1)).cast("float").alias("rating"))
    return ratings(train_ev).cache(), ratings(test_ev).cache(), side


def _rmse(model, test):
    scored = model.predict(
        test, "user_id", "type_code", left_col="user_id", right_col="type_code"
    )
    return regression_metrics(scored, "rating", "prediction").collect()[0].rmse


def test_collective_matches_baseline_on_events(spark, sf_small):
    train, test, side = _prepare(spark, sf_small)
    kw = dict(rank=8, max_iter=8, reg_param=0.05, seed=42, num_blocks=4)

    baseline = CollectiveALS("user_id", "type_code", **kw).fit(train)
    rmse_base = _rmse(baseline, test)

    collective = CollectiveALS("user_id", "type_code", "hour_code", **kw).fit(
        {("user_id", "type_code"): train, ("type_code", "hour_code"): side}
    )
    rmse_coll = _rmse(collective, test)

    # the collective extension must not break the factorization
    # (reference's acceptance criterion: metrics comparable)
    assert rmse_base > 0
    assert rmse_coll < rmse_base * 1.5, (rmse_base, rmse_coll)
