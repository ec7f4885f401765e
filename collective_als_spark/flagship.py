"""Flagship end-to-end query: events → implicit ratings → chronological
split → ALS fit → score the held-out slice.

Exercises, in one plan: parquet scan (S3), projection + casts (P1/P7),
dictionary build via distinct + window (A8), aggregation (A1-analog),
chronological split (W1), CMF fit (M1-M4), prediction joins + dot
product (M5 = J1 + F4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collective_als_spark.cmf import CollectiveALS
from collective_als_spark.operators.dictionary import dense_codes
from collective_als_spark.operators.split import split_chronologically
from collective_als_spark.sources import load_table


def flagship(
    spark: SparkSession,
    sf_dir: str,
    rank: int = 8,
    max_iter: int = 5,
    num_blocks: int | str = "auto",
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    # dictionary: event_type -> dense code (reference genre-dictionary
    # pattern, MovieLensCollectiveALS.scala:16-25, minus the collect)
    type_dict = dense_codes(events, "event_type", "type_code")
    coded = events.join(F.broadcast(type_dict), "event_type")

    # Approx quantile cuts (exact=False): the fully-parallel split — no
    # global rank at all. Exact rank cuts are only needed where an
    # oracle demands them (chrono_split_sizes).
    train_ev, test_ev = split_chronologically(
        coded, [0.9, 0.1], "ts", tie_break=["event_id"], exact=False
    )

    def to_ratings(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id", "type_code").agg(
            F.sum("value").cast("float").alias("rating")
        )

    train, test = to_ratings(train_ev), to_ratings(test_ev)

    als = CollectiveALS(
        "user_id",
        "type_code",
        rank=rank,
        max_iter=max_iter,
        reg_param=0.1,
        seed=42,
        num_blocks=num_blocks,
    )
    model = als.fit(train)
    scored = model.predict(test)
    return scored.select(
        "user_id", "type_code", "rating", F.col("prediction")
    ).filter(~F.isnan("prediction"))
