"""Model-evaluation operators: regression metrics and ranking metrics @k.

Reference surface:
  - RMSE/MAE via Spark MLlib ``RegressionMetrics`` (reference
    ``MovieLensALS.scala:41-45``) → plain SQL aggregates here.
  - Precision/Recall/F1/NDCG/MAP @ {5,10,20,50,100} via the external
    ``SparkRankingMetrics`` dependency (reference ``IHRALS.scala:43-57``,
    ``build.sbt:12``) → reimplemented natively with partitioned windows
    + groupBy; no collect, fully parallel over users.

Scale: everything is one shuffle on the user key plus map-side
aggregation; no driver-side loops, no cross joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def regression_metrics(
    df: DataFrame, label_col: str = "rating", pred_col: str = "prediction"
) -> DataFrame:
    """RMSE / MSE / MAE / count in one aggregate pass."""
    err = F.col(pred_col) - F.col(label_col)
    return df.filter(~F.isnan(pred_col)).agg(
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.avg(err * err).alias("mse"),
        F.avg(F.abs(err)).alias("mae"),
        F.count(F.lit(1)).alias("n"),
    )


def ranking_metrics(
    predictions: DataFrame,
    ground_truth: DataFrame,
    user_col: str,
    item_col: str,
    pred_col: str,
    ks: list[int] = (5, 10, 20, 50, 100),
) -> DataFrame:
    """Precision/Recall/F1/NDCG/MAP @k, averaged over users.

    ``predictions``: (user, item, score) candidate rankings.
    ``ground_truth``: (user, item) relevant pairs (binary relevance).
    Users with no relevant items are excluded (standard convention).

    Plan shape: rank candidates per user (one window shuffle on user),
    left-join relevance (broadcast or shuffle as Catalyst picks),
    then two groupBys (user, then global) — all map-side combinable.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(pred_col).desc(), F.col(item_col)
    )
    ranked = predictions.withColumn("_pos", F.row_number().over(w))

    truth = ground_truth.select(
        F.col(user_col).alias("_tu"), F.col(item_col).alias("_ti")
    ).distinct()
    n_rel = truth.groupBy("_tu").agg(F.count(F.lit(1)).alias("_n_rel"))

    hits = ranked.join(
        truth,
        (ranked[user_col] == F.col("_tu")) & (ranked[item_col] == F.col("_ti")),
        "left",
    ).withColumn("_hit", F.col("_ti").isNotNull().cast("double"))

    max_k = max(ks)
    hits = hits.filter(F.col("_pos") <= max_k)

    # per-user cumulative hit count and AP numerator at each position
    wc = Window.partitionBy(user_col).orderBy("_pos")
    hits = hits.withColumn("_cum_hits", F.sum("_hit").over(wc)).withColumn(
        "_prec_at_pos", F.col("_cum_hits") / F.col("_pos")
    )

    # ALL ks in one grouped pass: conditional aggregates per k, so the
    # plan has a constant number of exchanges regardless of len(ks)
    # (the groupBy(user) reuses the window's partitioning — no extra
    # shuffle), then inline() per-k rows and a tiny final groupBy(k).
    aggs = []
    for k in ks:
        in_k = F.col("_pos") <= F.lit(k)
        aggs += [
            F.sum(F.when(in_k, F.col("_hit")).otherwise(0.0)).alias(f"_hits_{k}"),
            F.sum(
                F.when(in_k & (F.col("_hit") > 0), F.col("_prec_at_pos")).otherwise(0.0)
            ).alias(f"_ap_{k}"),
            F.sum(
                F.when(in_k & (F.col("_hit") > 0),
                       F.lit(1.0) / F.log2(F.col("_pos") + 1)).otherwise(0.0)
            ).alias(f"_dcg_{k}"),
        ]
    per_user = hits.groupBy(user_col).agg(*aggs).join(
        n_rel, F.col(user_col) == F.col("_tu"), "inner"
    )

    structs = []
    for k in ks:
        # ideal DCG: hits fill the top min(k, n_rel) positions;
        # sum_{i=1..m} 1/log2(i+1) has no closed form -> sequence fold
        ideal_n = F.least(F.lit(k), F.col("_n_rel"))
        idcg = F.aggregate(
            F.transform(
                F.sequence(F.lit(1), ideal_n),
                lambda i: F.lit(1.0) / F.log2(i.cast("double") + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        prec = F.col(f"_hits_{k}") / F.lit(k)
        rec = F.col(f"_hits_{k}") / F.col("_n_rel")
        f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
        structs.append(
            F.struct(
                F.lit(k).alias("k"),
                prec.alias("_p"),
                rec.alias("_r"),
                f1.alias("_f1"),
                (F.col(f"_dcg_{k}") / idcg).alias("_ndcg"),
                (F.col(f"_ap_{k}") / ideal_n).alias("_ap"),
            )
        )
    exploded = per_user.select(F.inline(F.array(*structs)))
    return (
        exploded.groupBy("k")
        .agg(
            F.avg("_p").alias("precision"),
            F.avg("_r").alias("recall"),
            F.avg("_f1").alias("f1"),
            F.avg("_ndcg").alias("ndcg"),
            F.avg("_ap").alias("map"),
        )
        .orderBy("k")
    )
