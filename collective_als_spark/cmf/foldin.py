"""Fold-in: factors for entities unseen at fit time, without refitting.

The serving gap in ``pyspark.ml.recommendation.ALS`` (SPARK-20894
territory): a user who signs up after the nightly fit gets NaN from
``predict`` until the next refit. Fold-in solves that user's ridge
normal equations against the FIXED other-side factors — exactly the
final half-step of the ALS loop (``als.py::_fit_native`` solve_block,
explicit path), so a folded-in entity with the same interactions gets
the same factors the full fit would have produced for it in its last
update.

Scale: one join of the new interactions against the fixed factor table
(keyed on the fixed entity's id; broadcastable when the catalog side
is), then one block-hashed ``applyInPandas`` solve — identical shape to
a single `_fit_native` entity update, touching ONLY the new ids' rows.

Reference parity: the reference has no incremental path
(CollectiveALS.scala fits monolithically); this extends the model
surface the way production ALS deployments do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from collective_als_spark.cmf import solver as S
from collective_als_spark.cmf.als import CollectiveALSModel

_FACTOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def fold_in(
    model: CollectiveALSModel,
    ratings: DataFrame,
    new_col: str,
    fixed_entity: str,
    fixed_col: str,
    rating_col: str = "rating",
    reg_param: float = 0.1,
    nonnegative: bool = False,
    num_blocks: int = 32,
) -> DataFrame:
    """(id, features) for every distinct id in ``ratings[new_col]``,
    solved ridge-optimal against ``model``'s ``fixed_entity`` factors
    with ALS-WR λ·n regularization (matching ``_fit_native``'s
    explicit-path update)."""
    Y = model.factors_for(fixed_entity).select(
        F.col("id").alias("_fid"), F.col("features").alias("_yf")
    )
    joined = ratings.select(
        F.col(new_col).cast("int").alias("id"),
        F.col(fixed_col).cast("int").alias("_fid"),
        F.col(rating_col).cast("double").alias("rating"),
    ).join(Y, "_fid")

    reg = float(reg_param)
    nonneg = bool(nonnegative)

    def solve_block(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"id": [], "features": []})
        order = np.argsort(pdf["id"].values, kind="stable")
        ids = pdf["id"].values[order]
        X = np.stack(pdf["_yf"].values[order]).astype(np.float64)
        r = pdf["rating"].values[order].astype(np.float64)
        uids, AtA, Atb, counts = S.build_normal_equations(ids, X, r)
        lam = counts.astype(np.float64) * reg  # ALS-WR
        if nonneg:
            sol = S.solve_nnls(AtA, Atb, lam)
        else:
            sol = S.solve_cholesky(AtA, Atb, lam)
        return pd.DataFrame(
            {"id": uids.astype(np.int32), "features": list(sol.astype(np.float32))}
        )

    return (
        joined.groupBy(F.pmod(F.hash("id"), F.lit(num_blocks)).alias("_blk"))
        .applyInPandas(lambda key, pdf: solve_block(pdf), _FACTOR_SCHEMA)
    )


def fold_in_predict(
    model: CollectiveALSModel,
    history: DataFrame,
    score_pairs: DataFrame,
    new_col: str,
    fixed_entity: str,
    fixed_col: str,
    rating_col: str = "rating",
    reg_param: float = 0.1,
    prediction_col: str = "prediction",
) -> DataFrame:
    """Score ``score_pairs`` (new_col, fixed_col) for entities folded in
    from ``history`` — the end-to-end cold-start serving call."""
    from collective_als_spark.functions.vector import dot

    newf = fold_in(
        model, history, new_col, fixed_entity, fixed_col, rating_col, reg_param
    )
    Y = model.factors_for(fixed_entity)
    return (
        score_pairs.join(
            newf.select(F.col("id").alias(new_col), F.col("features").alias("_nf")),
            new_col,
            "left",
        )
        .join(
            Y.select(F.col("id").alias(fixed_col), F.col("features").alias("_yf")),
            fixed_col,
            "left",
        )
        .withColumn(prediction_col, dot(F.col("_nf"), F.col("_yf")).cast("float"))
        .drop("_nf", "_yf")
    )
