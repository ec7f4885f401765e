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
    implicit_prefs: bool = False,
    alpha: float = 1.0,
    num_blocks: int = 32,
) -> DataFrame:
    """(id, features) for every distinct id in ``ratings[new_col]``,
    solved ridge-optimal against ``model``'s ``fixed_entity`` factors
    with ALS-WR λ·n regularization — the explicit and implicit
    (confidence-weighted, YtY-augmented) updates both match
    ``_fit_native``'s corresponding half-step."""
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
    a = float(alpha)
    yty = None
    if implicit_prefs:
        from collective_als_spark.cmf.als import CollectiveALS

        # k×k Gramian of the fixed factors, shipped in the closure —
        # same bounded collect as the fit loop (als.py::_compute_yty)
        yty = CollectiveALS._compute_yty(model.factors_for(fixed_entity))

    def solve_block(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"id": [], "features": []})
        order = np.argsort(pdf["id"].values, kind="stable")
        ids = pdf["id"].values[order]
        X = np.stack(pdf["_yf"].values[order]).astype(np.float64)
        r = pdf["rating"].values[order].astype(np.float64)
        if yty is None:
            uids, AtA, Atb, counts = S.build_normal_equations(ids, X, r)
            nexpl = counts.astype(np.float64)
        else:
            # implicit path, mirroring als.py::_fit_native solve_block:
            # confidence c1 = alpha*|r| on positive rows, target
            # (c1+1)/c1 so weight*target = c1+1; YtY added per id
            c1 = a * np.abs(r)
            pos = r > 0
            w = np.where(pos, c1, 0.0)
            tgt = np.divide(c1 + 1.0, c1, out=np.zeros_like(c1), where=c1 > 0)
            tgt = np.where(pos, tgt, 0.0)
            uids, AtA, Atb, _ = S.build_normal_equations(
                ids, X, np.ones_like(r), weights=w, targets=tgt
            )
            seg = np.searchsorted(uids, ids)
            nexpl = np.zeros(len(uids))
            np.add.at(nexpl, seg, pos.astype(np.float64))
            AtA += yty[None, :, :]
        lam = nexpl * reg  # ALS-WR
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
    nonnegative: bool = False,
    implicit_prefs: bool = False,
    alpha: float = 1.0,
    num_blocks: int = 32,
) -> DataFrame:
    """Score ``score_pairs`` (new_col, fixed_col) for entities folded in
    from ``history`` — the end-to-end cold-start serving call. The
    solver options (``implicit_prefs``/``alpha``/``nonnegative``/
    ``num_blocks``) are forwarded to :func:`fold_in` so serving for a
    model fit with implicit feedback solves the SAME confidence-weighted
    equations the fit did, not the explicit ones."""
    from collective_als_spark.functions.vector import dot

    newf = fold_in(
        model,
        history,
        new_col,
        fixed_entity,
        fixed_col,
        rating_col,
        reg_param,
        nonnegative=nonnegative,
        implicit_prefs=implicit_prefs,
        alpha=alpha,
        num_blocks=num_blocks,
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
