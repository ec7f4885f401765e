"""Hyperparameter grid search for CollectiveALS — the model-selection
loop a reference user runs around ``CollectiveALS`` (reference surface:
``CollectiveALS.scala`` setters swept over rank/regParam; no tuning
helper exists in the reference, so this is new-build surface).

Spark-first shape: each candidate is one distributed fit + one
aggregate-only evaluation; the grid loop itself is driver-side control
flow over TINY (1-row) metric results — the same pattern as
``pyspark.ml.tuning.TrainValidationSplit``, without pulling in its
Estimator/Evaluator indirection for our non-Estimator CMF API.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import product

from pyspark.sql import DataFrame

from collective_als_spark.cmf.als import CollectiveALS
from collective_als_spark.operators.evaluation import regression_metrics


@dataclass
class GridResult:
    rank: int
    reg_param: float
    rmse: float
    mae: float
    n_scored: int


def grid_search_als(
    train: DataFrame,
    val: DataFrame,
    left_col: str,
    right_col: str,
    ranks: list[int],
    reg_params: list[float],
    rating_col: str = "rating",
    max_iter: int = 5,
    seed: int = 42,
    num_blocks: int | str = "auto",
    implicit_prefs: bool = False,
) -> list[GridResult]:
    """Fit one CollectiveALS per (rank, reg_param) on ``train``, score
    ``val``, and return per-candidate holdout metrics sorted best-first
    (min RMSE, ties by rank then reg for determinism).

    Scale: every fit is the full distributed ALS; the evaluation is a
    single aggregate (`regression_metrics`) so only a 1-row frame ever
    reaches the driver per candidate. Candidates run sequentially —
    each fit already saturates the cluster; parallel fits would just
    thrash executor memory (matches TrainValidationSplit's default
    parallelism=1 reasoning).
    """
    results: list[GridResult] = []
    for rank, reg in product(ranks, reg_params):
        als = CollectiveALS(
            left_col,
            right_col,
            rank=rank,
            max_iter=max_iter,
            reg_param=reg,
            seed=seed,
            num_blocks=num_blocks,
            implicit_prefs=implicit_prefs,
            rating_col=rating_col,
        )
        model = als.fit(train)
        scored = model.predict(val)
        m = regression_metrics(scored, label_col=rating_col).collect()[0]
        n = int(m["n"])
        results.append(
            GridResult(
                rank=rank,
                reg_param=reg,
                # every val pair cold-started -> nothing scored; rank
                # the candidate last instead of crashing
                rmse=float(m["rmse"]) if n > 0 else float("inf"),
                mae=float(m["mae"]) if n > 0 else float("inf"),
                n_scored=n,
            )
        )
    results.sort(key=lambda r: (r.rmse, r.rank, r.reg_param))
    return results
