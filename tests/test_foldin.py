"""Fold-in correctness: folded factors must solve the per-entity ridge
normal equations exactly, and end-to-end cold-start serving must score
users the fitted model alone cannot."""

import numpy as np

from pyspark.sql import functions as F


def _toy_model(spark, rank=4, n_items=30, seed=11):
    from collective_als_spark.cmf.als import CollectiveALSModel

    rng = np.random.default_rng(seed)
    items = [(i, [float(x) for x in rng.normal(size=rank)]) for i in range(n_items)]
    f = spark.createDataFrame(items, "id int, features array<float>")
    return CollectiveALSModel(rank, ["user", "item"], {"user": f, "item": f})


def test_fold_in_solves_normal_equations(spark):
    from collective_als_spark.cmf.foldin import fold_in

    model = _toy_model(spark)
    rng = np.random.default_rng(5)
    rows = []
    for u in (1000, 1001, 1002):
        for i in rng.choice(30, size=12, replace=False):
            rows.append((u, int(i), float(rng.normal())))
    ratings = spark.createDataFrame(rows, "user_id int, item_id int, rating double")
    reg = 0.1
    folded = {
        r.id: np.array(r.features, dtype=np.float64)
        for r in fold_in(
            model, ratings, "user_id", "item", "item_id", reg_param=reg
        ).collect()
    }
    Y = {
        r.id: np.array(r.features, dtype=np.float64)
        for r in model.factors_for("item").collect()
    }
    by_u = {}
    for u, i, rr in rows:
        by_u.setdefault(u, []).append((i, rr))
    assert set(folded) == set(by_u)
    for u, obs in by_u.items():
        # float32 factor storage bounds the achievable precision
        X = np.stack([np.array(Y[i], dtype=np.float32).astype(np.float64) for i, _ in obs])
        r = np.array([v for _, v in obs])
        n = len(obs)
        A = X.T @ X + reg * n * np.eye(model.rank)
        want = np.linalg.solve(A, X.T @ r)
        assert np.allclose(folded[u], want, atol=1e-4), (u, folded[u], want)


def test_fold_in_predict_cold_start_end_to_end(spark, sf_small):
    from collective_als_spark.cmf.als import CollectiveALS
    from collective_als_spark.cmf.foldin import fold_in_predict
    from collective_als_spark.sources.testdata import load_table

    ev = load_table(spark, sf_small, "events").select(
        F.col("user_id").cast("int").alias("user"),
        F.pmod("event_id", F.lit(50)).cast("int").alias("item"),
        F.col("value").cast("float").alias("rating"),
    )
    train = ev.filter(F.col("user") % 7 != 0)
    cold = ev.filter(F.col("user") % 7 == 0)
    model = CollectiveALS(rank=4, max_iter=2, seed=1, num_blocks=8).fit(
        {("user", "item"): train}
    )
    pairs = cold.select(
        F.col("user").alias("user_id"), F.col("item").alias("item_id")
    ).distinct()
    # the fitted model alone: cold users yield NaN (no user factors)
    base = model.predict(pairs, "user", "item", "user_id", "item_id")
    assert all(
        r.prediction is None or np.isnan(r.prediction) for r in base.collect()
    )
    history = cold.select(
        F.col("user").alias("user_id"),
        F.col("item").alias("item_id"),
        "rating",
    )
    scored = fold_in_predict(
        model, history, pairs, "user_id", "item", "item_id"
    ).collect()
    assert scored
    assert all(
        r.prediction is not None and np.isfinite(r.prediction) for r in scored
    )


def test_fold_in_predict_forwards_implicit_options(spark):
    """Regression: fold_in_predict used to drop implicit_prefs/alpha,
    silently solving the explicit equations for implicit-fit models.
    Its scores must equal dot(fold_in(implicit factors), Y)."""
    from collective_als_spark.cmf.foldin import fold_in, fold_in_predict

    model = _toy_model(spark)
    rng = np.random.default_rng(13)
    alpha = 2.0
    rows = [
        (700, int(i), float(abs(rng.normal()) + 0.1))
        for i in rng.choice(30, size=10, replace=False)
    ]
    history = spark.createDataFrame(rows, "user_id int, item_id int, rating double")
    pairs = spark.createDataFrame(
        [(700, i) for i in range(5)], "user_id int, item_id int"
    )
    scored = {
        r.item_id: r.prediction
        for r in fold_in_predict(
            model,
            history,
            pairs,
            "user_id",
            "item",
            "item_id",
            implicit_prefs=True,
            alpha=alpha,
        ).collect()
    }
    fu = {
        r.id: np.array(r.features, dtype=np.float64)
        for r in fold_in(
            model, history, "user_id", "item", "item_id",
            implicit_prefs=True, alpha=alpha,
        ).collect()
    }[700]
    Y = {
        r.id: np.array(r.features, dtype=np.float32).astype(np.float64)
        for r in model.factors_for("item").collect()
    }
    for i in range(5):
        assert abs(scored[i] - float(fu @ Y[i])) < 1e-3, (i, scored[i])


def test_fold_in_implicit_solves_weighted_normal_equations(spark):
    """Implicit path: folded factors must solve
    (Y'Y + Y'(C-I)Y + lam*n_pos*I) x = Y'C p with c = alpha*|r| on
    positive rows — the Hu-Koren-Volinsky system _fit_native solves."""
    from collective_als_spark.cmf.foldin import fold_in

    model = _toy_model(spark)
    rng = np.random.default_rng(7)
    alpha, reg = 2.0, 0.1
    rows = []
    for u in (500, 501):
        for i in rng.choice(30, size=10, replace=False):
            rows.append((u, int(i), float(abs(rng.normal()) + 0.1)))
    ratings = spark.createDataFrame(rows, "user_id int, item_id int, rating double")
    folded = {
        r.id: np.array(r.features, dtype=np.float64)
        for r in fold_in(
            model,
            ratings,
            "user_id",
            "item",
            "item_id",
            reg_param=reg,
            implicit_prefs=True,
            alpha=alpha,
        ).collect()
    }
    Yall = {
        r.id: np.array(r.features, dtype=np.float32).astype(np.float64)
        for r in model.factors_for("item").collect()
    }
    YtY = sum(np.outer(v, v) for v in Yall.values())
    by_u = {}
    for u, i, rr in rows:
        by_u.setdefault(u, []).append((i, rr))
    for u, obs in by_u.items():
        X = np.stack([Yall[i] for i, _ in obs])
        c = alpha * np.abs(np.array([v for _, v in obs]))
        n_pos = len(obs)
        A = YtY + X.T @ (c[:, None] * X) + reg * n_pos * np.eye(model.rank)
        b = X.T @ (c + 1.0)  # targets p=1 with weight c: Y'(C)(p) + Y'p
        want = np.linalg.solve(A, b)
        assert np.allclose(folded[u], want, atol=1e-4), (u, folded[u], want)
