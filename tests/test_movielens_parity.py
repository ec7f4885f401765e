"""The reference's core correctness check, reproduced on its own data:
3-entity collective fit vs stock ALS on MovieLens ml-latest-small
(reference MovieLensALS.scala:8-46, MovieLensCollectiveALS.scala:9-51).
"""

import os

import pytest

ML = "/root/reference/src/test/resources/ml-latest-small"


@pytest.mark.skipif(not os.path.isdir(ML), reason="ml-latest-small not present")
def test_movielens_collective_parity_with_stock_als(spark):
    from collective_als_spark.movielens import movielens_parity

    rows = {r.model: r for r in movielens_parity(spark).collect()}
    base, coll = rows["als_baseline"], rows["collective_3entity"]
    print(
        f"\nALS baseline:        RMSE={base.rmse} MAE={base.mae} n={base.n_pairs}"
        f"\ncollective 3-entity: RMSE={coll.rmse} MAE={coll.mae} n={coll.n_pairs}"
        f"\ncommon {base.n_common} pairs:  RMSE {base.rmse_common} vs {coll.rmse_common}"
        f" | MAE {base.mae_common} vs {coll.mae_common}"
    )
    # dataset sanity: ~1% chronological holdout of 100,004 ratings;
    # the chronological tail is cold-heavy, so stock ALS scores roughly
    # half the ~1000 held-out pairs (the rest are NaN cold starts)
    assert 400 <= base.n_pairs <= 800
    assert base.n_common == coll.n_common
    # the collective model must score MORE pairs: the genre relation
    # gives factors to movies unseen in ratings-train (CMF's point)
    assert coll.n_pairs > base.n_pairs
    # the reference's acceptance: collective RMSE/MAE comparable to the
    # stock-ALS baseline on the same pairs (within 5%)
    assert coll.rmse_common <= base.rmse_common * 1.05, (
        coll.rmse_common,
        base.rmse_common,
    )
    assert coll.mae_common <= base.mae_common * 1.10, (coll.mae_common, base.mae_common)
    # both models are real fits, not degenerate output
    assert 0.5 < base.rmse_common < 2.0
    assert 0.5 < coll.rmse_common < 2.0
