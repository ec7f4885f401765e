from collective_als_spark.flagship import flagship


def test_flagship_runs(spark, sf_small):
    df = flagship(spark, sf_small, rank=4, max_iter=2)
    rows = df.limit(5).collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"user_id", "type_code", "rating", "prediction"}
    assert df.count() > 0
