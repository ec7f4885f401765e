"""S1/S2/S5: CSV round-trip with explicit schema, multi-table loader,
text report sink."""

import tempfile

from pyspark.sql import functions as F

from collective_als_spark.sources import load_table
from collective_als_spark.sources.files import load_dataset, read_csv, write_text_report


def test_csv_roundtrip(spark, sf_med):
    li = load_table(spark, sf_med, "lineitem").limit(500)
    with tempfile.TemporaryDirectory() as d:
        li.select("l_orderkey", "l_quantity", "l_returnflag").write.mode(
            "overwrite"
        ).csv(f"{d}/li", header=True)
        back = read_csv(
            spark, f"{d}/li",
            schema="l_orderkey bigint, l_quantity double, l_returnflag string",
        )
        assert back.count() == 500
        assert dict(back.dtypes) == {
            "l_orderkey": "bigint", "l_quantity": "double", "l_returnflag": "string",
        }


def test_multi_table_loader(spark, sf_med):
    tables = load_dataset(
        spark, sf_med,
        {"region": None, "nation": None, "customer": None, "orders": None},
        fmt="parquet",
    )
    assert set(tables) == {"region", "nation", "customer", "orders"}
    assert tables["region"].count() == 5


def test_text_report_sink(spark, sf_med):
    m = (
        load_table(spark, sf_med, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.concat_ws(" = ", "o_orderstatus", "n").alias("line"))
    )
    with tempfile.TemporaryDirectory() as d:
        write_text_report(m, f"{d}/report")
        lines = spark.read.text(f"{d}/report").collect()
        assert len(lines) == 3
        assert all("=" in r.value for r in lines)


def test_orc_roundtrip(spark, sf_med):
    from collective_als_spark.sources.files import read_orc, write_orc

    orders = load_table(spark, sf_med, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    with tempfile.TemporaryDirectory() as d:
        write_orc(orders, f"{d}/orders_orc")
        back = read_orc(spark, f"{d}/orders_orc")
        assert back.schema == orders.schema
        assert back.count() == orders.count()
        # predicate pushdown reaches the ORC scan
        plan = back.filter(F.col("o_orderkey") == 7)._jdf.queryExecution().executedPlan().toString()
        assert "orc" in plan.lower()


def test_compact_small_files(spark, sf_med):
    import glob

    from collective_als_spark.sources.files import compact_small_files

    orders = load_table(spark, sf_med, "orders").select("o_orderkey", "o_totalprice")
    n = orders.count()
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders_many"
        orders.repartition(40).write.parquet(path)
        assert len(glob.glob(f"{path}/part-*")) == 40
        n_files = compact_small_files(spark, path, target_rows_per_file=n // 2 + 1)
        assert n_files == 2
        assert len(glob.glob(f"{path}/part-*")) == 2
        assert spark.read.parquet(path).count() == n


def test_parquet_merge_schema_evolution(spark, sf_med):
    """Schema evolution: files written with extra columns merge under
    mergeSchema=true (missing values NULL) — the append-only column
    evolution a long-lived lake table needs."""
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/evolving"
        spark.range(5).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(p)
        spark.range(5, 8).select(
            F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
        ).write.mode("append").parquet(p)
        merged = spark.read.option("mergeSchema", "true").parquet(p)
        assert set(merged.columns) == {"id", "v1", "v2"}
        assert merged.count() == 8
        assert merged.filter(F.col("v2").isNull()).count() == 5


def test_export_training_shards(spark, sf_med):
    """Shard export: stable assignment, every doc exactly once, one
    file per shard, manifest totals match the data read back."""
    import glob
    import hashlib

    from collective_als_spark.sources.files import export_training_shards

    docs = spark.read.parquet(f"{sf_med}/documents.parquet")
    n = docs.count()
    with tempfile.TemporaryDirectory() as d:
        manifest = export_training_shards(docs, d, n_shards=8).collect()
        assert sorted(r["shard"] for r in manifest) == sorted(
            {r["shard"] for r in manifest}
        )
        assert sum(r["n_docs"] for r in manifest) == n
        back = spark.read.json(f"{d}/shards")
        assert back.count() == n
        # stable md5-mod assignment, verified independently
        for r in back.select("doc_id", "shard").limit(100).collect():
            expect = int(
                hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16
            ) % 8
            assert r["shard"] == expect
        # one data file per shard directory
        for r in manifest:
            files = [
                f
                for f in glob.glob(f"{d}/shards/shard={r['shard']}/part-*")
                if not f.endswith(".crc")
            ]
            assert len(files) == 1, files
        # manifest token totals match a recount over the round-trip
        recount = {
            row["shard"]: (row["nd"], row["nt"])
            for row in back.groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("nd"),
                F.sum(F.size(F.split("text", " "))).alias("nt"),
            )
            .collect()
        }
        for r in manifest:
            assert recount[r["shard"]] == (r["n_docs"], r["n_tokens"])
