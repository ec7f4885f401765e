"""Readers for the driver's TPC-H-ish parquet testdata.

The reference loads data through classpath CSV scans and Hive tables
(reference ``MovieLens.scala:25-30``, ``IHRALS.scala:27-31``); here the
equivalent sources are parquet directories per TESTDATA.md. Parquet
scans give Catalyst predicate pushdown + column pruning for free —
filters and projections written by callers reach the scan node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # must hold on ANY session (the driver provides its own):
        # events.ts is parquet TIMESTAMP(NANOS), unreadable without this
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) read as ns-since-epoch long
        # (spark.sql.legacy.parquet.nanosAsLong); restore a real timestamp
        # at microsecond precision
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (enables the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
