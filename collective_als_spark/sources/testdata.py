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
        # and when the driver writes timestamp[us] instead (encoding has
        # varied by round), the NTZ→LTZ normalization below must read
        # naive wall-clocks as UTC to agree with DuckDB on any box tz
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a session-tz TIMESTAMP regardless of
    the driver's parquet encoding, which has varied across rounds:
    TIMESTAMP(NANOS) (read as ns-since-epoch long under
    spark.sql.legacy.parquet.nanosAsLong) and timestamp[us] without
    UTC-adjustment (read as TIMESTAMP_NTZ, which watermarks/windows
    reject). The session runs in UTC, so the NTZ→LTZ cast is
    value-identical to DuckDB's naive-timestamp view of the same file."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (enables the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
