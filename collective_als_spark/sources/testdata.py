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


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin the two confs this engine's timestamp semantics depend on.

    Every session this engine runs in MUST use UTC session time — the
    duckdb oracle compares naive wall-clocks, and ``normalize_event_ts``
    relies on NTZ→LTZ casts being value-identical under UTC.
    ``session.get_spark`` sets both at creation; for externally-provided
    sessions (the driver's) this is applied at the FIRST ``load_table``
    call — before any frame from this engine exists — rather than as a
    per-events-load side effect that could retroactively change
    timestamp semantics of earlier frames mid-session."""
    # events.ts is parquet TIMESTAMP(NANOS) in some driver rounds,
    # unreadable without this
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a CPU-heavy map input up to the core
    count when its scan under-parallelizes (guide §2.6/§6: the bench's
    single-row-group parquet files plan as ONE scan task, so a
    map-only hash/decode chain otherwise runs serially while every
    other core idles). Scale-adaptive by construction: a scan that
    already has >= defaultParallelism splits is returned unchanged, so
    at 100 TB (thousands of file splits) this is a planner-side no-op
    and no shuffle is added. Results are unaffected — callers compute
    row-wise or key-aggregated values, never partition-placement-
    dependent ones."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
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
