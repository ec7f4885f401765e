"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32
threads, one JVM). The config choices are nonetheless cluster-shaped:
AQE on (runtime coalesce + skew-join handling), Arrow on (pandas-UDF
solver path), UTC session timezone (duckdb-oracle comparison), and a
shuffle-partition count that callers can widen for real clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "collective_als_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus != "*" else 32
    # Pre-size and pre-touch the initial heap (guide §5): with the
    # default 2 GB initial / 48 GB max, G1 grows the heap during every
    # allocation burst (pair-join hash aggregates, checkpoint blocks)
    # and uncommits it back after each concurrent cycle, so EVERY heavy
    # query re-pays first-touch page faults inside its stages — on
    # virtualized hosts with slow fault paths this measured 32 s of GC
    # wall in ONE stage (item_item_topk 10.6-15.6 s warm vs 3.5-4.5 s
    # with a pre-touched 8 GiB floor; fault rate ~1.1 GB/s there).
    # Paying the touch ONCE at JVM startup is the standard long-lived-
    # executor setup; SPARK_GRAFT_XMS sizes it (production executors
    # would set Xms = Xmx).
    xms = os.environ.get("SPARK_GRAFT_XMS", "8g")
    jvm_opts = f"-Xms{xms} -XX:+AlwaysPreTouch" if xms not in ("", "0") else ""
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # driver testdata stores events.ts as parquet TIMESTAMP(NANOS);
        # Spark has no nanos timestamp — read as long, convert in loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if jvm_opts:
        builder = builder.config("spark.driver.extraJavaOptions", jvm_opts)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
