"""Time-window operators: tumbling aggregation (batch + Structured
Streaming) and gap-based sessionization.

The reference has NO streaming surface (SURVEY §2.11 — the only trace
is an unused ``streaming.blockInterval`` config key). These are
new-build capabilities: ``F.window`` tumbling aggregates, watermarked
streaming equivalents, and lag+cumsum sessionization (the batch analog
of ``F.session_window``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide`` < ``width``, sliding/hopping)
    window count/sum per key (batch). Sliding windows overlap, so each
    row lands in width/slide windows — Spark expands this map-side;
    the shuffle is still one groupBy on (window, key)."""
    return (
        events.groupBy(F.window(ts_col, width, slide or width).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_v"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            key_col,
            "n",
            "total_v",
        )
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessions per user via lag + cumulative sum — the
    classic batch sessionization (engine-portable; same algorithm as
    the oracle SQL). Returns one row per session."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    ms = F.unix_millis(F.col(ts_col))
    gap_ms = gap_minutes * 60 * 1000
    with_break = events.withColumn(
        "_new_session",
        F.when(
            (ms - F.lag(ms).over(w)).isNull() | ((ms - F.lag(ms).over(w)) > gap_ms), 1
        ).otherwise(0),
    )
    with_sid = with_break.withColumn(
        "_session_no", F.sum("_new_session").over(w)
    )
    return (
        with_sid.groupBy(user_col, "_session_no")
        .agg(
            F.min(ms).alias("session_start_ms"),
            F.max(ms).alias("session_end_ms"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_v"),
        )
        .select(
            user_col,
            F.col("_session_no").cast("bigint").alias("session_no"),
            "session_start_ms",
            "session_end_ms",
            "n_events",
            "total_v",
        )
    )


def streaming_tumbling_agg(
    spark: SparkSession,
    sf_dir: str,
    width: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Structured Streaming version of ``tumbling_agg`` (sliding when
    ``slide`` is given) driven to completion against the parquet events
    table via the memory sink.

    Pattern: readStream → withWatermark → windowed agg → memory sink →
    ``processAllAvailable`` (synchronous for smoke/testing; on a real
    cluster the same plan runs against kafka with a real trigger)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # raw on-disk schema (ts = ns-since-epoch long under nanosAsLong)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file-stream source requires a directory; glob-filter to the events file
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    from collective_als_spark.sources.testdata import normalize_event_ts

    stream = normalize_event_ts(stream)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide or width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_v"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "total_v",
        )
    )
    name = "stream_tumbling_out"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
