"""Generic file sources & sinks beyond parquet.

Reference equivalents: classpath CSV scan with typed case-class rows
(``MovieLens.scala:21-30``), 4-table dataset loader (``:32-41``), raw
text metrics sink (``IHRCollectiveALS.scala:91-94``).

Spark-first rules: explicit schemas (no inferSchema in production —
inference scans the data twice), parquet for anything large, text sink
via the DataFrame writer so it distributes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """S1: typed CSV scan with explicit schema (never inferSchema)."""
    return spark.read.csv(path, schema=schema, header=header, sep=sep)


def load_dataset(
    spark: SparkSession, base: str, tables: dict[str, T.StructType | str],
    fmt: str = "csv", **options
) -> dict[str, DataFrame]:
    """S2: multi-table dataset loader (MovieLens-style links/movies/
    ratings/tags in one call)."""
    out = {}
    for name, schema in tables.items():
        if fmt == "csv":
            out[name] = read_csv(spark, f"{base}/{name}.csv", schema, **options)
        elif fmt == "parquet":
            out[name] = spark.read.parquet(f"{base}/{name}.parquet")
        else:
            raise ValueError(f"unsupported format {fmt!r}")
    return out


def write_text_report(df: DataFrame, path: str) -> None:
    """S5: text sink — one string column written as text files
    (distributed; coalesce(1) only for small reports)."""
    if len(df.columns) != 1:
        raise ValueError("text sink requires exactly one string column")
    df.coalesce(1).write.mode("overwrite").text(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    """JSON lines scan with explicit schema (schema inference over JSON
    is a full extra pass — never in production)."""
    return spark.read.json(path, schema=schema, **options)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON lines sink (distributed, one file per partition)."""
    df.write.mode(mode).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet sink. At 100 TB this is the layout
    lever: readers filtering on ``partition_cols`` prune whole
    directories before any IO (partition pruning shows as
    ``PartitionFilters`` in the scan node)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink (``bucketBy`` requires saveAsTable).

    Bucketing pre-shuffles data once at write time; joins/aggregations
    between tables bucketed on the same key with the same bucket count
    then run with ZERO exchanges — the 100 TB co-located-join strategy
    (the DataFrame analog of the reference's fixed ``ALSPartitioner``
    grid, CollectiveALS.scala:333-339, persisted to storage)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (native vectorized reader; predicate pushdown and
    column pruning work like parquet's)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a directory of many small files
    into ceil(total_rows / target_rows_per_file) files.

    The perpetual maintenance job of a 100 TB lake — streaming ingest
    and fine-grained partitioning leave thousands of KB-sized files
    whose open/footer cost dominates scans. One pass: count, choose the
    file count, repartition (round-robin, no key skew), overwrite to a
    staging dir and swap. Returns the new file count.

    Swap protocol (crash-safe ordering): (1) write staging, (2) verify
    the staging row count equals the source's, (3) move the original
    aside, (4) move staging into place, (5) delete the old copy last.
    A crash at any step leaves the data recoverable — either the
    canonical path still holds the original, or both copies exist;
    the original is never destroyed before the replacement is in
    place. ``shutil.move`` is used for cross-filesystem safety."""
    import math
    import shutil

    df = spark.read.format(fmt).load(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    staging = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").format(fmt).save(staging)
    n_staged = spark.read.format(fmt).load(staging).count()
    if n_staged != n:
        shutil.rmtree(staging)
        raise RuntimeError(
            f"compact_small_files: staging row count {n_staged} != source {n}; "
            f"original left untouched at {path}"
        )
    old = path.rstrip("/") + "__precompact"
    shutil.move(path, old)
    shutil.move(staging, path)
    shutil.rmtree(old)
    return n_files


def export_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    fmt: str = "json",
) -> DataFrame:
    """Training-data export sink: write the corpus as ``n_shards``
    deterministic shards plus a manifest — the hand-off format an LLM
    trainer's data loader consumes (fixed shard count, stable doc→shard
    assignment, per-shard doc/token counts for length-aware scheduling).

    Shard assignment is md5-hash-mod on the id column (engine-,
    partitioning- and run-stable — the same rule as the deterministic
    sampler), each shard written as one file via in-partition grouping:
    ``repartition(n_shards, shard)`` lines docs up so every task writes
    exactly its shard's docs (hash-partitioning on the shard key is a
    1:1 task↔shard mapping when n_shards == numPartitions). The
    manifest is computed with one aggregate and written next to the
    shards.

    Returns the manifest DataFrame (shard, n_docs, n_tokens).
    """
    from pyspark.sql import functions as F

    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(n_shards),
    ).cast("int")
    with_shard = df.withColumn("shard", shard)
    writer = (
        with_shard.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if fmt == "json":
        writer.json(f"{path}/shards")
    elif fmt == "parquet":
        writer.parquet(f"{path}/shards")
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    manifest = (
        with_shard.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").json(f"{path}/manifest")
    return manifest
