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
