"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CMF query on sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator DataFrame builders and
matching DuckDB oracle SQL (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_SF_SMALL = "/root/testdata/sf0.001"


def _prepare(spark: SparkSession) -> None:
    """Configs the engine needs on a driver-provided session."""
    # events.ts is parquet TIMESTAMP(NANOS); Spark must read it as long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prepare(spark)
    from collective_als_spark.flagship import flagship

    return flagship(spark, _SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from collective_als_spark.registry import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only)."""
    from collective_als_spark.registry import oracle_queries

    return oracle_queries()
