"""Query registry: every operator exposed to the driver's correctness
gate lives here as a (spark_fn, oracle_sql) pair.

``spark_fn(spark, sf_dir) -> DataFrame`` builds the DataFrame plan;
``oracle`` is equivalent DuckDB SQL over the pre-registered views.
Column names/aliases must match exactly (the driver sorts columns by
name and hashes values). Non-SQL-expressible entries set oracle=None
and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Entry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


_REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _REGISTRY[name] = Entry(fn, oracle)
        return fn

    return deco


def _ensure_loaded() -> None:
    # import for side effect: modules register their queries
    from collective_als_spark import queries as _q  # noqa: F401


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: e.fn for name, e in _REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    _ensure_loaded()
    return {name: e.oracle for name, e in _REGISTRY.items() if e.oracle is not None}
