"""Driver-visible lake-tier queries: the snapshot table's commit
protocol exercised END TO END under the DuckDB oracle.

The lifecycle query runs the real machinery (CAS commits, manifest
stats, copy-on-write merge/delete, time travel) against a scratch
table built from the driver's own ``orders`` parquet, measures the
row counts the protocol produces, and the ORACLE computes what those
counts MUST be directly from ``orders`` — so a correctness bug
anywhere in the commit core (lost commit, torn manifest, merge
dropping or duplicating rows, delete touching out-of-band rows,
time travel reading the wrong file set) flips the hash red.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collective_als_spark.registry import register
from collective_als_spark.sources.testdata import load_table


@register(
    "lake_snapshot_lifecycle",
    oracle="""
    WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
               CAST(sum(CASE WHEN o_orderkey % 1000 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_upd
        FROM orders
    )
    SELECT 'v1_append_low' AS step, CAST(1 AS INTEGER) AS version, n_low AS n_rows FROM c
    UNION ALL SELECT 'v2_append_high', CAST(2 AS INTEGER), n_total FROM c
    UNION ALL SELECT 'v3_merge_mark', CAST(3 AS INTEGER), n_total FROM c
    UNION ALL SELECT 'v4_delete_marked', CAST(4 AS INTEGER), n_total - n_upd FROM c
    UNION ALL SELECT 'time_travel_v2', CAST(2 AS INTEGER), n_total FROM c
    """,
)
def lake_snapshot_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append -> append (schema'd commits with per-file stats) ->
    copy-on-write MERGE (mark rows by setting a sentinel price) ->
    copy-on-write DELETE of the marked band -> time travel back.

    Every count is measured THROUGH the snapshot reads (manifest file
    lists, not directory scans); the oracle derives the same numbers
    from the orders table algebraically. Protocol invariants this
    pins under the driver: appends accumulate exactly once (CAS, no
    lost/duplicated commit), merge replaces matched keys 1:1 (count
    invariant), delete removes exactly the in-band rows, and the v2
    manifest still reproduces the pre-merge table afterwards.

    The scratch table lives in a temp dir, built fresh per run (the
    work is a handful of commits over two orders columns); all counts
    are collected eagerly, so the dir is removed before returning."""
    from collective_als_spark.sources.layout import SnapshotTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="lake_lifecycle_")
    try:
        t = SnapshotTable(
            spark,
            f"{root}/tbl",
            stats_columns=["o_orderkey", "o_totalprice"],
            # the merge step goes through the bloom point-key pruning
            # path; pruning is a pure optimization, so the oracle's
            # algebraic counts pin that it stays one
            bloom_columns=["o_orderkey"],
        )
        t.append(orders.filter(F.col("o_totalprice") < 100000))
        n1 = t.read().count()
        t.append(orders.filter(F.col("o_totalprice") >= 100000))
        n2 = t.read().count()
        marks = orders.filter(F.col("o_orderkey") % 1000 == 0).withColumn(
            "o_totalprice", F.lit(-1.0)
        )
        t.merge(marks, "o_orderkey")
        n3 = t.read().count()
        t.delete_where("o_totalprice", -10.0, -1.0)
        n4 = t.read().count()
        n_tt = t.read(version=2).count()
        rows = [
            ("v1_append_low", 1, n1),
            ("v2_append_high", 2, n2),
            ("v3_merge_mark", 3, n3),
            ("v4_delete_marked", 4, n4),
            ("time_travel_v2", 2, n_tt),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "step string, version int, n_rows bigint"
    )
