"""Reproduce lake_identity_columns under a BARE SparkSession at
local[32] — the driver's acceptance shape (default confs: AQE on,
shuffle.partitions=200, 10MB broadcast threshold)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from collective_als_spark.queries.lake_queries import lake_identity_columns


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("REPRO_RUNS", "1"))
    con = duckdb.connect()
    n, n2 = con.execute(
        f"SELECT count(*), sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()
    tot = n + n2
    expect = {
        "n_total": tot,
        "rid_min": 10,
        "rid_max": 10 + 2 * (tot - 1),
        "rid_sum": tot * (10 + 10 + 2 * (tot - 1)) // 2,
        "rid_distinct": tot,
    }
    spark = SparkSession.builder.master(f"local[{cpus}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    bad = 0
    for run in range(runs):
        got = {r["step"]: r["value"] for r in lake_identity_columns(spark, sf_dir).collect()}
        for k, v in expect.items():
            ok = got.get(k) == v
            if not ok:
                bad += 1
                print(f"run {run} BAD {k}: got={got.get(k)} expect={v}")
        if all(got.get(k) == v for k, v in expect.items()):
            print(f"run {run} all OK")
    print("RESULT:", "FAIL" if bad else "PASS")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
