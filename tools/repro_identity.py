"""Reproduce the lake_identity_columns driver failure at local[32].

Runs the registered query and prints each measurement row next to the
closed-form expectation computed directly from the parquet input.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from collective_als_spark.session import get_spark
from collective_als_spark.queries.lake_queries import lake_identity_columns


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark = get_spark("repro_identity")
    bad = 0
    for run in range(runs):
        got = {r["step"]: r["value"] for r in lake_identity_columns(spark, sf_dir).collect()}
        for k, v in expect.items():
            mark = "OK " if got.get(k) == v else "BAD"
            if got.get(k) != v:
                bad += 1
            print(f"run {run} {mark} {k}: got={got.get(k)} expect={v}")
    print("RESULT:", "FAIL" if bad else "PASS")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
