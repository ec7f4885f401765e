"""Replicate the driver's t2 gate: first DRIVER_CAP registered queries
in registration order, one bare local[N] session, oracle compare."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from tests.oracle_harness import compare
from collective_als_spark.registry import (
    DRIVER_CAP, oracle_queries, spark_queries,
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    only = os.environ.get("REPRO_ONLY", "")
    spark = SparkSession.builder.master(f"local[{cpus}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    q = spark_queries()
    o = oracle_queries()
    names = list(q)[:DRIVER_CAP]
    results = {}
    n_bad = 0
    for name in names:
        if only and name not in only.split(","):
            continue
        t0 = time.time()
        if name not in o:
            try:
                n = q[name](spark, sf_dir).count()
                results[name] = {"rows_only": n}
                print(f"{name}: rows_only {n} ({time.time()-t0:.1f}s)", flush=True)
            except Exception as exc:  # noqa: BLE001
                results[name] = {"err": str(exc)[:200]}
                n_bad += 1
                print(f"{name}: ERROR {exc}", flush=True)
            continue
        try:
            r = compare(spark, sf_dir, name, q[name], o[name])
            ok = r["rows_spark"] == r["rows_duck"] and r["cols_match"] and r["hash_match"]
            results[name] = r
            if not ok:
                n_bad += 1
            print(f"{name}: {'OK' if ok else 'HASH/ROW MISMATCH ' + json.dumps({k: r[k] for k in ('rows_spark','rows_duck','cols_match','hash_match')})} ({time.time()-t0:.1f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": str(exc)[:300]}
            n_bad += 1
            print(f"{name}: ERROR {exc}", flush=True)
    print("GATE:", "FAIL" if n_bad else "PASS", f"({n_bad} bad)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
