"""A/B the _one_job protocol-action wrapper: ON (shipped) vs OFF
(pass-through to the plain action) for the lake rows the r15 verdict
flagged. Usage: AB=off python tools/ab_one_job.py q1 q2 ..."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import collective_als_spark.sources.layout as L
from collective_als_spark.registry import spark_queries
from collective_als_spark.session import get_spark

if os.environ.get("AB", "on") == "off":
    def _plain(df, how="first", parts=None):  # noqa: ANN001
        if how == "first":
            return df.first()
        if how == "count":
            return df.count()
        return df.collect()
    L._one_job = _plain

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("TIME_REPS", "3"))
    spark = get_spark("ab_one_job")
    qs = spark_queries()
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in sys.argv[1:]:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"AB={os.environ.get('AB','on')} {name}: min={min(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
