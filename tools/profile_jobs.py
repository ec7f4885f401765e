"""Per-query Spark-job profiler: runs each named query to the noop
sink under its own job group and reports how many Spark jobs / stages /
tasks it launched (status-store counts — load-insensitive, unlike wall
time). Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/profile_jobs.py q1 q2 ...

No arguments = the default heavy set.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "lake_identity_cdc",
    "lake_scd2_history",
    "lake_incremental_view",
    "lake_tracked_apply",
    "lake_table_changes",
    "lake_apply_changes",
    "lake_sql_dml",
    "lake_snapshot_lifecycle",
    "lake_merge_matrix",
    "lake_mor_upsert_nullstats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or DEFAULT
    from collective_als_spark.registry import spark_queries
    from collective_als_spark.session import get_spark

    spark = get_spark("profile_jobs")
    sc = spark.sparkContext
    qs = spark_queries()
    # warm codegen/JVM once
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    st = sc.statusTracker()
    print(f"{'query':32s} {'jobs':>5s} {'stages':>7s} {'tasks':>7s} {'sec':>7s}")
    for name in names:
        group = f"prof_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jids = st.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for j in jids:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = st.getStageInfo(s)
                if si is not None and si.numActiveTasks + si.numCompletedTasks > 0 or si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(f"{name:32s} {len(jids):>5d} {n_stages:>7d} {n_tasks:>7d} {dt:>7.2f}")
        del df


if __name__ == "__main__":
    main()
