"""Deep profile of ONE query: per-job stage names + task counts, to
attribute each Spark job launch to an engine phase. Usage:

    SPARK_GRAFT_SF_DIR=... python tools/profile_one.py lake_identity_cdc
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    name = sys.argv[1]
    from collective_als_spark.registry import spark_queries
    from collective_als_spark.session import get_spark

    spark = get_spark("profile_one")
    sc = spark.sparkContext
    qs = spark_queries()
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    st = sc.statusTracker()
    group = f"prof_{name}"
    sc.setJobGroup(group, name)
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    sc.setJobGroup(None, None)
    jids = sorted(st.getJobIdsForGroup(group))
    print(f"=== {name}: {len(jids)} jobs ===")
    for j in jids:
        ji = st.getJobInfo(j)
        if ji is None:
            print(f"job {j}: <expired>")
            continue
        parts = []
        for s in sorted(ji.stageIds):
            si = st.getStageInfo(s)
            if si is None:
                continue
            nm = si.name.split("$")[0][:110]
            parts.append(f"{nm}({si.numTasks}t)")
        print(f"job {j:4d}: " + " | ".join(parts))


if __name__ == "__main__":
    main()
