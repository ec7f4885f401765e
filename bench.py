"""Benchmark harness: times headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query executes to a no-op sink (full plan runs, nothing collected
to the driver), mirroring cluster execution cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: relational spine, windows, sessionization, dedup suite,
# similarity search, text analysis, ranking metrics, CMF fit+predict
HEADLINE = [
    "pricing_summary",
    "star_join_revenue",
    "shipping_priority_top10",
    "range_join_attribution",
    "grouping_sets_agg",
    "topk_per_group",
    "running_window_frame",
    "sessionization",
    "tumbling_window_agg",
    "exact_dedup",
    "minhash_signature",
    "lsh_candidate_pairs",
    "simhash_fingerprint",
    "text_quality_metrics",
    "doc_fingerprint",
    "pipeline_clean_corpus",
    "ann_topk_cosine",
    "ranking_metrics_at_k",
    "cmf_fit_predict",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from collective_als_spark.registry import spark_queries
    from collective_als_spark.session import get_spark

    spark = get_spark("collective_als_spark_bench")
    qs = spark_queries()

    # warm the JVM/codegen path once with a cheap query
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
