"""Physical-plan introspection: the feedback loop for scale tuning.

``plan_summary`` distills ``explain("formatted")`` into the facts that
matter at 100 TB: did filters reach the scan, how many columns does each
scan read, which joins broadcast vs shuffle, how many exchanges
(shuffles) the plan contains, and whether the hot path is inside
whole-stage codegen. Tests assert on these so plan regressions
(a lost pushdown, an accidental cross join) fail CI instead of
surfacing as cluster bills.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(jmode.fromString("formatted"))


def plan_summary(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    scans = []
    cur: dict | None = None
    for raw in plan.splitlines():
        s = raw.strip()
        m = re.match(r"\(\d+\) Scan (\w+)", s)
        if m:
            cur = {"format": m.group(1), "read_columns": None, "pushed_filters": []}
            scans.append(cur)
            continue
        if cur is not None and s.startswith("ReadSchema:"):
            cols = re.findall(r"(\w+):", s.split("struct<", 1)[-1])
            cur["read_columns"] = cols
        if cur is not None and s.startswith("PushedFilters:"):
            inner = s.split("[", 1)[-1].rstrip("]")
            cur["pushed_filters"] = [f.strip() for f in inner.split(",") if f.strip()]
    return {
        "scans": scans,
        "n_exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "n_broadcast_joins": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "n_sortmerge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "n_shuffledhash_joins": len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)),
        "n_cartesian": len(
            re.findall(r"\(\d+\) (CartesianProduct|BroadcastNestedLoopJoin)", plan)
        ),
        "whole_stage_codegen": "WholeStageCodegen" in plan or "codegen id" in plan,
        "plan": plan,
    }
