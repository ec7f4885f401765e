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


def _count_global_windows(plan: str) -> int:
    """Window nodes whose partition spec is empty (the single-task
    'No Partition Defined' shape — a scale-killer on real data).

    Formatted-plan rendering: partitioned+ordered windows print three
    bracket groups `[exprs], [partSpec], [ordSpec]`; an un-partitioned
    ordered window omits the partition group entirely, so its Arguments
    line has two groups with sort directions in the last one.
    """
    n = 0
    lines = plan.splitlines()
    for i, raw in enumerate(lines):
        if not re.fullmatch(r"\(\d+\) Window", raw.strip()):
            continue
        for nxt in lines[i + 1 : i + 4]:
            s = nxt.strip()
            if s.startswith("Arguments:"):
                groups = s.split("], [")
                if len(groups) < 3 and (" ASC" in groups[-1] or " DESC" in groups[-1]):
                    n += 1
                break
    return n


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
        "n_global_windows": _count_global_windows(plan),
        "whole_stage_codegen": "WholeStageCodegen" in plan or "codegen id" in plan,
        "plan": plan,
    }


def runtime_metrics(df: DataFrame, execute: bool = True) -> list[dict]:
    """EXPLAIN-ANALYZE-style report: execute the plan (noop sink — full
    execution cost, nothing collected) and return every physical
    operator's runtime SQL metrics as
    ``{node, node_id, metric, value}`` dicts — output rows per
    operator, shuffle bytes/records, spill sizes, scan rows, broadcast
    sizes. The post-run feedback loop `plan_summary` (pre-run shape
    checks) can't provide: WHERE the rows actually went.

    Walks the final adaptive plan via py4j; on AQE plans the executed
    subtree is unwrapped so metrics reflect the plan that really ran.

    Execution goes through the DataFrame's OWN QueryExecution
    (``toRdd.count`` — rows stay distributed, nothing is collected);
    a sink write would run a fresh cloned plan and leave these nodes'
    metrics at zero.
    """
    qe = df._jdf.queryExecution()
    if execute:
        qe.toRdd().count()
    root = qe.executedPlan()
    out: list[dict] = []
    seen: set[int] = set()

    def walk(node) -> None:
        oid = node.id()
        if oid in seen:
            return
        seen.add(oid)
        name = node.nodeName()
        mit = node.metrics().iterator()
        while mit.hasNext():
            t = mit.next()
            out.append(
                {
                    "node": name,
                    "node_id": int(oid),
                    "metric": str(t._1()),
                    "value": int(t._2().value()),
                }
            )
        # AdaptiveSparkPlan / QueryStage wrappers expose the executed
        # subtree via executedPlan()/plan(); regular nodes via children
        for accessor in ("executedPlan", "plan"):
            try:
                walk(getattr(node, accessor)())
                return
            except Exception:
                pass
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next())

    walk(root)
    return out
