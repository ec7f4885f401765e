"""Plan linter: the scale-smell rules from the registry-wide audit
(tests/test_plan_audit.py), exposed as a reusable API so ANY pipeline
can gate its own plans before launching them on a cluster.

``lint_plan(df)`` inspects the physical plan and returns one finding
per smell — the checks that, at 100 TB, separate a job that finishes
from one that doesn't:

- ``cartesian-join``: CartesianProduct / BroadcastNestedLoopJoin — an
  unkeyed join that scales as |L|×|R|;
- ``global-window``: a window/sort with no partition key — the whole
  dataset funnels through ONE task;
- ``row-udf``: BatchEvalPython — a row-at-a-time Python UDF in the hot
  path (10-100× slower than builtin expressions or Arrow-batched
  pandas UDFs, which plan as ArrowEvalPython and are not flagged);
- ``wide-scan``: a file scan reading ≥ ``wide_scan_cols`` columns —
  column pruning broke (or the query genuinely needs a wide row; allow
  it explicitly then).

Findings are dicts {"rule", "detail"}; an empty list is a clean plan.
Use ``allow={"rule", ...}`` for smells that are deliberate (e.g. a
documented exact-baseline cross join).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from collective_als_spark.plans.inspect import plan_summary

RULES = ("cartesian-join", "global-window", "row-udf", "wide-scan")


def lint_plan(
    df: DataFrame,
    allow: set[str] | None = None,
    wide_scan_cols: int = 11,
) -> list[dict]:
    allow = allow or set()
    unknown = allow - set(RULES)
    if unknown:
        raise ValueError(f"unknown lint rules in allow: {sorted(unknown)}")
    s = plan_summary(df)
    findings: list[dict] = []

    if "cartesian-join" not in allow and s["n_cartesian"]:
        kinds = re.findall(
            r"\(\d+\) (CartesianProduct|BroadcastNestedLoopJoin)", s["plan"]
        )
        findings.append(
            {
                "rule": "cartesian-join",
                "detail": f"{s['n_cartesian']} unkeyed join(s): {sorted(set(kinds))}",
            }
        )
    if "global-window" not in allow and s["n_global_windows"]:
        findings.append(
            {
                "rule": "global-window",
                "detail": f"{s['n_global_windows']} un-partitioned window(s) — "
                "single-task sort of the full dataset",
            }
        )
    if "row-udf" not in allow:
        n = len(re.findall(r"\(\d+\) BatchEvalPython", s["plan"]))
        if n:
            findings.append(
                {
                    "rule": "row-udf",
                    "detail": f"{n} row-at-a-time Python UDF stage(s) — use builtin "
                    "expressions or an Arrow-batched pandas UDF",
                }
            )
    if "wide-scan" not in allow:
        for scan in s["scans"]:
            cols = scan["read_columns"]
            if cols is not None and len(cols) >= wide_scan_cols:
                findings.append(
                    {
                        "rule": "wide-scan",
                        "detail": f"scan reads {len(cols)} columns "
                        f"({cols[:6]}…) — pruning broke?",
                    }
                )
    return findings


def assert_clean(df: DataFrame, allow: set[str] | None = None, **kw) -> None:
    """Raise AssertionError with every finding if the plan is not
    clean — the one-liner form for pipeline gates and tests."""
    findings = lint_plan(df, allow=allow, **kw)
    if findings:
        raise AssertionError(
            "plan lint failed:\n"
            + "\n".join(f"  [{f['rule']}] {f['detail']}" for f in findings)
        )
