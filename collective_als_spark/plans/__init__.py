from collective_als_spark.plans.inspect import (
    formatted_plan,
    plan_summary,
    runtime_metrics,
)
from collective_als_spark.plans.lint import assert_clean, lint_plan

__all__ = [
    "assert_clean",
    "formatted_plan",
    "lint_plan",
    "plan_summary",
    "runtime_metrics",
]
