from collective_als_spark.plans.inspect import (
    formatted_plan,
    plan_summary,
    runtime_metrics,
)

__all__ = ["formatted_plan", "plan_summary", "runtime_metrics"]
