"""Dense dictionary coding without a global window.

Reference pattern: ``MovieLensCollectiveALS.scala:16-25`` builds a
value -> dense-code dictionary by collecting distinct values to the
driver. The r01 rebuild used ``row_number() OVER (ORDER BY value)`` —
correct, but an un-partitioned window (single-task sort warning) even
though the frame is tiny.

This version aggregates the distinct values into ONE sorted array
(standard two-stage hash aggregate) and explodes it with its index:
no window, no driver collect, one narrow plan. Only sound for
dictionary-sized cardinalities (the array materializes on one reducer)
— which is the definition of a dictionary column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_codes(df: DataFrame, value_col: str, code_col: str = "code") -> DataFrame:
    """(value, code) with codes 0..n-1 assigned in ascending value order.

    NULL values are excluded (``collect_list`` drops them), matching
    the reference dictionary builder which never sees nulls.
    """
    packed = (
        df.select(value_col)
        .distinct()
        .agg(F.sort_array(F.collect_list(value_col)).alias("_vals"))
    )
    return packed.select(
        F.explode(
            F.expr("transform(_vals, (v, i) -> struct(v AS _v, i AS _c))")
        ).alias("s")
    ).select(
        F.col("s._v").alias(value_col),
        F.col("s._c").cast("int").alias(code_col),
    )
