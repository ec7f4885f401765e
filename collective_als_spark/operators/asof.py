"""As-of (time-travel) join — an operator Spark lacks natively
(SURVEY §2.3: absent in the reference too; standard in TS engines).

Implementation: the union + forward-fill trick, NOT a range cross
join and NOT a per-group pandas merge_asof — one shuffle on the key,
one window sort, linear work:

  1. tag right rows 0, left rows 1; union on (key, ts, tag, payload)
  2. window per key ordered by (ts, tag): ``last(payload, ignorenulls)``
     forward-fills the most recent right payload at or before each row
  3. keep left rows

Equal timestamps: right sorts before left → inclusive (>=) semantics,
matching DuckDB/kdb ASOF JOIN defaults. Scales as one shuffle + sort
per key partition; skewed keys are split by AQE like any window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` row of
    the same ``key`` with ``right_ts <= left_ts`` (NULL payload if none).
    """
    rp = [F.col(c) for c in right_payload]
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(*rp).alias("_rpay"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # Ordering after (_ts, _tag): the right payload struct itself — among
    # right rows sharing (key, ts) the greatest payload tuple wins,
    # deterministically (left rows have _rpay NULL, which sorts first
    # within their tag group and doesn't affect the fill). The optional
    # tie_break then orders left rows sharing a timestamp.
    order: list[Column] = [F.col("_ts"), F.col("_tag"), F.col("_rpay")]
    if tie_break:
        order.append(F.col(f"_l_{tie_break}"))
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r.select(*l.columns)).withColumn(
        "_matched", F.last("_rpay", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns] + [
        F.col(f"_matched.{c}").alias(f"asof_{c}") for c in right_payload
    ]
    return filled.filter(F.col("_tag") == 1).select(*out_cols)
