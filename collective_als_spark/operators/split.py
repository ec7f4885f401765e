"""Chronological dataset splitting.

Reference: ``Utils.splitChronologically`` (``Utils.scala:11-36``) sorts
the whole RDD by a time column (range-partition shuffle), zips with a
global index, counts, and filters one lineage per slice — three extra
jobs plus a reflection hack to recover the encoder.

Rebuild: one window pass. A global ``row_number`` over an un-partitioned
window is a driver-side bottleneck at 100 TB (single-task sort), so we
use ``percent_rank``-free two-phase ranking: Spark's range-partitioned
sort + ``zipWithIndex`` semantics are reproduced with a window over the
sort key only when exact rank cuts are required; for fraction cuts we
prefer ``approx`` quantile cuts on the time column, which parallelize.

API keeps exact semantics by default (matches the oracle): global rank
via ``row_number`` with a deterministic tie-break on all id columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_chronologically(
    df: DataFrame,
    weights: list[float],
    time_col: str,
    tie_break: list[str] | None = None,
    exact: bool = True,
) -> list[DataFrame]:
    """Split ``df`` into len(weights) slices in time order.

    weights are normalized (reference ``Utils.scala:21-23``). ``exact=True``
    reproduces the reference's exact global-rank cuts; ``exact=False``
    uses approx quantile boundaries on ``time_col`` (fully parallel, the
    100 TB path — boundaries off by at most approx-quantile error).
    """
    total_w = float(sum(weights))
    fracs = [w / total_w for w in weights]
    cum = []
    acc = 0.0
    for frac in fracs:
        cum.append((acc, acc + frac))
        acc += frac
    cum[-1] = (cum[-1][0], 1.0 + 1e-9)

    if not exact:
        from pyspark.sql import types as T

        is_ts = isinstance(df.schema[time_col].dataType, T.TimestampType)
        num_col = "__split_us" if is_ts else time_col
        ndf = (
            df.withColumn(num_col, F.unix_micros(F.col(time_col))) if is_ts else df
        )
        probs = [hi for (_, hi) in cum[:-1]]
        cuts = ndf.approxQuantile(num_col, probs, 0.001)
        slices = []
        lo_cut = None
        for i, (_, _) in enumerate(cum):
            sl = ndf
            if lo_cut is not None:
                sl = sl.filter(F.col(num_col) >= F.lit(lo_cut))
            if i < len(cuts):
                sl = sl.filter(F.col(num_col) < F.lit(cuts[i]))
                lo_cut = cuts[i]
            slices.append(sl.drop("__split_us") if is_ts else sl)
        return slices

    order = [F.col(time_col)] + [F.col(c) for c in (tie_break or [])]
    w = Window.orderBy(*order)
    n = df.count()
    ranked = df.withColumn("_rk", F.row_number().over(w) - F.lit(1))
    out = []
    for lo, hi in cum:
        lo_i, hi_i = int(lo * n), int(hi * n)
        out.append(
            ranked.filter((F.col("_rk") >= lo_i) & (F.col("_rk") < hi_i)).drop("_rk")
        )
    return out
