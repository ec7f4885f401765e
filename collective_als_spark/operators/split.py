"""Chronological dataset splitting.

Reference: ``Utils.splitChronologically`` (``Utils.scala:11-36``) sorts
the whole RDD by a time column (range-partition shuffle), zips with a
global index, counts, and filters one lineage per slice — three extra
jobs plus a reflection hack to recover the encoder.

Rebuild, 100 TB shapes for both modes:

- ``exact=True`` — two-phase global rank: a ``repartitionByRange``
  shuffle on the sort key (the same range shuffle the reference's
  ``sortBy`` does), per-partition ``row_number`` (window partitioned by
  ``spark_partition_id`` — never a single-task global window), then a
  broadcast join against the tiny per-partition cumulative-offset table.
  Global rank = local rank + partition offset, exactly ``zipWithIndex``
  semantics, fully parallel. Slice bounds are kept as floats
  (``lo*n <= rk < hi*n``) to match the reference's fractional-boundary
  behavior (``Utils.scala:24-27``) bit-for-bit.
- ``exact=False`` — approx quantile cuts on the time column (no rank at
  all); boundaries off by at most the approx-quantile error. Rows with
  a NULL time sort first in exact mode, so the approx path routes them
  into the first slice explicitly (they'd otherwise be silently dropped
  by the range filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cumulative_bounds(weights: list[float]) -> list[tuple[float, float]]:
    total_w = float(sum(weights))
    fracs = [w / total_w for w in weights]
    cum = []
    acc = 0.0
    for frac in fracs:
        cum.append((acc, acc + frac))
        acc += frac
    cum[-1] = (cum[-1][0], 1.0 + 1e-9)
    return cum


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "_rk",
) -> DataFrame:
    """Exact 0-based global rank without a global window.

    Range-shuffle on the ordering key, rank within each partition, then
    add the partition's cumulative offset (tiny broadcast join). Also
    attaches ``_n`` (total rows) so callers can cut by fraction without
    a separate count job.
    """
    part = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked_local = part.withColumn("_lrk", F.row_number().over(w_local) - F.lit(1))

    counts = ranked_local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # Cumulative offsets over the tiny per-partition-count frame (one
    # row per shuffle partition; shares the range exchange with
    # ranked_local via ReusedExchange). Computed by packing the counts
    # into one sorted array and expanding with higher-order functions —
    # no un-partitioned window anywhere in the plan (O(P^2) work for
    # P = shuffle partitions is negligible).
    packed = counts.agg(F.sort_array(F.collect_list(F.struct("_pid", "_cnt"))).alias("pc"))
    offsets = packed.select(
        F.explode(
            F.expr(
                "transform(pc, (x, i) -> struct("
                "x._pid AS _pid, "
                "aggregate(slice(pc, 1, i), 0L, (acc, y) -> acc + y._cnt) AS _off, "
                "aggregate(pc, 0L, (acc, y) -> acc + y._cnt) AS _n))"
            )
        ).alias("s")
    ).select("s.*")
    return (
        ranked_local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_lrk") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrk", "_off")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    cumsum_col: str = "_cum",
    total_col: str = "_total",
) -> DataFrame:
    """Exact EXCLUSIVE global cumulative sum of ``value_col`` in
    ``order_cols`` order (sum of all strictly-preceding rows), without a
    single-task global window.

    Same two-phase shape as :func:`global_rank`: range-shuffle on the
    ordering key, per-partition window cumsum, then add the partition's
    cumulative offset via a tiny broadcast join (one row per shuffle
    partition). Linear work per row — replaces the O(V²)
    ``aggregate(slice(arr, 1, i))`` prefix-sum-over-packed-array shape,
    which re-scans the prefix per element. Also attaches ``total_col``
    (grand total) so callers can compute shares without a second pass.
    """
    part = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn(
        "_lcum",
        F.coalesce(F.sum(value_col).over(w_local), F.lit(0)).cast("long"),
    )
    sums = part.groupBy("_pid").agg(F.sum(value_col).cast("long").alias("_cnt"))
    # O(P²) offsets over the one-row-per-partition frame — same
    # deliberately-tiny pattern as global_rank (P = shuffle partitions).
    packed = sums.agg(F.sort_array(F.collect_list(F.struct("_pid", "_cnt"))).alias("pc"))
    offsets = packed.select(
        F.explode(
            F.expr(
                "transform(pc, (x, i) -> struct("
                "x._pid AS _pid, "
                "aggregate(slice(pc, 1, i), 0L, (acc, y) -> acc + y._cnt) AS _off, "
                "aggregate(pc, 0L, (acc, y) -> acc + y._cnt) AS _tot))"
            )
        ).alias("s")
    ).select("s.*")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(cumsum_col, (F.col("_lcum") + F.col("_off")).cast("long"))
        .withColumn(total_col, F.col("_tot"))
        .drop("_pid", "_lcum", "_off", "_tot")
    )


def split_chronologically(
    df: DataFrame,
    weights: list[float],
    time_col: str,
    tie_break: list[str] | None = None,
    exact: bool = True,
) -> list[DataFrame]:
    """Split ``df`` into len(weights) slices in time order.

    weights are normalized (reference ``Utils.scala:21-23``). ``exact=True``
    reproduces the reference's exact global-rank cuts with float bounds
    (``lower <= rank < upper``, ``Utils.scala:24-27``); ``exact=False``
    uses approx quantile boundaries on ``time_col`` (fully parallel,
    boundary-epsilon accuracy — prefer it anywhere exact rank cuts
    aren't demanded by an oracle).
    """
    cum = _cumulative_bounds(weights)

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
                pred = F.col(num_col) < F.lit(cuts[i])
                if i == 0:
                    # NULL timestamps sort first under the exact path's
                    # row_number; keep them in the first slice here too
                    # instead of silently dropping them.
                    pred = pred | F.col(num_col).isNull()
                sl = sl.filter(pred)
                lo_cut = cuts[i]
            slices.append(sl.drop("__split_us") if is_ts else sl)
        return slices

    order = [F.col(time_col)] + [F.col(c) for c in (tie_break or [])]
    ranked = global_rank(df, order)
    out = []
    for lo, hi in cum:
        out.append(
            ranked.filter(
                (F.col("_rk") >= F.lit(lo) * F.col("_n"))
                & (F.col("_rk") < F.lit(hi) * F.col("_n"))
            ).drop("_rk", "_n")
        )
    return out


def chronological_slice_labels(
    df: DataFrame,
    weights: list[float],
    time_col: str,
    tie_break: list[str] | None = None,
    label_col: str = "slice",
) -> DataFrame:
    """One-pass variant of the exact split: every row gets its slice
    index as a column from a SINGLE global-rank subplan, instead of N
    filtered lineages that each re-execute the rank (the Seq[Dataset]
    API re-runs the range shuffle per slice unless the optimizer
    happens to reuse the exchange). Use this when downstream wants all
    slices in one frame (size accounting, per-slice stats, fold-tagged
    training data)."""
    cum = _cumulative_bounds(weights)
    order = [F.col(time_col)] + [F.col(c) for c in (tie_break or [])]
    ranked = global_rank(df, order)
    lab = None
    for i, (lo, hi) in enumerate(cum):
        cond = (F.col("_rk") >= F.lit(lo) * F.col("_n")) & (
            F.col("_rk") < F.lit(hi) * F.col("_n")
        )
        lab = F.when(cond, i) if lab is None else lab.when(cond, i)
    return ranked.withColumn(label_col, lab.cast("int")).drop("_rk", "_n")
