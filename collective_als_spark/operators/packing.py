"""Token-budget sequence packing for LLM training batches.

A pretraining pipeline concatenates documents into fixed-length
training sequences ("packing") so no context-window tokens are wasted
on padding. The scalable deterministic formulation: within each
(shard) group, lay documents end-to-end in id order and cut every
``budget`` tokens — a document's sequence id is its cumulative token
offset divided by the budget (documents may straddle a boundary; the
downstream tokenizer splits them, same as GPT-style bin packing with
document carry-over).

Scale shape: one window partitioned by the shard columns — never a
global window. Shards are how real packers parallelize (per input
file / per hash bucket); cross-shard order is irrelevant to training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_cols: list[str],
) -> DataFrame:
    """Adds ``seq_id`` (which training sequence this doc starts in) and
    ``tok_offset`` (its token offset within that sequence), both
    deterministic functions of the shard-local id order."""
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("bigint"))
    return df.withColumn("seq_id", F.floor(prev / F.lit(budget))).withColumn(
        "tok_offset", F.pmod(prev, F.lit(budget)).cast("bigint")
    )
