"""Byte-pair-encoding merge learning and application as DataFrame
ops — the tokenizer-training stage of an LLM data pipeline.

Scale design: BPE statistics live on the WORD VOCABULARY with counts,
not the corpus — one corpus-sized aggregate builds the (word, count)
frame, and every subsequent iteration touches only vocabulary-sized
data (typically 10^5-10^7 rows even for a 100 TB corpus). Per
iteration the only driver traffic is the single argmax row; the merge
application is a map-only codegen array fold. Lineage is truncated
with an eager localCheckpoint per iteration, so the plan stays flat
across any number of merges.

The greedy semantics match the reference BPE (Sennrich et al. 2016):
count all adjacent symbol pairs weighted by word frequency, merge the
most frequent pair everywhere (left-to-right, non-overlapping), and
repeat. Ties break deterministically by (count desc, left asc,
right asc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs."""
    return F.transform(
        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("l"), F.element_at(syms, i + 2).alias("r")
        ),
    )


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping merge of (left, right) -> left+right
    inside a symbol array — a codegen array fold, no UDF."""
    merged = left + right
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from whitespace-tokenized text.

    Returns [(left, right, pair_count), ...] in merge order. Stops
    early when no pair reaches ``min_pair_count``.
    """
    vocab = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("syms", F.split("w", ""))
        .select("c", "syms")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            vocab.select("c", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("c").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        l, r, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((l, r, n))
        vocab = vocab.withColumn(
            "syms", merge_pair(F.col("syms"), l, r)
        ).localCheckpoint(eager=True)
    return merges


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize text with a learned merge list: chars per word, then
    each merge applied in order — one nested map-only expression, no
    shuffle and no UDF. Expression depth grows with len(merges)
    (Catalyst collapses intermediate projections, so there is no cheap
    in-plan barrier); this is fine for the tens-of-merges scale this
    operator targets. Production tokenization with 10^4-merge
    vocabularies belongs in an Arrow-batched pandas UDF holding the
    merge table — the expression form exists for the oracle-friendly,
    fully-codegen path."""
    words = F.split(F.col(text_col), " ")
    out = df.withColumn(out_col, F.transform(words, lambda w: F.split(w, "")))
    for m in merges:
        l, r = m[0], m[1]
        out = out.withColumn(
            out_col,
            F.transform(F.col(out_col), lambda s: merge_pair(s, l, r)),
        )
    return out.withColumn(out_col, F.flatten(F.col(out_col)))
