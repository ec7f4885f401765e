"""BPE merge learning: greedy equivalence against a pure-Python
reference implementation, and merge application invariants."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from collective_als_spark.operators.bpe import (
    apply_bpe,
    learn_bpe_merges,
    merge_pair,
)


def _ref_bpe(texts: list[str], n_merges: int, min_pair_count: int = 2):
    vocab: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (l, r), n = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if n < min_pair_count:
            break
        merges.append((l, r, n))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_learn_matches_reference(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    expected = _ref_bpe(texts, 8)
    got = learn_bpe_merges(docs, "text", n_merges=8)
    assert got == expected


def test_merge_pair_fold_semantics(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "b", "a"],), (["x"],), ([],)],
        "syms array<string>",
    )
    out = [
        r["m"]
        for r in df.select(merge_pair(F.col("syms"), "a", "a").alias("m")).collect()
    ]
    assert out == [["aa", "aa"], ["a", "b", "a"], ["x"], []]


def test_apply_bpe_lossless(spark, sf_small):
    """Concatenating BPE tokens must reproduce the original text with
    spaces removed — merges re-segment, never alter content."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(50)
    merges = learn_bpe_merges(docs, "text", n_merges=5)
    assert merges
    toks = apply_bpe(docs, "text", merges)
    rows = toks.select("text", "bpe_tokens").collect()
    for r in rows:
        assert "".join(r["bpe_tokens"]) == r["text"].replace(" ", "")
    # at least one learned merge actually appears in the output tokens
    merged_syms = {l + r for l, r, _ in merges}
    assert any(
        t in merged_syms for row in rows for t in row["bpe_tokens"]
    )


def test_bpe_merge_table_query(spark, sf_small):
    from collective_als_spark.registry import spark_queries

    t = spark_queries()["bpe_merge_table"](spark, sf_small).collect()
    assert len(t) == 8
    counts = [r["pair_count"] for r in t]
    # each merge removes mass from its pair; counts need not be
    # monotone, but every one must meet the min threshold
    assert all(c >= 2 for c in counts)
    assert [r["rank"] for r in t] == list(range(1, 9))


from hypothesis import given, settings
from hypothesis import strategies as st

_sym = st.sampled_from(["a", "b", "ab", "ba", "c"])


@given(
    arrays=st.lists(st.lists(_sym, max_size=12), min_size=1, max_size=8),
    pair=st.tuples(_sym, _sym),
)
@settings(max_examples=25, deadline=None)
def test_merge_pair_property(spark, arrays, pair):
    """The codegen fold must equal the left-to-right non-overlapping
    python fold on arbitrary symbol arrays — including merged tokens
    that textually collide with singles ('a'+'b' vs existing 'ab')."""
    l, r = pair

    def ref(s):
        out = []
        for x in s:
            if out and out[-1] == l and x == r:
                out[-1] = l + r
            else:
                out.append(x)
        return out

    df = spark.createDataFrame([(a,) for a in arrays], "syms array<string>")
    got = [
        row["m"]
        for row in df.select(merge_pair(F.col("syms"), l, r).alias("m")).collect()
    ]
    # createDataFrame preserves row order on a local list
    assert got == [ref(a) for a in arrays]
