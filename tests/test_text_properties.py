"""Property tests: text column expressions vs naive Python references.

The Spark expressions (functions/text.py) are built for cross-engine
determinism; these tests pin their semantics against straightforward
Python implementations on hypothesis-generated strings (unicode,
repeated spaces, empties — the edge cases explode/split get wrong
silently)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from collective_als_spark.functions import text as TX

WORD = st.text(
    alphabet=st.characters(whitelist_categories=["Ll", "Lu", "Nd", "Po"]),
    min_size=0,
    max_size=8,
)
TEXTS = st.lists(
    st.lists(WORD, min_size=0, max_size=12).map(" ".join), min_size=1, max_size=25
)


def naive_shingles(text: str, n: int = 3) -> list[str]:
    ws = text.split(" ")
    if len(ws) < n:
        return []
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def naive_word_hash(w: str, bits: int = 32) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[: bits // 4], 16)


def naive_fingerprint(text: str) -> int:
    acc = 0
    for w in text.split(" "):
        acc = (acc * 31 + naive_word_hash(w)) % TX.MERSENNE_31
    return acc


@given(TEXTS)
@settings(max_examples=5, deadline=None)
def test_shingles_match_naive(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r[0] for r in df.select(TX.shingles("t", 3).alias("s")).collect()]
    assert got == [naive_shingles(t, 3) for t in texts]


@given(TEXTS)
@settings(max_examples=5, deadline=None)
def test_rolling_fingerprint_matches_naive(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r[0] for r in df.select(TX.rolling_fingerprint("t").alias("f")).collect()]
    assert got == [naive_fingerprint(t) for t in texts]


@given(TEXTS)
@settings(max_examples=5, deadline=None)
def test_token_count_matches_split(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r[0] for r in df.select(TX.token_count("t").alias("n")).collect()]
    assert got == [len(t.split(" ")) for t in texts]


def test_word_hash_matches_duckdb(spark):
    """The Spark word_hash must equal DuckDB's ('0x'||substr(md5,1,8))
    — the exact cross-engine contract the oracles rely on."""
    import duckdb

    words = ["", "a", "hello", "Zürich", "123", "the quick"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["h"]
        for r in df.select("w", TX.word_hash(F.col("w")).alias("h")).collect()
    }
    con = duckdb.connect()
    for w in words:
        (dh,) = con.execute(
            "SELECT CAST(('0x' || substring(md5(?), 1, 8)) AS BIGINT)", [w]
        ).fetchone()
        assert got[w] == dh, (w, got[w], dh)


def test_chunking_formula_covers_every_token():
    """document_chunking's chunk-count formula: windows of 64 tokens at
    stride 32 cover token 1..n with no gap, and every chunk starts
    inside the document."""
    import math

    for n in range(1, 500):
        n_chunks = max(math.ceil((n - 32) / 32), 1)
        starts = [i * 32 for i in range(n_chunks)]
        assert all(s < n for s in starts)          # no empty chunks
        covered = 0
        for s in starts:
            assert s <= covered                     # no gap
            covered = max(covered, min(s + 64, n))
        assert covered == n                         # full coverage


def test_shingles_zip_construction_matches_reference(spark):
    """The zip-with shingle builder (r03 rewrite) must equal a plain
    Python sliding window for every n and word count, including the
    fewer-than-n edge."""
    from pyspark.sql import functions as F

    from collective_als_spark.functions.text import shingles

    texts = [
        "",
        "a",
        "a b",
        "a b c",
        "a b c d",
        "a b c d e f g",
        "x " * 30 + "y",
    ]
    df = spark.createDataFrame([(i, t.strip() if t != "" else t) for i, t in enumerate(texts)], "i int, text string")
    for n in (2, 3, 4, 5):
        got = {
            r.i: r.sh
            for r in df.select("i", shingles(F.col("text"), n).alias("sh")).collect()
        }
        for i, t in enumerate(texts):
            ws = (t.strip() if t != "" else t).split(" ")
            want = (
                [" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)]
                if len(ws) >= n
                else []
            )
            assert got[i] == want, (n, t, got[i], want)
