"""Text-analysis column expressions — cross-engine deterministic.

All hashes derive from md5 hex (identical in Spark and DuckDB), so every
operator built on them is oracle-checkable. No UDFs: everything is
Catalyst higher-order functions over the split word array, so the whole
pipeline stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small public stopword marker sets per language (lang-ID heuristic)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "du", "ich", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "du"],
}

MERSENNE_31 = 2147483647


def words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(words(text))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of non [a-z0-9 space] characters."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    return F.when(n > 0, F.length(F.regexp_replace(c, "[a-z0-9 ]", "")) / n).otherwise(0.0)


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    ws = words(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(0.0)


def quality_score(text: Column | str) -> Column:
    """Composite heuristic in [0,1]: long enough, low punctuation,
    some (but not all) stopwords — the usual pretraining-data filters."""
    tc = token_count(text).cast("double")
    len_score = F.least(tc / F.lit(100.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.3)) / F.lit(0.7)
    return (len_score + punct_score + sw_score) / 3


def lang_scores(text: Column | str) -> dict[str, Column]:
    ws = words(text)
    out = {}
    for lang, sw_list in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in sw_list])
        out[lang] = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return out


def word_hash(w: Column, bits: int = 32) -> Column:
    """First ``bits`` of md5 as a bigint — identical in DuckDB via
    ('0x' || substring(md5(w), 1, bits/4))::BIGINT."""
    return F.conv(F.substring(F.md5(w), 1, bits // 4), 16, 10).cast("bigint")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array (empty if fewer than n words).

    Built by zipping n shifted slices of the word array instead of
    ``transform(sequence, i -> concat_ws(slice(ws, i, n)))``: the
    per-index slice copies make the transform O(words·n) array
    allocations per document, measured ~4× slower end-to-end on the
    shingle-explode pass every dedup operator starts with. Identical
    output strings, so all md5-derived oracles are unchanged."""
    ws = words(text)
    m = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    acc = F.slice(ws, 1, m)
    for k in range(1, n):
        acc = F.zip_with(acc, F.slice(ws, k + 1, m), lambda x, y: F.concat_ws(" ", x, y))
    return F.when(F.size(ws) >= n, acc).otherwise(F.array().cast("array<string>"))


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash over word hashes, mod 2^31-1 — the
    order-sensitive document fingerprint (SURVEY §2.11 text analysis)."""
    ws = words(text)
    return F.aggregate(
        ws,
        F.lit(0).cast("bigint"),
        lambda acc, w: F.pmod(acc * 31 + word_hash(w), F.lit(MERSENNE_31)),
    )


BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_like_token_count(text: Column | str) -> Column:
    """Token count under a BPE-ish pre-tokenization regex (letter runs,
    digit runs, single punctuation — the GPT-2 pre-tokenizer shape):
    a closer proxy for real tokenizer cost than whitespace splitting.
    Pure ``regexp_count`` — codegen, no UDF; the pattern uses only
    constructs RE2 (DuckDB) and java.util.regex treat identically."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("int")
