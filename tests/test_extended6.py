"""Behavioral tests for the round-4 extension queries (oracle parity
itself is swept by test_oracle_parity)."""

from __future__ import annotations

import bisect
import hashlib

from pyspark.sql import functions as F

from collective_als_spark.registry import spark_queries


def test_duplicate_ngram_fraction_bounds(spark, sf_small):
    rows = spark_queries()["duplicate_ngram_fraction"](spark, sf_small).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["dup_frac"] <= 1.0
        assert r["n_shingles"] >= 1
    # synthetic corpus shares vocabulary: some docs must have dup'd 3-grams
    assert any(r["dup_frac"] > 0 for r in rows)
    # and not every 3-gram everywhere is duplicated
    assert any(r["dup_frac"] < 1 for r in rows)


def test_winnowing_overlap_scores(spark, sf_small):
    rows = spark_queries()["winnowing_overlap_pairs"](spark, sf_small).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["shared_fps"] >= 5
        assert 0.0 < r["overlap"] <= 1.0


def test_substring_containment_is_exact(spark, sf_small):
    """Every emitted pair must truly satisfy word-aligned containment,
    and the candidate pruning must be lossless vs brute force."""
    pairs = spark_queries()["substring_containment_pairs"](spark, sf_small)
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    }
    got = {(r["id_inner"], r["id_outer"]) for r in pairs.collect()}
    assert len(got) > 0
    for inner, outer in got:
        assert f" {docs[inner]} " in f" {docs[outer]} "
    brute = {
        (a, b)
        for a, ta in docs.items()
        for b, tb in docs.items()
        if a != b and len(ta.split(" ")) >= 6 and f" {ta} " in f" {tb} "
    }
    assert got == brute


def test_source_kl_nonnegative_and_complete(spark, sf_small):
    rows = spark_queries()["source_kl_divergence"](spark, sf_small).collect()
    sources = {r["source"] for r in rows}
    expected = {
        r["source"]
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("source")
        .distinct()
        .collect()
    }
    assert sources == expected
    for r in rows:
        # Gibbs: sum p*log2(p/q) >= 0 when q is a (sub)distribution;
        # quantization error is bounded by 0.5 micro-bit per term
        assert r["kl_micro_bits"] >= -1000
        assert r["n_tokens"] > 0


def test_cluster_safe_split_no_leakage(spark, sf_small):
    """Members of one duplicate cluster must land in the same split,
    and the split must be roughly 80/20."""
    rows = spark_queries()["cluster_safe_split"](spark, sf_small).collect()
    by_comp: dict[int, set[str]] = {}
    n_train = 0
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["split"])
        n_train += r["split"] == "train"
    assert all(len(s) == 1 for s in by_comp.values()), "cluster straddles split"
    frac = n_train / len(rows)
    assert 0.6 < frac < 0.95, frac


def test_quality_classifier_holdout_auc(spark, sf_small):
    rows = spark_queries()["quality_classifier_scores"](spark, sf_small).collect()
    assert len(rows) > 0

    def held_out(doc_id: int) -> bool:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 5 == 0

    ho = [(r["label"], r["p_high_quality"]) for r in rows if held_out(r["doc_id"])]
    pos = sorted(p for l, p in ho if l == 1.0)
    neg = sorted(p for l, p in ho if l == 0.0)
    assert pos and neg
    wins = sum(
        bisect.bisect_left(neg, p)
        + 0.5 * (bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p))
        for p in pos
    )
    auc = wins / (len(pos) * len(neg))
    assert auc > 0.8, auc


def test_tpch_q13_includes_zero_order_customers(spark, sf_small):
    """The ON-clause predicate must keep customers whose every order is
    urgent (they appear with c_count = 0) — a WHERE would drop them."""
    dist = {
        r["c_count"]: r["custdist"]
        for r in spark_queries()["customer_distribution_q13"](spark, sf_small).collect()
    }
    total = sum(dist.values())
    n_cust = spark.read.parquet(f"{sf_small}/customer.parquet").count()
    assert total == n_cust


def test_tpch_q15_is_argmax(spark, sf_small):
    rows = spark_queries()["top_supplier_q15"](spark, sf_small).collect()
    assert len(rows) >= 1
    tops = {r["total_revenue"] for r in rows}
    assert len(tops) == 1  # all tied at the max
