"""Query registry: every operator exposed to the driver's correctness
gate lives here as a (spark_fn, oracle_sql) pair.

``spark_fn(spark, sf_dir) -> DataFrame`` builds the DataFrame plan;
``oracle`` is equivalent DuckDB SQL over the pre-registered views.
Column names/aliases must match exactly (the driver sorts columns by
name and hashes values). Non-SQL-expressible entries set oracle=None
and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Entry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


_REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _REGISTRY[name] = Entry(fn, oracle)
        return fn

    return deco


def _ensure_loaded() -> None:
    # import for side effect: modules register their queries
    from collective_als_spark import queries as _q  # noqa: F401


# Driver-visibility ordering. The r01 driver checked exactly the first
# 50 registered queries, so registration order decides which operators
# get a CORRECTNESS row. This list front-loads (a) r01 red rows whose
# fixes need driver validation, (b) one representative per SURVEY §2
# operator, (c) the LLM-pipeline north-star operators, then (d) the
# extended-coverage queries. Redundant family members (e.g. cube when
# rollup+grouping_sets are in) and rows-only entries with strong pytest
# twins (streaming batch-equivalence, ANN recall) sort last — they lose
# the least if a cap truncates the sweep. Unlisted queries append in
# registration order.
_PRIORITY: list[str] = [
    # -- r01 fixes needing driver revalidation
    "token_count_by_source", "pipeline_clean_corpus", "multimodal_features",
    "embedding_neardup_pairs", "dedup_clusters", "chrono_split_sizes",
    "asof_join_purchase_click", "explode_dictionary",
    # -- SURVEY §2 representatives missing a driver row in r01
    "chrono_rank", "rank_range_filter", "orderby_limit", "rmse_mae",
    # -- §2 representatives green in r01 (keep their rows)
    "checked_cast_projection", "row_filter_clean", "affine_recode",
    "epoch_millis", "union_distinct_ids", "left_join_enrich",
    "pair_inner_join", "full_outer_merge", "gramian_yty", "sql_passthrough",
    "pricing_summary", "ranking_metrics_at_k",
    "cmf_fit_predict", "cmf_fit_3entity", "als_regression_eval",
    "cmf_recommend_topk",
    # -- LLM-pipeline north star
    "exact_dedup", "minhash_signature", "lsh_candidate_pairs",
    "simhash_fingerprint", "ngram_jaccard_pairs", "ann_topk_cosine",
    "text_quality_metrics", "lang_id_heuristic", "doc_fingerprint",
    # -- extended coverage missing a driver row in r01
    "semi_anti_join", "star_join_revenue", "topk_per_group",
    "shipping_priority_top10", "running_window_frame", "lag_event_gap",
    "latest_event_per_user_type", "exists_subquery", "in_subquery_high_value",
    "scalar_subquery_above_avg", "returned_items_by_nation", "rollup_agg",
    # -- windowed/streaming batch twins (green in r01)
    "sessionization",
    # ---------------- below the r01 cap line (50) ----------------
    "tumbling_window_agg",
    "document_chunking", "quality_quantile_filter", "repetition_metrics",
    "deterministic_sample", "sequence_packing", "simhash_neardup_pairs",
    "contamination_overlap", "embedding_quantize", "bm25_scores",
    "bpe_token_count", "source_mixture_sample", "multimodal_frame_sample",
    "incremental_lsh_pairs", "table_profile", "hybrid_retrieval",
    "stratified_sample_exact", "kfold_assign", "negative_sampling",
    "scd2_intervals", "hourly_resample_gapfill",
    "rolling_time_range_window", "equiwidth_histogram", "pipeline_training_prep",
    "zorder_keys", "vocab_top_words", "word_bigram_counts",
    "vocab_top_p_mass", "conversion_funnel", "salted_join_revenue",
    "conditional_pivot", "json_extract_props", "array_functions_suite",
    # -- r02 extension set 3 (all oracle-backed; before the rows-only tail)
    "tfidf_term_stats", "pmi_bigrams", "item_item_cosine",
    "event_transition_matrix", "numeric_mask_stats", "pagerank_trade_graph",
    "fuzzy_name_linkage", "embedding_covariance", "trend_regression",
    "chi_square_independence", "dq_audit", "triangle_count",
    "zscore_outliers", "join_key_skew_profile",
    "welch_ttest", "psi_drift", "session_paths", "sliding_window_agg",
    "rrf_fusion", "token_budget_allocation", "prefix_jaccard_pairs",
    "intersect_except", "grouping_sets_agg", "cube_agg",
    "exact_percentiles", "distinct_count_stats", "range_join_attribution",
    "lead_ntile_window", "window_distribution_functions", "date_arithmetic",
    "approx_distinct_quantile", "ann_topk_lsh", "ann_topk_ivf",
    "streaming_tumbling_agg", "streaming_stateful_totals",
    "streaming_static_enrich", "streaming_session_window", "streaming_dedup",
    "streaming_stream_join", "streaming_upsert_totals",
    "multimodal_audio_energy",
]


def _ordered_names() -> list[str]:
    listed = [n for n in _PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(_PRIORITY)]
    return listed + rest


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: _REGISTRY[name].fn for name in _ordered_names()}


def oracle_queries() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: _REGISTRY[name].oracle
        for name in _ordered_names()
        if _REGISTRY[name].oracle is not None
    }
