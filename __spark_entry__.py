"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — duckdb-equivalent SQL per query key.

Column names are aliased identically on both sides; every query has a
deterministic result SET (ties broken by a unique key before any LIMIT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from weaviate_spark.entry_queries import QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: filter + multi-key sort + limit over customer (M1 slice)."""
    return QUERIES["filter_sort_limit"](spark, "/root/testdata/sf0.001")


# Query names already covered by a driver CORRECTNESS_r0{1..4}.json run.
# The driver samples a window of the registry per round, so queries() lists
# never-yet-driver-checked entries FIRST (newest operators, quantization
# family, sampling/PII/curation…) — every registered query keeps its oracle
# either way; this only steers the sample toward unproven entries.
_DRIVER_CHECKED = frozenset({
    "filter_sort_limit", "filter_like_prefix", "filter_like_wildcard",
    "filter_contains_any", "filter_not_two_valued", "filter_date_range",
    "filter_len_property", "filter_tokenized_equal", "filter_geo_within_range",
    "pagination_offset", "agg_pricing_summary", "agg_median_mode",
    "agg_meta_count", "agg_type_pointing_to", "agg_boolean",
    "agg_date_minmax", "agg_date_median_mode", "agg_top_occurrences",
    "agg_group_limit", "agg_object_limit", "ref_resolve_2hop",
    "ref_filter_semijoin", "ref_count", "ref_fact_join_agg", "bm25_topk",
    "bm25_and_operator", "bm25_min_or", "bm25_autocut", "knn_cosine_topk",
    "knn_l2_within_distance", "knn_filtered", "knn_near_object",
    "knn_multi_target", "knn_named_vectors_min", "hybrid_rrf",
    "hybrid_relative_score", "hybrid_distance_cutoff", "hybrid_group_by",
    "search_group_by", "search_group_by_struct", "search_group_by_array",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "dedup_simhash", "text_quality_scores",
    "text_tokens_by_lang", "text_cjk_dict_segmentation", "ann_lsh_topk",
    "events_windowed_counts", "events_session_agg", "events_json_props",
    "stateful_user_totals", "knn_classification", "zeroshot_classification",
    "contextual_classification", "explore_cross_class", "boost_rerank",
    "blob_hash",
})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    unchecked = {n: f for n, f in QUERIES.items() if n not in _DRIVER_CHECKED}
    checked = {n: f for n, f in QUERIES.items() if n in _DRIVER_CHECKED}
    return {**unchecked, **checked}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
