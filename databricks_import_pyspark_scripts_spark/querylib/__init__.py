"""Query library: every operator capability exposed as a named, oracle-checked
query over the driver testdata (TESTDATA.md tables).

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI/DuckDB SQL oracle string (or None for genuinely
non-SQL-expressible operators, which the driver checks rows-only).

Registration is decorator-based; importing the submodules populates the
registry. ``__spark_entry__.py`` is a thin adapter over this package.

Determinism rules every query follows (SURVEY.md §7 risk register):
* every computed column is aliased identically in Spark and oracle SQL;
* double aggregates are ROUND()ed so cross-engine last-ulp drift can't flip
  the driver's value hash;
* ties in any top-k / limit are broken by a unique key so both engines pick
  the same rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn
    return deco


# The driver's correctness gate checks a bounded window of queries (the first
# ~50 by iteration order).  Rotation policy: every round front-loads the
# queries whose last driver attestation is OLDEST, so attestations stay fresh
# on current code.  r5 window: the never-attested r5 additions first
# (clustering, boilerplate/self-repetition, mixture, PQ/IVF-PQ, incremental
# near-dup, skew stress, CDC-merge, resample/SCD2...), then the stale tier
# whose last attestation was r1/r2.  Round 4 attested the names in the bottom
# tier.  Names absent from this list follow in registration order.
_PRIORITY: tuple[str, ...] = (
    # --- new queries this round go HERE (never attested) ---
    "dedup_semantic_semdedup",
    "cdc_compact_changelog",
    "cdc_derive_changes",
    "agg_decimal_exact_money",
    "approx_hll_rolling_distinct",
    "agg_winsorized_mean",
    "sql_not_in_null_trap",
    "sql_correlated_scalar_select",
    "events_trending_week_over_week",
    "events_conversion_latency",
    "dedup_cluster_size_histogram",
    "events_scd2_point_in_time_join",
    "agg_deterministic_mode",
    "setops_except_all",
    "dedup_cluster_keep_best",
    "text_quality_percentile_by_lang",
    "text_vocab_coverage_curve",
    "corpus_systematic_pps_sample",
    "tokenizer_bpe_encode",
    "graph_kcore",
    "corpus_stratified_split",
    "similarity_hybrid_rrf",
    "events_transition_matrix",
    "text_bm25_search",
    "ann_recall_eval",
    "multimodal_asset_dedup",
    "graph_triangle_count",
    "stats_equiwidth_histogram",
    "sql_recursive_cte_rollup",
    "mv_incremental_maintenance",
    "dq_constraint_audit",
    "tokenizer_bpe_merges",
    "er_customer_blocking",
    "text_duplicate_passages",
    "dedup_containment_pairs",
    "events_anomaly_mad",
    "cluster_kmeans_assign",
    "cluster_balanced_sample",
    "text_boilerplate_ngrams",
    "text_self_repetition",
    "corpus_mixture_budget_sample",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "dedup_incremental_neardup",
    "scalar_variant_shredding",
    "corpus_prep_pipeline_v2",
    "graph_pagerank_exact",
    "skew_topk_hot_key_unsalted",
    "skew_topk_hot_key_salted",
    "skew_groupmap_hot_key_unsalted",
    "skew_groupmap_hot_key_salted",
    "text_lm_quality_score",
    "dedup_corpus_kept",
    "approx_hll_mergeable_sketches",
    "text_chunk_documents",
    "cdc_merge_upsert",
    "cdc_apply_changes",
    "events_resample_forward_fill",
    "events_scd2_user_value",
    # --- stale tier: last driver attestation r1/r2 (behind the r4 window),
    #     front-loaded so CORRECTNESS_r05 re-attests them on current code ---
    "q1_pricing_summary",
    "agg_distinct_counts",
    "agg_rollup",
    "agg_cube",
    "q3_unshipped_revenue",
    "q5_region_supplier_volume",
    "join_broadcast_brand_volume",
    "join_semi_active_customers",
    "join_anti_idle_customers",
    "join_full_outer_nation_counts",
    "window_topk_per_group",
    "window_running_balance",
    "window_lag_lead_sessions",
    "setops_nation_coverage",
    "window_value_functions",
    "map_functions",
    "setops_bag_semantics",
    "scalar_string_functions",
    "scalar_regexp_functions",
    "hof_array_ops",
    "scalar_datetime_functions",
    "scalar_json_extraction",
    "scalar_json_parse_struct",
    "customer_360_kitchen_sink",
    "scalar_conditional_bucketing",
    "agg_ordered_collect",
    "window_ntile_ranks",
    "scalar_math_functions",
    "hof_embedding_norms",
    "agg_statistical_moments",
    "agg_argmin_argmax",
    "null_semantics_battery",
    "agg_rollup_grouping_markers",
    "crossjoin_coverage_grid",
    "q6_forecast_revenue",
    "q4_priority_with_late_lines",
    "q14_promo_revenue_share",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "q22_idle_rich_customers",
    "q7_nation_trade_flows",
    "q10_returned_value_customers",
    "q15_top_supplier",
    "q2_min_cost_supplier",
    "q8_national_market_share",
    "q9_product_type_profit",
    "q12_late_lines_by_priority",
    "q13_customer_order_distribution",
    "q17_small_quantity_revenue",
    "q20_excess_shipment_suppliers",
    "q21_waiting_suppliers",
    "subquery_correlated_above_avg",
    "subquery_in_and_exists",
    "grouping_sets_explicit",
    "pivot_status_by_priority",
    "unpivot_acctbal",
    "percentiles_exact",
    "grouped_map_zscore",
    "pandas_udf_sigmoid",
    "pandas_udaf_rms",
    "udtf_document_tokens",
    "scalar_try_functions",
    "lateral_top_suppliers",
    # --- attested green in r4 on current code — safe past the window edge ---
    "q11_important_stock_share",
    "q16_supplier_part_counts",
    "flagship_event_shaping",
    "cdc_filter_event",
    "cdc_filter_property",
    "cdc_mutability_passthrough",
    "void_scrub_projection",
    "dedup_exact_fingerprint",
    "dedup_exact_with_duplicates",
    "dedup_incremental_new_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard_blocked",
    "dedup_connected_components",
    "dedup_connected_components_star",
    "dedup_cluster_representatives",
    "dedup_embedding_cosine",
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_word_frequencies",
    "text_clean_normalize",
    "text_redact_numbers",
    "text_repetition_filter",
    "text_gopher_rules",
    "dedup_decontaminate_benchmark",
    "split_train_holdout",
    "text_sequence_packing",
    "corpus_sample_weighted",
    "corpus_prep_pipeline",
    "multimodal_image_features",
    "multimodal_frame_plan",
    "events_daily_active_users",
    "events_funnel_signup_click_purchase",
    "events_weekly_retention",
    "events_user_engagement",
    "events_tumbling_window_counts",
    "events_session_window_stats",
    "events_sliding_window_counts",
    "asof_join_last_purchase",
    "range_join_close_events",
    "approx_sketches",
    "approx_heavy_hitters",
    "window_sessionization_ids",
    "window_range_interval_frame",
    "agg_salted_skew",
)


def _ordered() -> list[QueryDef]:
    _load()
    rank = {name: i for i, name in enumerate(_PRIORITY)}
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    tail = [q for name, q in REGISTRY.items() if name not in rank]
    head = sorted((q for name, q in REGISTRY.items() if name in rank),
                  key=lambda q: rank[q.name])
    return head + tail


def all_queries() -> dict[str, SparkQuery]:
    return {q.name: q.spark_fn for q in _ordered()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import relational  # noqa: F401
    from . import tpch_like  # noqa: F401
    from . import advanced  # noqa: F401
    from . import advanced2  # noqa: F401
    from . import cdc_queries  # noqa: F401
    from . import product_analytics  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import multimodal_queries  # noqa: F401
    from . import clustering  # noqa: F401
    from . import search_linkage  # noqa: F401
    from . import ann_eval  # noqa: F401
    from . import tokenizer  # noqa: F401
    _LOADED = True
