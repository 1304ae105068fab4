"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cdc_historical_warehouse_platform_spark/``; this module is a
thin adapter over the query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# The driver may import this module from anywhere; make the package importable.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Spark's Python workers see PYTHONPATH, not the driver's sys.path — keep
# Pandas-UDF queries importable when the driver runs from a neutral cwd.
# Best-effort: only helps sessions created after this import.
import os  # noqa: E402

if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO, os.environ.get("PYTHONPATH")) if p
    )

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: SCD2 change-frequency report (SURVEY.md §2 A3) over an
    SCD2 dimension built end-to-end from the deterministic change log
    derived from sf0.001 orders."""
    from cdc_historical_warehouse_platform_spark.plans.reference_queries import q_change_frequency

    return q_change_frequency(spark, SMOKE_SF_DIR)


# The driver's correctness gate checks the FIRST 50 registry entries in
# insertion order (CORRECTNESS_r02 row order == registry order, cut at 50).
# _PRIORITY holds the current round's 50-row window — rotated each round to
# the rows whose last driver check is stalest (per-round audit in
# COVERAGE.md §staleness).  _DEMOTED parks recently-green rows past the
# window; they stay covered by scripts/check_oracle.py + pytest locally.
_PRIORITY = [
    # --- r12 rotation (the r11 verdict's task #2): lead with the 9
    # r08-green rows deferred from the r11 window (retiring the r08
    # tier), then the 14 rows ADDED this round (never driver-checked —
    # hoisted straight in), then 27 of the 50 r09-green rows (23
    # deferred to r13 with family notes atop _DEMOTED). After this
    # window lands no oracled row's last driver check is staler than
    # r09. Staleness audit: COVERAGE.md §staleness. ---
    # r08-stale (the 9 rows deferred from r11 — retire the tier):
    "scd2_histogram_quantiles",
    "events_cohort_retention",
    "corpus_temperature_mix",
    "scd2_version_diff",
    "window_ntile_percentile",
    "scd2_validation_summary",
    "agg_union_metric_rows",
    "tpch_q8_market_share",
    "events_transition_matrix",
    # new in r12 (never driver-checked):
    "agg_winsorized_stats",
    "agg_weighted_median",
    "text_char_ngram_diversity",
    "corpus_ngram_coverage",
    "dedup_cluster_size_histogram",
    "events_mann_whitney_u",
    "events_autocorr_lag1",
    "join_asof_tolerance",
    "scd2_fact_temporal_join",
    "corpus_global_shuffle",
    "corpus_bloom_prefilter",
    "multimodal_audio_features",
    "join_asof_nearest",
    "scd2_bitemporal_revision_audit",
    # r09-stale (27 of 50 promoted; the 23 deferred to r13 sit atop
    # _DEMOTED with their in-window family coverage):
    "agg_approx_aggregates",
    "corpus_decontaminate",
    "corpus_keep_decisions",
    "corpus_paragraph_dedup",
    "dedup_components",
    "dedup_minhash_lsh",
    "relational_unpivot",
    "scd2_dim_history",
    "scd2_interval_integrity",
    "text_repetition_scores",
    "text_tfidf_keywords",
    "window_range_frame",
    "agg_exact_percentiles",
    "agg_grouped_having",
    "ann_ivf_topk",
    "corpus_domain_caps",
    "corpus_source_mix",
    "corpus_token_budget",
    "corpus_zipf_stats",
    "join_interval_events",
    "join_lateral_topk",
    "multimodal_image_features",
    "scd2_incremental_revenue",
    "semdedup_keep",
    "subquery_correlated_scalar",
    "subquery_sole_late_supplier",
    "text_quality_scores",
]
_DEMOTED = [
    # --- 5 more r09-green rows deferred to r13, displaced by the 5
    # late-r12 rows (corpus_global_shuffle / corpus_bloom_prefilter /
    # multimodal_audio_features / join_asof_nearest /
    # scd2_bitemporal_revision_audit, hoisted never-checked). ---
    "corpus_sample_stratified",  # last green r09; corpus-sampling family in-window via corpus_temperature_mix + corpus_global_shuffle
    "join_top_quarter_supplier",  # last green r09; join family in-window via join_lateral_topk + join_interval_events + join_asof_nearest
    "ann_sq_topk",  # last green r09; ANN family in-window via ann_ivf_topk
    "agg_linear_regression",  # last green r09; agg family in-window via agg_exact_percentiles + agg_grouped_having + agg_winsorized_stats
    "scd2_flag_consistency_check",  # last green r09; scd2-validation family in-window via scd2_interval_integrity + scd2_validation_summary
    # --- 18 r09-green rows deferred to the r13 window (displaced by
    # the 9 r08-deferred rows + 9 r12-new rows); each one's operator
    # family stays in-window per the note. ---
    "text_lm_surprisal",  # last green r09; text family in-window via text_repetition_scores + text_quality_scores + text_tfidf_keywords + text_char_ngram_diversity
    "corpus_chunk_spans",  # last green r09; corpus family in-window via corpus_decontaminate + corpus_keep_decisions + corpus_ngram_coverage + corpus_domain_caps
    "knn_cosine_brute",  # last green r09; ANN family in-window via ann_ivf_topk + ann_sq_topk
    "events_resample_ffill",  # last green r09; events family in-window via events_cohort_retention + events_transition_matrix + events_mann_whitney_u + events_autocorr_lag1
    "multimodal_frame_sample",  # last green r09; multimodal family in-window via multimodal_image_features
    "corpus_sample_quality_weighted",  # last green r09; corpus-sampling family in-window via corpus_sample_stratified + corpus_temperature_mix
    "corpus_length_buckets",  # last green r09; corpus-stats family in-window via corpus_source_mix + corpus_zipf_stats
    "agg_cube",  # last green r09; agg family in-window via agg_grouped_having + agg_union_metric_rows + agg_winsorized_stats
    "agg_important_parts",  # last green r09; agg family in-window via agg_exact_percentiles + agg_weighted_median
    "text_rolling_fingerprint",  # last green r09; text family in-window via text_repetition_scores + text_char_ngram_diversity
    "text_pii_redaction",  # last green r09; text family in-window via text_quality_scores + text_lm_surprisal
    "join_anti",  # last green r09; join family in-window via join_lateral_topk + join_top_quarter_supplier + join_interval_events
    "window_lag_lead",  # last green r09; window family in-window via window_range_frame + window_ntile_percentile
    "subquery_in_having",  # last green r09; subquery family in-window via subquery_correlated_scalar + subquery_sole_late_supplier
    "scd2_incremental_extrema",  # last green r09; scd2-incremental family in-window via scd2_incremental_revenue + scd2_histogram_quantiles
    "scd2_timestamp_continuity",  # last green r09; scd2-validation family in-window via scd2_interval_integrity + scd2_flag_consistency_check + scd2_validation_summary
    "dedup_exact_groups",  # last green r09; dedup family in-window via dedup_components + dedup_minhash_lsh + corpus_paragraph_dedup
    "setop_union_by_name",  # last green r09; set-op union coverage in-window via agg_union_metric_rows (UNION ALL tier)
    # --- everything below is driver-green r10-r11.
    # agg_distinct_sketch_rollup is rows-only BY DESIGN (HLL has no
    # DuckDB twin); pytest-pinned. ---
    # r10-green (the full r10 window):
    "text_html_extract",  # last green r10
    "text_gopher_rules",  # last green r10
    "text_c4_filters",  # last green r10
    "text_unicode_sanitize",  # last green r10
    "ann_two_stage_rerank",  # last green r10
    "dedup_url_normalized",  # last green r10
    "events_throttle_dedup",  # last green r10
    "subquery_exists",  # last green r10
    "subquery_not_exists",  # last green r10
    "events_tumbling_window",  # last green r10
    "scd2_version_timeline",  # last green r10
    "text_token_stats",  # last green r10
    "join_unshipped_revenue",  # last green r10
    "agg_grouping_sets",  # last green r10
    "ann_lsh_topk",  # last green r10
    "sort_pagination",  # last green r10
    "scalar_string_functions",  # last green r10
    "dedup_simhash",  # last green r10
    "setop_all_variants",  # last green r10
    "corpus_pack_sequences",  # last green r10
    "window_salted_topk",  # last green r10
    "window_small_quantity_revenue",  # last green r10
    "embedding_near_dup",  # last green r10
    "array_functions_sweep",  # last green r10
    "text_bigram_surprisal",  # last green r10
    "dedup_keep_list",  # last green r10
    "tpch_q6_forecast_revenue",  # last green r10
    "tpch_q10_returned_items",  # last green r10
    "tpch_q13_customer_distribution",  # last green r10
    "tpch_q14_promo_revenue",  # last green r10
    "events_funnel_steps",  # last green r10
    "join_full_outer",  # last green r10
    "events_sliding_window",  # last green r10
    "agg_pivot",  # last green r10
    "window_rank_dense",  # last green r10
    "filter_key_history",  # last green r10
    "agg_rollup",  # last green r10
    "join_semi",  # last green r10
    "sql_api_revenue_by_segment",  # last green r10
    "corpus_exact_substring_spans",  # last green r10
    "corpus_substring_clean",  # last green r10
    "events_gap_islands",  # last green r10
    "agg_mode_frequent",  # last green r10
    "events_anomaly_zscore",  # last green r10
    "graph_pagerank_top",  # last green r10
    "join_fuzzy_part_names",  # last green r10
    "basket_brand_pairs",  # last green r10
    "agg_higher_moments",  # last green r10
    "agg_listagg_ordered",  # last green r10
    "agg_boolean_aggregates",  # last green r10
    # r11-green (the full r11 window):
    "events_resample_interpolate",  # last green r11
    "graph_khop_distance",  # last green r11
    "window_cumulative_revenue",  # last green r11
    "agg_stats_quantiles",  # last green r11
    "join_outer_coalesce",  # last green r11
    "dedup_containment",  # last green r11
    "corpus_sample_weighted_wor",  # last green r11
    "text_bm25_topk",  # last green r11
    "events_ewma_smoothing",  # last green r11
    "corpus_substring_spans_incremental",  # last green r11
    "corpus_export_manifest",  # last green r11
    "scd2_time_travel",  # last green r11
    "window_distinct_running",  # last green r11
    "agg_mad_robust",  # last green r11
    "text_lang_confusion",  # last green r11
    "dedup_ngram_jaccard",  # last green r11
    "json_extraction",  # last green r11
    "multimodal_features",  # last green r11
    "vector_norms_by_label",  # last green r11
    "scd2_current_state",  # last green r11
    "scd2_duplicate_current_check",  # last green r11
    "agg_conditional_counts",  # last green r11
    "join_asof_events",  # last green r11
    "sort_topk_orders",  # last green r11
    "scalar_functions",  # last green r11
    "filter_point_lookup_current",  # last green r11
    "window_top_per_customer",  # last green r11
    "scd2_change_frequency",  # last green r11
    "join_revenue_by_nation",  # last green r11
    "scd2_as_of",  # last green r11
    "agg_pricing_summary",  # last green r11
    "setop_except_intersect",  # last green r11
    "events_session_windows",  # last green r11
    "ivm_join_view",  # last green r11
    "customer_rfm_segments",  # last green r11
    "scalar_map_functions",  # last green r11
    "layout_zorder_tiles",  # last green r11
    "corpus_dsir_weights",  # last green r11
    "text_bpe_pair_counts",  # last green r11
    "agg_bitwise",  # last green r11
    "corpus_dsir_resample",  # last green r11
    "tpch_q2_min_cost_supplier",  # last green r11
    "tpch_q7_volume_shipping",  # last green r11
    "tpch_q9_product_profit",  # last green r11
    "tpch_q12_priority_by_class",  # last green r11
    "tpch_q16_supplier_relationship",  # last green r11
    "tpch_q19_disjunctive_brackets",  # last green r11
    "tpch_q20_excess_shippers",  # last green r11
    "text_heavy_hitters",  # last green r11
    "scd2_incremental_histogram",  # last green r11
    "agg_distinct_sketch_rollup",  # last green r00 (rows-only by design)
]


def _registry() -> dict[str, tuple]:
    from cdc_historical_warehouse_platform_spark.plans.reference_queries import REFERENCE_QUERIES

    out: dict[str, tuple] = {}
    out.update(REFERENCE_QUERIES)
    try:
        from cdc_historical_warehouse_platform_spark.plans.relational_queries import RELATIONAL_QUERIES

        out.update(RELATIONAL_QUERIES)
    except ImportError:
        pass
    try:
        from cdc_historical_warehouse_platform_spark.plans.datapipe_queries import DATAPIPE_QUERIES

        out.update(DATAPIPE_QUERIES)
    except ImportError:
        pass
    try:
        from cdc_historical_warehouse_platform_spark.plans.tpch_queries import TPCH_QUERIES

        out.update(TPCH_QUERIES)
    except ImportError:
        pass

    ordered: dict[str, tuple] = {}
    for name in _PRIORITY:
        if name in out:
            ordered[name] = out[name]
    for name, item in out.items():
        if name not in ordered and name not in _DEMOTED:
            ordered[name] = item
    for name in _DEMOTED:
        if name in out:
            ordered[name] = out[name]
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys without SQL get a rows-only check."""
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
