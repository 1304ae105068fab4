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
    # --- r11 rotation (the r10 verdict's task #1): lead with the 5
    # r07-stale rows deferred from the r10 window, then the 4 rows
    # ADDED this round, then 41 of the 50 r08-green rows (9 deferred
    # to r12 with family notes atop _DEMOTED). After this window lands
    # no oracled row's last driver check is staler than r08.
    # Staleness audit: COVERAGE.md
    # §staleness. (Bookkeeping note, r10-verdict ADVICE #4: the r10
    # window promoted 19 of the 24 r07-stale rows — 5 deferred, 2 of
    # those slots displaced by the r10-new rows — not the "21/3" the
    # r10-era comment claimed.) ---
    # r07-stale (the 5 rows deferred from r10 — retire the tier):
    "events_resample_interpolate",
    "graph_khop_distance",
    "window_cumulative_revenue",
    "agg_stats_quantiles",
    "join_outer_coalesce",
    # new in r11 (never driver-checked — hoisted straight into the
    # window so no oracled row stays never-checked; the four
    # displaced r08 rows sit atop _DEMOTED with family notes):
    "dedup_containment",
    "corpus_sample_weighted_wor",
    "text_bm25_topk",
    "events_ewma_smoothing",
    # r08-stale (41 of 50 promoted; the 9 deferred to r12 — 5 by the
    # 50-slot limit, 4 displaced by the r11-new rows — sit atop
    # _DEMOTED with their in-window family coverage):
    "corpus_substring_spans_incremental",
    "corpus_export_manifest",
    "scd2_time_travel",
    "window_distinct_running",
    "agg_mad_robust",
    "text_lang_confusion",
    "dedup_ngram_jaccard",
    "json_extraction",
    "multimodal_features",
    "vector_norms_by_label",
    "scd2_current_state",
    "scd2_duplicate_current_check",
    "agg_conditional_counts",
    "join_asof_events",
    "sort_topk_orders",
    "scalar_functions",
    "filter_point_lookup_current",
    "window_top_per_customer",
    "scd2_change_frequency",
    "join_revenue_by_nation",
    "scd2_as_of",
    "agg_pricing_summary",
    "setop_except_intersect",
    "events_session_windows",
    "ivm_join_view",
    "customer_rfm_segments",
    "scalar_map_functions",
    "layout_zorder_tiles",
    "corpus_dsir_weights",
    "text_bpe_pair_counts",
    "agg_bitwise",
    "corpus_dsir_resample",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_profit",
    "tpch_q12_priority_by_class",
    "tpch_q16_supplier_relationship",
    "tpch_q19_disjunctive_brackets",
    "tpch_q20_excess_shippers",
    "text_heavy_hitters",
    "scd2_incremental_histogram",
]
_DEMOTED = [
    # --- 9 r08-green rows deferred to the r12 window (5 by the
    # 50-slot limit, 4 displaced by the r11-new rows); each one's
    # operator family stays in-window per the note. ---
    "scd2_histogram_quantiles",  # last green r08 (displaced by r11-new events_ewma_smoothing); scd2 family in-window via scd2_current_state + scd2_change_frequency + scd2_incremental_histogram
    "events_cohort_retention",  # last green r08 (displaced by r11-new text_bm25_topk); events family in-window via events_session_windows + events_resample_interpolate
    "corpus_temperature_mix",  # last green r08 (displaced by r11-new dedup_containment); corpus family in-window via corpus_dsir_weights + corpus_dsir_resample + corpus_export_manifest + corpus_sample_weighted_wor
    "scd2_version_diff",  # last green r08 (displaced by r11-new corpus_sample_weighted_wor); scd2 family in-window via scd2_current_state + scd2_change_frequency + scd2_incremental_histogram + scd2_histogram_quantiles
    "window_ntile_percentile",  # last green r08; window family in-window via window_distinct_running + window_top_per_customer + window_cumulative_revenue
    "scd2_validation_summary",  # last green r08; scd2 family in-window via scd2_current_state + scd2_duplicate_current_check + scd2_change_frequency + scd2_time_travel
    "agg_union_metric_rows",  # last green r08; agg family in-window via agg_conditional_counts + agg_bitwise + agg_mad_robust
    "tpch_q8_market_share",  # last green r08; tpch family in-window via q2/q7/q9/q12/q16/q19/q20
    "events_transition_matrix",  # last green r08; events family in-window via events_session_windows + events_cohort_retention + events_resample_interpolate
    # --- everything below is driver-green r09-r10.
    # agg_distinct_sketch_rollup is rows-only BY DESIGN (HLL has no
    # DuckDB twin); pytest-pinned. ---
    # r09-green (the full r09 window):
    "agg_approx_aggregates",  # last green r09
    "corpus_chunk_spans",  # last green r09
    "corpus_decontaminate",  # last green r09
    "corpus_keep_decisions",  # last green r09
    "corpus_length_buckets",  # last green r09
    "corpus_paragraph_dedup",  # last green r09
    "corpus_sample_quality_weighted",  # last green r09
    "corpus_sample_stratified",  # last green r09
    "dedup_components",  # last green r09
    "dedup_minhash_lsh",  # last green r09
    "knn_cosine_brute",  # last green r09
    "relational_unpivot",  # last green r09
    "scd2_dim_history",  # last green r09
    "scd2_interval_integrity",  # last green r09
    "text_lm_surprisal",  # last green r09
    "text_pii_redaction",  # last green r09
    "text_repetition_scores",  # last green r09
    "text_rolling_fingerprint",  # last green r09
    "text_tfidf_keywords",  # last green r09
    "window_range_frame",  # last green r09
    "agg_cube",  # last green r09
    "agg_exact_percentiles",  # last green r09
    "agg_grouped_having",  # last green r09
    "agg_important_parts",  # last green r09
    "agg_linear_regression",  # last green r09
    "ann_ivf_topk",  # last green r09
    "ann_sq_topk",  # last green r09
    "corpus_domain_caps",  # last green r09
    "corpus_source_mix",  # last green r09
    "corpus_token_budget",  # last green r09
    "corpus_zipf_stats",  # last green r09
    "dedup_exact_groups",  # last green r09
    "events_resample_ffill",  # last green r09
    "join_anti",  # last green r09
    "join_interval_events",  # last green r09
    "join_lateral_topk",  # last green r09
    "join_top_quarter_supplier",  # last green r09
    "multimodal_frame_sample",  # last green r09
    "multimodal_image_features",  # last green r09
    "scd2_flag_consistency_check",  # last green r09
    "scd2_incremental_extrema",  # last green r09
    "scd2_incremental_revenue",  # last green r09
    "scd2_timestamp_continuity",  # last green r09
    "semdedup_keep",  # last green r09
    "setop_union_by_name",  # last green r09
    "subquery_correlated_scalar",  # last green r09
    "subquery_in_having",  # last green r09
    "subquery_sole_late_supplier",  # last green r09
    "text_quality_scores",  # last green r09
    "window_lag_lead",  # last green r09
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
