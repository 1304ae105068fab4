from __future__ import annotations

import sys
from pathlib import Path

# the driver may invoke pytest from any cwd; make the package importable
# regardless (same bootstrap as __spark_entry__)
_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import datetime as dt
from decimal import Decimal

import pytest

from cdc_historical_warehouse_platform_spark.session import get_spark
from cdc_historical_warehouse_platform_spark.schemas import CHANGE_SCHEMA

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="cdc-historical-warehouse-platform-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s


def make_change(
    id: int,
    op: str,
    ts: dt.datetime,
    quantity: int = 1,
    unit_price: str = "10.00",
    status: str = "pending",
    customer_id: int = 100,
    product_id: int = 200,
    order_date: dt.datetime | None = None,
):
    """One CDC change record shaped like FIXTURES.md §1.2 (typed form)."""
    price = Decimal(unit_price)
    total = price * quantity
    od = order_date or dt.datetime(2026, 2, 1, 20, 0, 0)
    return {
        "id": id,
        "customer_id": customer_id,
        "product_id": product_id,
        "quantity": quantity,
        "unit_price": price,
        "total_amount": total,
        "order_status": status,
        "order_date": od,
        "last_updated": ts,
        "created_at": od,
        "operation_type": op,
        "cdc_timestamp": ts,
        "extracted_at": ts,
    }


@pytest.fixture
def change_df(spark):
    def _make(rows):
        return spark.createDataFrame(rows, CHANGE_SCHEMA)

    return _make


# --- driver-budget tiering (r13, verdict task #6) ---------------------------
# The heavy integration/property tier (every test that measured >= 8 s
# in the r13 full-suite duration profile; 54 tests, ~970 s of a
# ~2000 s suite). pytest.ini deselects it by default so the DRIVER's
# `pytest tests/ -x -q` gate finishes inside its budget; the full
# suite stays the builder's local gate:  pytest -m "slow or not slow".
# Criterion is mechanical (the duration profile), not semantic — every
# operator family keeps its faster tests in the default tier.
_SLOW_TESTS = {
    "test_ann_index.py::test_append_uses_stored_quantizer",
    "test_ann_index.py::test_build_once_probe_equals_inline_rebuild",
    "test_ann_index.py::test_int8_index_probe_matches_manual_sq_scoring",
    "test_ann_index.py::test_vacuum_never_deletes_pointer_pinned_version",
    "test_ann_index.py::test_vacuum_reclaims_old_epochs_keeps_live_pair",
    "test_bucketed_dim.py::test_lockstep_equality_with_full_rewrite_store",
    "test_bucketed_dim.py::test_mor_lockstep_equality_and_delta_bound",
    "test_bucketed_dim.py::test_time_travel_reads_bucketed_store",
    "test_bucketed_dim.py::test_time_travel_reads_mor_store",
    "test_datapipe.py::test_ann_lsh_finds_planted_neighbors",
    "test_datapipe.py::test_banded_near_dup_adapts_dim_to_wide_vectors",
    "test_datapipe.py::test_banded_near_dup_arrow_preserves_string_ids",
    "test_datapipe.py::test_banded_near_dup_arrow_signature_matches_expr",
    "test_datapipe.py::test_banded_near_dup_equals_brute_force",
    "test_datapipe.py::test_bucketed_state_corpus_end_to_end",
    "test_datapipe.py::test_corpus_build_auto_adopts_bucketed_state",
    "test_datapipe.py::test_corpus_compact_migrates_flat_state_to_bucketed",
    "test_datapipe.py::test_corpus_compact_state_dirs",
    "test_datapipe.py::test_corpus_per_source_quota_build_and_append",
    "test_datapipe.py::test_corpus_quality_model_gate_build_and_append",
    "test_datapipe.py::test_corpus_quota_adoption_rides_the_marker",
    "test_datapipe.py::test_corpus_top_tokens_tracking",
    "test_datapipe.py::test_rebuild_clears_legacy_caps_file_and_stale_counts",
    "test_datapipe.py::test_simhash_portable_matches_xxhash_recall",
    "test_datapipe.py::test_state_migration_crash_windows",
    "test_exact_substring.py::test_order_free_replay_any_commit_subset",
    "test_export.py::test_export_chain_prefix_sum_contract",
    "test_export.py::test_forget_then_export_excludes_forgotten_docs",
    "test_forget.py::test_concurrent_epoch_writes_crash_before_marker_repairs_exactly",
    "test_forget.py::test_corpus_forget_end_to_end",
    "test_forget.py::test_corpus_forget_returns_quota_headroom",
    "test_incremental_agg.py::test_bootstrap_from_existing_dimension",
    "test_incremental_agg.py::test_delete_then_reinsert",
    "test_incremental_agg.py::test_extrema_group_move_and_late_events",
    "test_incremental_agg.py::test_extrema_insert_update_delete_matches_recompute",
    "test_incremental_agg.py::test_hint_broadcast_off_is_plan_only_not_semantics",
    "test_incremental_agg.py::test_histogram_matches_recompute_across_ops",
    "test_incremental_agg.py::test_histogram_store_maintenance_batch_and_stream",
    "test_incremental_agg.py::test_insert_update_delete_matches_recompute",
    "test_incremental_agg.py::test_pipeline_load_maintains_summary_e2e",
    "test_ivm_join.py::test_two_sided_random_sequences_track_recompute",
    "test_pipeline.py::test_delete_flows_through_pipeline",
    "test_pipeline.py::test_e2e_simulator_extractor_loader",
    "test_pipeline.py::test_lineage_report_artifact",
    "test_property_datapipe.py::test_incremental_dedup_invariants_for_random_batches",
    "test_property_datapipe.py::test_incremental_substr_any_split_any_probe_schedule",
    "test_property_scd2.py::test_random_sequences_hold_invariants_and_match_bulk_build",
    "test_rangejoin.py::test_matches_naive_on_boundary_dense_data",
    "test_scd2.py::test_build_from_change_log_matches_iterated_merges",
    "test_scd2.py::test_dim_store_first_batch_bulk_path_equals_merge",
    "test_streaming.py::test_corpus_append_stream_matches_batch_and_survives_restart",
    "test_streaming.py::test_scd2_stream_available_now",
    "test_streaming.py::test_scd2_stream_maintains_summary",
    "test_ann_index.py::test_bulk_probe_matches_broadcast_and_avoids_query_broadcast",
    "test_ann_index.py::test_pq_bulk_probe_matches_broadcast_and_avoids_query_broadcast",
    "test_ann_index.py::test_rebuild_crash_leaves_consistent_pair",
    "test_ann_index.py::test_semdedup_accepts_prebuilt_centroids",
    "test_ann_index.py::test_two_stage_probe_matryoshka_layout",
    "test_bucketed_dim.py::test_mor_compaction_preserves_state_and_clears_deltas",
    "test_bucketed_dim.py::test_vacuum_retires_only_superseded_dirs",
    "test_datapipe.py::test_incremental_minhash_segment_probe_matches_broadcast",
    "test_exact_substring.py::test_incremental_compact_preserves_spans_and_drops_dead_rows",
    "test_export.py::test_export_range_sharding_keeps_packs_contiguous",
    "test_sampling.py::test_write_training_shards_manifest_and_bounds",
    "test_streaming.py::test_scd2_stream_into_mor_and_bucketed_stores",
}


def pytest_collection_modifyitems(config, items):
    import re as _re

    for item in items:
        base = _re.sub(r"\[.*\]$", "", item.nodeid)
        base = base.split("tests/")[-1]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
