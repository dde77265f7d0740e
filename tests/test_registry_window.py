"""Guard the driver's oracle window (VERDICT r02 items 2, 3, 7).

The driver oracles the FIRST ``ORACLE_WINDOW`` entries of ``queries()``
in dict-insertion order. Rounds 1–2 silently re-checked the same 50
queries while the other 50 never produced a correctness row. These tests
make the window's composition an explicit, asserted artifact so a future
registry edit can't silently push a query out of coverage again.

The rotation round comes from the committed ``ORACLE_ROUND`` marker
(round-3 ADVICE: deriving it from untracked CORRECTNESS_r{N}.json
artifacts made the window depend on filesystem state). When rotating
next round, bump ``ORACLE_ROUND`` and update ``MUST_BE_WINDOWED_BY_ROUND``
here — the test is meant to force that edit to be conscious.
"""

from __future__ import annotations

from youtube_scraper_db_spark import registry

#: Per-round MUST-cover sets, keyed by the committed round number. Round
#: 3 windowed the ids never checked in r01/r02; round 4 must cover
#: minhash_lsh_recall (the only entry with no driver row ever — swapped
#: into [0:35] for this purpose) plus the round-3 additions at
#: REGISTRY[100:115].
MUST_BE_WINDOWED_BY_ROUND = {
    3: {
        "simhash_recall",
        "lsh_near_dup_recall",
        "lsh_ann_recall",
        "ivf_ann_topk",
        "ivf_kmeans_recall",
        "merge_upsert_orders",
        "insert_if_absent_orders",
        "keyed_delete_orders",
        "field_update_orders",
        "schema_evolution_union",
        "checkpoint_skip_orders",
        "valid_available_parts",
        "timestamped_docs",
        "segment_join_render",
        "mock_fetch_enrichment",
    },
    4: {
        "minhash_lsh_recall",
        "salted_supplier_revenue",
        "salted_distinct_users",
        "adhoc_sql_nation_revenue",
        "zorder_curve_keys",
        "incremental_rollup_equiv",
        "decontamination_flags",
        "playlists_json_source_roundtrip",
        "transcript_files_roundtrip",
        "inbox_stream_drain",
        "image_header_decode",
        "gif_frame_samples",
        "doc_repetition_stats",
        "int8_ann_topk",
        "int8_ann_recall",
        "substring_dup_flags",
        "corpus_vocab_topk",
        "training_shard_manifest",
        "audio_meta_decode",
        "audio_energy_windows",
        "corpus_curation_report",
        "jsonl_export_roundtrip",
        "pq_ann_recall",
        # session additions (new operator surfaces swapped in over the
        # facade/layout round-trip gates)
        "bpe_pair_counts",
        "token_runs_udtf",
        "status_priority_cube",
    },
    # Round 5: the natural offset-150 window covers all 40 entries that
    # had never produced a driver row (round-4 session additions, the
    # facade/layout/round-trip evictees, the full classic_q* catalog),
    # plus three targeted swaps — the two r04-red array-output gates
    # (label_centroids, doc_token_ids — now stringified) and
    # extracted_page_refs (driver row predates its r4 rewrite) — and the
    # two r1-rewritten gates already in window.
    5: {
        "avi_frame_samples",
        "bmp_pixel_stats",
        "classic_q11_important_stock",
        "classic_q13_custdist",
        "classic_q14_promo_share",
        "classic_q15_top_supplier",
        "classic_q16_supplier_variety",
        "classic_q17_small_qty",
        "classic_q19_bracket_revenue",
        "classic_q20_excess_stock",
        "classic_q21_waiting_supplier",
        "classic_q22_idle_balance",
        "classic_q2_min_cost",
        "classic_q4_priority_counts",
        "classic_q6_revenue_delta",
        "classic_q7_volume_shipping",
        "classic_q8_market_share",
        "column_profile_events",
        "compacted_docs_roundtrip",
        "corpus_facade_annotated",
        "csv_export_roundtrip",
        "custom_source_stream_drain",
        # diff_sync_parts, customers_without_orders and
        # extracted_page_refs yielded their slots to the eight round-5
        # gate debuts: they alone have both an r02 driver row and a
        # judge post-rewrite check, so they wait for the round-8
        # rotation.
        "doc_token_ids",
        "gif_frame_pixel_stats",
        "gif_pixel_stats",
        "jsonl_gzip_roundtrip",
        "label_centroids",
        "lang_mixing_weights",
        "native_session_rollup",
        "not_in_null_semantics",
        "orc_export_roundtrip",
        "order_value_percentrank",
        "partitioned_orders_prune",
        "png_pixel_stats",
        "recursive_cte_closure",
        "referential_integrity_report",
        "stream_full_outer_pairs",
        "stream_update_mode_counts",
        "supplier_revenue_deciles",
        "top_suppliers_with_ties",
        "user_event_type_unpivot",
        "xml_export_roundtrip",
        # round-5 session additions (new gates must debut with a driver
        # row — registered at the tail, inside [150:len])
        "jpeg_pixel_stats",
        "mjpeg_frame_pixel_stats",
        "pcm_depth_energy_windows",
        "adpcm_energy_windows",
        "bpe_apply_tokens",
        "bpe_trained_merges",
        "g711_energy_windows",
        "msadpcm_energy_windows",
    },
    # Round 6 (VERDICT r05 items 1-3): the four former rows-only LSH
    # listings debut their first hash-checked driver rows (portable md5
    # hash families + full SQL oracle replays, registered at indices
    # 45-48 — naturally inside the offset-(200 % len) window), plus the
    # two r4-rewritten gates whose driver rows predate their rewrites.
    # Round-6 session additions (unigram LM tokenizer, HTML text
    # extraction) must also debut with a driver row.
    6: {
        "minhash_lsh_dups",
        "simhash_dups",
        "lsh_near_dups",
        "lsh_ann_topk",
        "diff_sync_parts",
        "customers_without_orders",
        # round-6 session additions (new gates must debut with a driver
        # row; swapped over the three r05-green unmodified entries)
        "unigram_trained_vocab",
        "unigram_apply_tokens",
        "html_text_extract",
        "doc_unigram_quality",
        "hll_distinct_users",
        "cms_user_counts",
        "bloom_customer_filter",
        "image_resize_stats",
        "hll_union_merge",
    },
    # Round 7 (VERDICT r06 items 2-5): the five round-7 debuts (sketch
    # mergeability twins, the WordPiece pair, the bigram-LM quality
    # gate) swap over the five window entries holding fresh r06 rows;
    # the eight round-6 evictees clear their process debt — four sit in
    # the natural [39:89] window already, four swap over recall gates
    # whose family twins were round 6's headline re-verification.
    7: {
        "cms_union_merge",
        "bloom_union_merge",
        "wordpiece_apply_tokens",
        "wordpiece_trained_merges",
        "doc_bigram_quality",
        "per_customer_stats",
        "extracted_page_refs",
        "top_suppliers",
        "cross_linked_parts",
        "customer_order_counts",
        "doc_token_ids",
        "orc_export_roundtrip",
        "label_centroids",
        "stream_hll_distinct_users",
        "stream_cms_user_counts",
        "stream_bloom_customer_filter",
        "histogram_quantile_sketch",
    },
    # Round 8 (VERDICT r07 item 1 + this round's work): the four
    # r03-rowed recall gates (the oldest driver-witnessed rows), the
    # seven round-8 debuts (tokenizer persistence trio, incremental
    # IVF/PQ, streaming histogram, trigram LM), and the four gates
    # modified this round (histogram in-bin witness; CMS probe
    # left-join) — over the nine fresh-r07-rowed window entries plus
    # six r04-green unmodified aggregates.
    8: {
        "simhash_recall",
        "lsh_near_dup_recall",
        "lsh_ann_recall",
        "ivf_kmeans_recall",
        "stream_histogram_quantiles",
        "doc_trigram_quality",
        "bpe_artifact_roundtrip",
        "unigram_artifact_roundtrip",
        "wordpiece_artifact_roundtrip",
        "incremental_ivf_equiv",
        "incremental_pq_equiv",
        "histogram_quantile_sketch",
        "cms_user_counts",
        "cms_union_merge",
        "stream_cms_user_counts",
        # late-round-8 debuts (LM persistence, streaming Misra-Gries,
        # histogram range-sharding)
        "bigram_model_artifact_roundtrip",
        "stream_heavy_hitter_words",
        "histogram_range_shards",
        "incremental_bigram_model_equiv",
        "stream_bpe_apply_tokens",
        "pagerank_near_dups",
        "tfidf_cosine_pairs",
        "label_prop_communities",
    },
    # Round 9 (VERDICT r08 items 1, 4-7): histogram_range_shards re-enters
    # for a fresh row after the oracle's HUGEINT→BIGINT shard cast (the
    # round-8 judge verified values identical — only the oracle output
    # TYPE diverged), plus the round-9 debuts (ANN index artifact
    # persistence, Misra-Gries merge, incremental connected-components
    # fold, trigram model persistence).
    9: {
        "histogram_range_shards",
        "ivf_artifact_roundtrip",
        "pq_artifact_roundtrip",
        "heavy_hitter_merge",
        "incremental_cc_equiv",
        "trigram_model_artifact_roundtrip",
        "incremental_trigram_model_equiv",
        "hll_artifact_fold_roundtrip",
        "cms_artifact_fold_roundtrip",
        "bloom_artifact_fold_roundtrip",
        "histogram_artifact_frozen_fold",
        "heavy_hitter_artifact_fold",
        "hll_distinct_users_by_type",
        "event_value_quantiles_by_type",
        "heavy_hitter_words_by_lang",
    },
    # Round 10 (VERDICT r09 items 1-4): the five round-10 debuts
    # (grouped CMS/Bloom completing the grouped-sketch grid, MinHash
    # index artifact persistence + incremental fold, streaming
    # connected components), plus the seven r04-rowed stragglers the
    # r09 verdict ordered refreshed (their last driver witness was
    # round 4; swapped over low-risk r05 window entries that the
    # natural rotation re-checks in rounds 11-13 at their new indices).
    10: {
        "cms_user_counts_by_type",
        "bloom_filter_by_type",
        "minhash_index_artifact_roundtrip",
        "incremental_minhash_equiv",
        "stream_cc_labels",
        "weighted_sample_merge",
        "stream_lsh_ingest_dups",
        "weighted_sample_by_source",
        "adhoc_sql_nation_revenue",
        "status_priority_cube",
        "bpe_pair_counts",
        "salted_supplier_revenue",
        "salted_distinct_users",
        "jsonl_export_roundtrip",
        "zorder_curve_keys",
        "kmv_distinct_users",
        "kmv_distinct_users_by_type",
        "kmv_union_merge",
        "kmv_semijoin_cardinality",
        "kmv_artifact_fold_roundtrip",
        "event_value_locf",
        "event_value_ewma",
        "event_type_transitions",
        "event_ols_trend",
        "event_type_entropy",
        "pareto_frontier_parts",
        "hilbert_curve_keys",
        "stream_kmv_distinct_users",
        "kmv_rollup_merge",
        "benford_price_digits",
        "trigram_search_docs",
        "near_dup_triangles",
        "event_value_cusum",
        "kmv_antijoin_cardinality",
        "trigram_index_artifact_roundtrip",
        "bm25_search_scores",
        "node_clustering_coefficients",
        "image_dhash_near_dups",
        "fuzzy_name_pairs",
        "user_status_scd2",
        "kmv_sliding_distinct_users",
        "stream_skyline_parts",
        "bm25_index_artifact_fold",
    },
    # Round 11 refreshes the ENTIRE r05-rowed class (40 queries): 33
    # land in the natural window [167:217] via round-10's deliberate
    # tail drops, the 7 displaced/out-of-reach ones swap over r07-rowed
    # slots, and the three round-11 debuts swap over the r10-fresh
    # head-gained classics.
    11: {
        # debuts
        "kmv_sliding_distinct_users_30d",
        "stream_weighted_sample",
        "bloom_pruned_join",
        "pareto_frontier_by_brand",
        "hll_sliding_distinct_users",
        "bloom_pruned_anti_join",
        "heavy_hitter_types_sliding",
        "event_value_quantiles_sliding",
        "bloom_mask_union_merge",
        # r05 stragglers swapped in
        "csv_export_roundtrip",
        "xml_export_roundtrip",
        "compacted_docs_roundtrip",
        "corpus_facade_annotated",
        "partitioned_orders_prune",
        "referential_integrity_report",
        "jsonl_gzip_roundtrip",
        # r05 class refreshed by the natural walk
        "classic_q16_supplier_variety",
        "classic_q14_promo_share",
        "classic_q7_volume_shipping",
        "png_pixel_stats",
        "jpeg_pixel_stats",
        "gif_pixel_stats",
        "bmp_pixel_stats",
        "user_event_type_unpivot",
        "supplier_revenue_deciles",
        "gif_frame_pixel_stats",
        "stream_full_outer_pairs",
        "recursive_cte_closure",
        "avi_frame_samples",
        "native_session_rollup",
        "not_in_null_semantics",
        "classic_q6_revenue_delta",
        "classic_q17_small_qty",
        "classic_q15_top_supplier",
        "classic_q11_important_stock",
        "classic_q19_bracket_revenue",
        "classic_q21_waiting_supplier",
        "classic_q20_excess_stock",
        "classic_q2_min_cost",
        "classic_q8_market_share",
        "custom_source_stream_drain",
        "stream_update_mode_counts",
        "mjpeg_frame_pixel_stats",
        "pcm_depth_energy_windows",
        "adpcm_energy_windows",
        "msadpcm_energy_windows",
        "g711_energy_windows",
        "bpe_apply_tokens",
        "bpe_trained_merges",
    },
    12: {
        # the three round-12 debuts
        "graph_ann_topk",
        "stream_ivf_ingest",
        "sliding_spine_consistency",
        # the full 47-query r06-rowed stale cohort (r11 verdict
        # item 2: clear it in one round)
        "unigram_trained_vocab",
        "unigram_apply_tokens",
        "html_text_extract",
        "simhash_dups",
        "customers_without_orders",
        "lsh_near_dups",
        "diff_sync_parts",
        "doc_unigram_quality",
        "lsh_ann_topk",
        "customers_with_orders",
        "minhash_lsh_dups",
        "line_positions",
        "next_line_position",
        "ordered_part_lists",
        "first_line_per_order",
        "stale_events",
        "pricing_summary",
        "order_lines_detail",
        "part_customer_attribution",
        "recent_lines_enriched",
        "nocase_part_names",
        "event_type_union",
        "regex_shape_filter",
        "order_status_counts",
        "order_item_counts",
        "event_prop_stats",
        "hourly_event_rollup",
        "sessionized_events",
        "latest_user_status",
        "line_durations",
        "extracted_video_ids",
        "doc_search_snippets",
        "sanitized_filenames",
        "iso_export_dates",
        "display_price_labels",
        "embedding_near_dups",
        "embedding_cosine_topk",
        "image_resize_stats",
        "hll_distinct_users",
        "hll_union_merge",
        "bloom_customer_filter",
        "exact_dedup_docs",
        "ngram_jaccard_pairs",
        "doc_fingerprints",
        "doc_token_stats",
        "doc_lang_id",
        "has_order_flag",
    },
    # Round 13: the three never-driver-checked NSW debuts + the full
    # 43-query r07-stale cohort (r12 VERDICT task 1) + this round's
    # debuts. Duplicated here independently of registry._ROUND13_MUST
    # on purpose — the test pins the composition even if the registry
    # list is edited.
    13: {
        "incremental_nsw_equiv",
        "nsw_index_artifact_roundtrip",
        "stream_nsw_ingest",
        "asof_latest_order",
        "bloom_union_merge",
        "bucketed_order_lines",
        "checkpoint_skip_orders",
        "cross_linked_parts",
        "customer_order_counts",
        "doc_bigram_quality",
        "doc_chunks",
        "doc_pii_scrub",
        "doc_split_assign",
        "doc_stratified_sample",
        "doc_token_ids",
        "event_user_moving_avg",
        "event_value_delta",
        "event_value_percentiles",
        "extracted_page_refs",
        "field_update_orders",
        "incremental_dedup_new",
        "insert_if_absent_orders",
        "ivf_ann_topk",
        "keyed_delete_orders",
        "label_centroids",
        "merge_upsert_orders",
        "mock_fetch_enrichment",
        "multimodal_meta",
        "near_dup_clusters",
        "orc_export_roundtrip",
        "per_customer_stats",
        "regional_revenue",
        "schema_evolution_union",
        "segment_join_render",
        "seq_packing_gate",
        "status_priority_rollup",
        "stream_bloom_customer_filter",
        "stream_hll_distinct_users",
        "summary_stats",
        "timestamped_docs",
        "top_orders_per_customer",
        "top_suppliers",
        "uniq_users_sketch",
        "valid_available_parts",
        "wordpiece_apply_tokens",
        "wordpiece_trained_merges",
        # round-13 debuts
        "stream_ivf_delete_equiv",
        "stream_nsw_delete_equiv",
        "stream_lsh_delete_equiv",
        "bloom_sliding_membership",
    },
    # Round 14 (r13 VERDICT item 7): store_compaction_equiv (the one
    # never-driver-checked entry — registered outside the r13 window by
    # design) + the full 49-query r08-stale cohort, the oldest driver
    # rows anywhere (tools/window_census.py --round 14). Duplicated
    # independently of registry._ROUND14_MUST on purpose.
    14: {
        "store_compaction_equiv",
        "bigram_model_artifact_roundtrip",
        "bpe_artifact_roundtrip",
        "cms_union_merge",
        "cms_user_counts",
        "daily_event_counts_dense",
        "decontamination_flags",
        "doc_trigram_quality",
        "event_daily_rollup",
        "event_funnel",
        "event_neighbor_counts",
        "histogram_quantile_sketch",
        "inbox_stream_drain",
        "incremental_bigram_model_equiv",
        "incremental_ivf_equiv",
        "incremental_pq_equiv",
        "incremental_rollup_equiv",
        "ivf_kmeans_recall",
        "label_prop_communities",
        "line_stats_by_flag",
        "lsh_ann_recall",
        "lsh_near_dup_recall",
        "multimodal_frame_samples",
        "nation_share_of_region",
        "near_dedup_keep",
        "order_price_histogram",
        "orders_quality_report",
        "pagerank_near_dups",
        "playlists_json_source_roundtrip",
        "returned_item_customers",
        "shipments_in_transit_daily",
        "shipping_priority",
        "simhash_recall",
        "similar_part_names",
        "status_priority_sets",
        "stream_bpe_apply_tokens",
        "stream_cms_user_counts",
        "stream_correlated_pairs",
        "stream_dedup_user_types",
        "stream_enriched_events",
        "stream_heavy_hitter_words",
        "stream_histogram_quantiles",
        "tfidf_cosine_pairs",
        "token_runs_udtf",
        "transcript_files_roundtrip",
        "unigram_artifact_roundtrip",
        "user_event_type_pivot",
        "user_retention_cohorts",
        "weighted_doc_sample",
        "wordpiece_artifact_roundtrip",
    },
}


def test_rotation_matches_round_offset():
    """queries() must be REGISTRY rotated by window_offset() — the
    deterministic per-round walk that guarantees every query re-enters
    the driver's checked window every ceil(len/50) rounds."""
    names = list(registry.queries())
    off = registry.window_offset()
    expected = [
        s.name
        for s in registry.REGISTRY[off:] + registry.REGISTRY[:off]
    ]
    assert names == expected


def test_offset_walks_fifty_per_round():
    n_reg = len(registry.REGISTRY)
    assert registry._offset_for_round(0) == 0  # fresh repo: natural order
    assert registry._offset_for_round(1) == 0  # r01 checked [0:50]
    assert registry._offset_for_round(2) == 50  # round 3 windows [50:100]
    assert registry._offset_for_round(3) == 100  # round 4: the newest batch
    assert registry._offset_for_round(4) == 150 % n_reg  # wraps
    # ceil(len/50) consecutive rounds cover every query
    rounds_needed = -(-n_reg // registry.ORACLE_WINDOW)
    covered = set()
    for n in range(1, rounds_needed + 1):
        off = registry._offset_for_round(n)
        covered |= {(off + i) % n_reg for i in range(registry.ORACLE_WINDOW)}
    assert covered == set(range(n_reg))


def test_required_queries_inside_window():
    """The committed round's window must cover that round's MUST set —
    offset-independent (round-3 ADVICE: the old offset-gated guard went
    permanently inert once the offset moved past 50)."""
    rnd = registry.current_round()
    must = MUST_BE_WINDOWED_BY_ROUND.get(rnd)
    assert must is not None, (
        f"ORACLE_ROUND={rnd} has no MUST_BE_WINDOWED_BY_ROUND entry — "
        "add one when bumping the marker"
    )
    window = set(list(registry.queries())[: registry.ORACLE_WINDOW])
    missing = must - window
    assert not missing, f"queries pushed out of the driver's checked window: {missing}"


def test_round_marker_is_committed():
    """ORACLE_ROUND must exist and be tracked by git — a fresh clone has
    to compute the same window as this checkout."""
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "ORACLE_ROUND")
    assert os.path.exists(path)
    out = subprocess.run(
        ["git", "-C", root, "ls-files", "--error-unmatch", "ORACLE_ROUND"],
        capture_output=True,
    )
    assert out.returncode == 0, "ORACLE_ROUND is not tracked by git"


def test_every_windowed_query_has_an_oracle():
    window = list(registry.queries())[: registry.ORACLE_WINDOW]
    oracles = registry.oracle_sql()
    missing = [n for n in window if n not in oracles]
    assert not missing, f"windowed queries with no oracle SQL (weaker check): {missing}"


def test_registry_has_no_duplicate_names():
    names = [s.name for s in registry.REGISTRY]
    assert len(names) == len(set(names))


def test_queries_and_oracles_cover_registry():
    q = registry.queries()
    assert len(q) == len(registry.REGISTRY)
    # every oracle key must correspond to a registered query
    assert set(registry.oracle_sql()) <= set(q)
