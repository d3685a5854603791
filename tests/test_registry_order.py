"""Registry-order regression gate.

The driver's per-round correctness check covers roughly the FIRST 50
registry entries. ``registry.CORE_FIRST`` pins exactly which 50 those
are. Round 4 closes the last certification gap: slots 2-19 are the 18
oracle-backed queries that had no driver verdict after rounds 1-3,
slots 20-21 the new deterministic ANN oracle twins, and the rest
re-certify r1/r2-green queries whose modules changed after their last
driver verdict (the round-3 NULL/fuzz fixes). This test fails the
build if a new query ever displaces the pinned set.
"""

from __future__ import annotations

import __spark_entry__ as e
from pulsar_project_spark.registry import CORE_FIRST, NEVER_CHECKED_R4

# Cumulative driver-green after rounds 1-3 (CORRECTNESS_r01 ∪ r02 ∪
# r03): used to prove the never-checked list really was never checked.
_R123_GREEN = {
    # r2 window
    "simple_rag_topk", "keyword_score_scan", "clean_string_projection",
    "truncate_display_200", "token_count_destopped", "filename_sanitize",
    "title_extraction", "marker_extraction", "fenced_json_roundtrip",
    "tool_catalog_last_wins", "tool_routing_first_match",
    "extension_lookup_default", "kv_lookup_miss_message",
    "arg_whitelist_projection", "arg_schema_casting", "boolean_normalize",
    "numeric_convertibility", "keep_last_n_per_user",
    "latest_event_per_user", "evict_min_per_type", "microbatch_rollup",
    "memory_state_snapshot", "json_props_extract", "group_count_by_type",
    "per_user_activity", "term_frequency_top20", "lang_corpus_stats",
    "distinct_tokens_except_stopwords", "pricing_summary",
    "top_revenue_orders", "national_revenue", "orders_by_month",
    "user_event_windows", "sessionization", "conversion_funnel",
    "shipping_priority_top10", "customer_ltv_segments",
    "sql_brand_volume", "profile_orders_table", "user_value_ranks",
    "asof_last_purchase", "attribution_window_join",
    "daily_user_series_gapfilled", "user_value_trend",
    "median_order_cents_by_priority", "langid_profile_scores",
    "quality_scores", "feature_hash_embeddings", "bpe_token_counts",
    "simhash_fingerprints",
    # r1-only extras (multimodal certified round 1)
    "exact_dedup_fingerprint", "multimodal_asset_catalog",
    "image_decode_stub", "byte_histogram_features",
    "video_frame_sample_plan", "audio_chunk_plan",
    # r3 window
    "bm25_scores", "bm25_topk", "hybrid_bm25_cosine_rerank",
    "knn_cosine_topk", "srp_lsh_buckets", "srp_near_pairs",
    "label_centroid_qsums", "embedding_int8_quantize",
    "ngram_jaccard_pairs", "minhash_lsh_bands", "minhash_candidate_pairs",
    "rolling_fingerprint", "neardup_components",
    "cluster_best_representative", "contamination_ngram_overlap",
    "vocab_min_max_df", "split_assignment_counts", "quality_filter_audit",
    "token_cooccurrence_top20", "repetition_top_bigram",
    "sequence_packing_bins", "props_digit_redaction",
    "doc_chunks_overlapping", "chunk_exact_dedup", "corpus_pipeline_e2e",
    "star_revenue_region_segment_month", "revenue_rollup_region_nation",
    "cube_orders_status_priority", "grouping_sets_region_priority",
    "unpivot_event_matrix", "pivot_event_type_by_day",
    "except_click_days_no_purchase", "intersect_click_and_purchase_days",
    "fuzzy_part_name_pairs", "value_histogram_by_type",
    "parts_no_bulk_order", "orders_above_priority_mean",
    "late_shipment_priority_counts", "big_order_customers",
    "customer_order_count_distribution", "orders_above_customer_avg",
    "except_all_click_days", "fact_fact_smj_rollup",
    "forward_fill_user_values", "daily_revenue_7d_ma",
    "label_fact_urljoin", "jsonl_roundtrip_counts",
    "json_path_stats_native",
}


def test_core_fifty_lead_the_registry():
    names = list(e.queries())
    assert len(CORE_FIRST) == 50
    assert names[: len(CORE_FIRST)] == list(CORE_FIRST)


def test_core_fifty_all_have_oracles():
    # every driver-budget entry must get the STRONG check (hash vs
    # DuckDB), not the rows-only fallback
    oracles = e.oracle_sql()
    missing = [n for n in CORE_FIRST if n not in oracles]
    assert not missing, f"core entries without oracles: {missing}"


def test_canary_leads():
    # slot 1 is the flagship, green r1+r2+r3 — if the driver ever
    # reports it red, the harness (not the engine) changed
    assert CORE_FIRST[0] == "simple_rag_topk"


def test_all_never_checked_queries_get_a_slot():
    # the POINT of round 4's rotation: after it, every oracle-backed
    # declared query has a driver verdict
    assert len(NEVER_CHECKED_R4) == 18
    missing = [n for n in NEVER_CHECKED_R4 if n not in CORE_FIRST]
    assert not missing, f"never-checked queries without a slot: {missing}"
    # ...and none of them was already green (else the slot is wasted)
    wasted = [n for n in NEVER_CHECKED_R4 if n in _R123_GREEN]
    assert not wasted, f"slot spent on already-green queries: {wasted}"


def test_new_ann_twins_get_slots():
    assert "ivf_cell_assignment" in CORE_FIRST
    assert "mmr_rerank_exact" in CORE_FIRST


def test_remaining_slots_are_deliberate_recerts():
    # every slot that isn't canary/never-checked/new must be a KNOWN
    # r1-r3-green query (a re-cert), never an accidental stranger
    new = {"ivf_cell_assignment", "mmr_rerank_exact"}
    strangers = [
        n for n in CORE_FIRST[1:]
        if n not in NEVER_CHECKED_R4 and n not in new and n not in _R123_GREEN
    ]
    assert not strangers, f"unexplained core entries: {strangers}"


def test_all_declared_queries_still_registered():
    # rotation must not LOSE anything: every green name and every
    # CORE_FIRST name still resolves to a runnable query
    names = set(e.queries())
    for n in CORE_FIRST:
        assert n in names, f"core entry vanished from registry: {n}"
    lost = _R123_GREEN - names
    assert not lost, f"previously-green queries vanished: {lost}"
