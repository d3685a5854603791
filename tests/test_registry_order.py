"""Registry-order regression gate.

The driver's per-round correctness check covers roughly the FIRST 50
registry entries. ``registry.CORE_FIRST`` pins exactly which 50 those
are. Round 3 rotated the budget onto the never-driver-checked tail
(BM25/hybrid, dedup/similarity, corpus-pipeline, star/relational) —
the 50 round-2 entries are cumulative driver-green
(CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json) and vacate their slots.
This test fails the build if a new query ever displaces the pinned set.
"""

from __future__ import annotations

import __spark_entry__ as e
from pulsar_project_spark.registry import CORE_FIRST


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
    # slot 1 is the flagship, green r1+r2 — if the driver ever reports
    # it red, the harness (not the engine) changed
    assert CORE_FIRST[0] == "simple_rag_topk"


def test_budget_rotated_onto_unchecked_tail():
    # every non-canary slot must be a query that had NO driver verdict
    # before round 3 — the point of the rotation. The round-2 green set
    # is pinned here so nobody accidentally re-spends budget on it.
    r2_green = {
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
    }
    respent = [n for n in CORE_FIRST[1:] if n in r2_green]
    assert not respent, f"budget re-spent on already-green queries: {respent}"


def test_all_declared_queries_still_registered():
    # rotation must not LOSE anything: every r2-green name and every
    # CORE_FIRST name still resolves to a runnable query
    names = set(e.queries())
    for n in CORE_FIRST:
        assert n in names, f"core entry vanished from registry: {n}"
