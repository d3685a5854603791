"""Declared-query registry: every operator the engine claims as done.

Each entry pairs a PySpark plan builder ``(spark, sf_dir) -> DataFrame``
with the ANSI-SQL oracle string DuckDB runs over the same parquet tables.
The driver hash-compares the two at sf0.01 (row count + schema +
order-insensitive value hash) — so every computed column is aliased to
the SAME name on both sides, every top-k carries a total-order tiebreak,
and money/measure sums go through DECIMAL so floating-point summation
order (Spark partial aggregation vs DuckDB single-node) can't skew the
last bits.

``__spark_entry__.py`` re-exports this registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def declare(name: str, oracle: str | None = None):
    """Register a declared query (and its DuckDB oracle, when the op is
    SQL-expressible — streaming/stateful ops omit it → rows-only check)."""
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return wrap


# The driver's correctness gate checks roughly the FIRST 50 registry
# entries. Module import order alone proved fragile (appending a query
# to a core module silently displaces later core entries), so the core
# set is pinned BY NAME and composed from round-stamped blocks:
# canary → never-driver-checked → new-this-round → re-certs of modules
# changed this round after their last verdict → stalest-green refresh,
# trimmed to exactly 50. tests/test_registry_order.py regression-gates
# the composition, reading ONLY driver artifacts from rounds BEFORE the
# round each block asserts (the round-5 version read the unstamped glob
# and went red the moment CORRECTNESS_r05.json landed — VERDICT r5 #1).
NEVER_CHECKED_R7: tuple[str, ...] = (
    # empty: round 6 closed the gap — every oracle-backed query
    # declared before round 7 has a cumulative driver-green verdict
    # (re-derived with tools/rotate_budget.py: 184/184, 0 ever-failed).
)

NEW_R7: tuple[str, ...] = (
    # oracle-backed queries added in round 7 (each also fuzz/test-gated).
    "pgm_permissive_decode_census",    # corrupt-census twin (VERDICT #3)
    "rawv_permissive_sample_census",   # corrupt-census twin (VERDICT #3)
    "jpeg_color_pixel_decode_features", # YCbCr 4:2:0 -> RGB (VERDICT #2)
    "jpeg_color_permissive_decode_census", # corrupt-tolerant color decode
    "tx_compaction_roundtrip_census",  # transactional compaction (VERDICT #6)
    "tx_snapshot_time_travel_census",  # file-level time travel (VERDICT #6)
    "tx_optimize_zorder_census",       # OPTIMIZE ZORDER behind the CAS
    "streaming_tx_exactly_once_census", # idempotent foreachBatch landing
    "tx_pruned_read_census",           # manifest-stats planning-time skip
    "sql_recursive_reachability",      # WITH RECURSIVE, identical-text oracle
    "sql_lateral_order_profile",       # LATERAL correlated agg, decorrelated
    "tx_delete_range_census",          # copy-on-write DELETE via bounds
    "tx_merge_upsert_census",          # copy-on-write MERGE (DML trio)
    "coorder_part_triangles",          # support-thresholded triangle census
    "sole_late_supplier_waits",        # Q21 shape: double-EXISTS decorrelated
    "dormant_rich_customers",          # Q22 shape: exact mean + anti join
    "pareto_frontier_parts",           # banded distributed skyline
    "coorder_part_kcore",              # bounded 3-core peel, unrolled oracle
    "user_value_ewma_dyadic",          # integer EWMA, powers-of-two weights
    "hilbert_bucket_stats",            # Hilbert-curve layout census
    "seasonal_revenue_anomaly_census", # per-weekday median+MAD anomaly flags
    "returned_item_top_customers",     # Q10 shape: returns-desk triage
    "top_supplier_by_quarter_revenue", # Q15 shape: scalar max with ties
    "association_rules_pairs",         # market-basket confidence rules
    "benford_first_digit_census",      # forensic first-digit screen
    "join_view_incremental_maintenance", # IVM delta identity for joins
    "wav_spectral_tilt_features",      # integer audio tilt on real decode
    "ivfpq_adc_topk",                  # IVF-PQ composed, hash-certified
    "tx_clone_divergence_census",      # zero-copy shallow clone + branches
    "zorder3_bucket_stats",            # 3-dimensional Morton clustering
    # the seven shapes completing the classic TPC-H set (Q1/Q3-Q5/Q7-Q10/
    # Q13/Q15/Q16/Q18/Q19/Q21/Q22 analogs were already declared)
    "forecast_revenue_change",         # Q6: pure scan-predicate aggregate
    "min_cost_supplier_per_part",      # Q2: decorrelated MIN + rejoin
    "important_part_stock_value",      # Q11: HAVING vs global scalar
    "ship_delay_priority_matrix",      # Q12: conditional count matrix
    "promo_revenue_share",             # Q14: conditional-agg ratio
    "small_qty_part_revenue",          # Q17: per-part avg cross-multiplied
    "excess_supply_suppliers",         # Q20: nested IN over correlated agg
    "retractable_agg_view_census",     # DBSP weighted changelog w/ deletes
    "bucketed_cojoin_rollup",          # write-time pre-shuffle, 0-exchange join
    "tx_catalog_atomic_move_census",   # cross-table atomic commit (catalog CAS)
    "tx_vacuum_reclaim_census",        # vacuum completes the maintenance trio
    "ks_distance_order_values",        # exact binned two-sample KS distance
    "tx_partition_evolution_census",   # two specs, one table, both prune
    "wav_decimate2_features",          # integer half-band FIR decimation
    "coorder_part_communities",        # deterministic LPA, 4 unrolled rounds
    "prefix_filtered_jaccard_pairs",   # COMPLETE exact similarity join
)

RECERTS_R7: tuple[str, ...] = (
    # modules changed in round 7 after their round-6 verdict:
    # operators/jpeg.py (SOF0 dims returned + assert->ValueError +
    # block-codec refactor shared with the color path)
    "jpeg_entropy_roundtrip_features", "jpeg_pixel_decode_features",
    # operators/multimodal.py (PGM/RAWV helpers extracted,
    # assert->ValueError, permissive variants)
    "png_decode_features", "png_permissive_decode_census",
    "wav_codec_roundtrip_features", "pgm_resize_features",
    "rawv_frame_sample_features",
    # operators/layout.py (norm16 overflow guard + overflow-free step)
    "zorder_bucket_stats", "zorder_wide_range_stats",
    # operators/pq.py (single-action uniqueness guard)
    "pq_trained_code_assignment", "pq_trained_adc_topk",
    "pq_code_assignment", "pq_adc_topk",
    # queries/io_ops.py (tx queries added alongside)
    "compaction_plan_buckets", "jsonl_roundtrip_counts",
)

# Stalest-green refresh: the 11 queries whose last driver verdict is
# round 2, then the round-3 block alphabetically; the [:50] trim keeps
# as many as fit.
STALE_REFRESH_R7: tuple[str, ...] = (
    # last verdict round 2
    "pricing_summary", "profile_orders_table", "shipping_priority_top10",
    "simhash_fingerprints", "sql_brand_volume", "term_frequency_top20",
    "title_extraction", "token_count_destopped", "top_revenue_orders",
    "truncate_display_200", "user_event_windows",
    # last verdict round 3 (alphabetical; trim cuts the tail)
    "big_order_customers", "bm25_scores", "bm25_topk",
    "chunk_exact_dedup", "cluster_best_representative",
    "contamination_ngram_overlap", "corpus_pipeline_e2e",
    "cube_orders_status_priority", "customer_order_count_distribution",
    "daily_revenue_7d_ma", "doc_chunks_overlapping",
    "embedding_int8_quantize", "exact_dedup_fingerprint",
    "except_all_click_days", "except_click_days_no_purchase",
    "fact_fact_smj_rollup", "forward_fill_user_values",
    "fuzzy_part_name_pairs", "grouping_sets_region_priority",
    "hybrid_bm25_cosine_rerank", "intersect_click_and_purchase_days",
    "json_path_stats_native", "knn_cosine_topk",
)

CORE_FIRST: tuple[str, ...] = (
    # canary: flagship, green r1-r6 — if THIS flips, the harness broke
    "simple_rag_topk",
    *NEVER_CHECKED_R7,
    *NEW_R7,
    *RECERTS_R7,
    *STALE_REFRESH_R7,
)[:50]


def _reorder_core_first() -> None:
    """Rebuild both dicts with CORE_FIRST names leading (in that order),
    everything else following in registration order."""
    rest = [n for n in QUERIES if n not in CORE_FIRST]
    order = [n for n in CORE_FIRST if n in QUERIES] + rest
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        for n in order:
            if n in snapshot:
                d[n] = snapshot[n]


# Import for side effects: each module declares its queries at import time.
def _load_all() -> None:
    from pulsar_project_spark import queries as _q  # noqa: F401
    _reorder_core_first()


_load_all()
