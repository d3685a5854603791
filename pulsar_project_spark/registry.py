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
NEVER_CHECKED_R9: tuple[str, ...] = (
    # empty: every oracle-backed query declared before round 9 has a
    # cumulative driver-green verdict (tools/rotate_budget.py over
    # CORRECTNESS_r01..r08: 246/246, 0 ever-failed).
)

NEW_R9: tuple[str, ...] = (
    # oracle-backed queries added in round 9 (each also fuzz/test-gated).
    "tx_pruned_read_renamed_census",   # chain-resolved pruning (VERDICT #1)
    "tx_widen_column_census",          # ALTER COLUMN TYPE widening (#3)
    "streaming_tx_mv_census",          # streaming MV off the CDF (#6)
    "tx_merge_conditional_census",     # three-clause MERGE (Delta form)
    "tx_reorg_purge_census",           # REORG APPLY (PURGE) mapping-debt
    "tx_row_tracking_census",          # stable row ids across rewrites
    "dsir_importance_select",          # DSIR data selection (Xie 2023)
    "tx_keyless_cdc_census",           # keyless CDC via row identity
    "tx_generated_column_census",      # generated cols, derived pruning
    "streaming_tx_tracked_sink_census",  # exactly-once tracked landing
    "k_anonymity_census",              # governance: quasi-id cell audit
    "tx_datasource_read_census",       # spark.read.format("tx_table")
    "tx_datasource_write_census",      # df.write.format two-phase CAS
)

RECERTS_R9: tuple[str, ...] = (
    # modules changed in round 9 after their round-8 verdict:
    # sources/txlog.py (ADVICE r8 fixes: constraint-bypass UPDATE,
    # rename collision, bloom rebuild after RENAME/DROP, TOCTOU
    # constraints, bloom probe typing; rename-chain bounds resolution;
    # type widening) — every tx-family query re-certifies
    "tx_change_feed_census", "tx_cdf_incremental_agg_census",
    "tx_time_travel_timestamp_census", "tx_delete_dv_census",
    "tx_restore_census", "tx_schema_evolution_census",
    "tx_update_census", "tx_typed_change_feed_census",
    "tx_bloom_point_lookup_census", "tx_rename_column_census",
    "tx_drop_column_census", "tx_compaction_roundtrip_census",
    "tx_snapshot_time_travel_census", "tx_optimize_zorder_census",
    "tx_pruned_read_census", "tx_delete_range_census",
    "tx_merge_upsert_census", "tx_clone_divergence_census",
    "tx_catalog_atomic_move_census", "tx_vacuum_reclaim_census",
    "tx_partition_evolution_census", "streaming_tx_exactly_once_census",
    # sources/cdf_stream.py (vectorized DV mask + column mapping)
    "streaming_tx_change_feed",
    # operators/similarity.py + queries/similarity_ops.py (MAX_CLUSTER
    # guard in both engines) — semdedup plus the module's other members
    "semdedup_embedding_prune", "knn_cosine_topk", "srp_near_pairs",
    "srp_lsh_buckets", "label_centroid_qsums",
)

# Stalest-green refresh: the round-3-verdict block is now the oldest
# (alphabetical; the [:50] trim keeps as many as fit). Members already
# re-certified above are excluded.
STALE_REFRESH_R9: tuple[str, ...] = (
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
    "json_path_stats_native", "label_fact_urljoin",
    "late_shipment_priority_counts", "minhash_candidate_pairs",
    "minhash_lsh_bands", "neardup_components", "ngram_jaccard_pairs",
)

CORE_FIRST: tuple[str, ...] = (
    # canary: flagship, green r1-r8 — if THIS flips, the harness broke
    "simple_rag_topk",
    *NEVER_CHECKED_R9,
    *NEW_R9,
    *RECERTS_R9,
    *STALE_REFRESH_R9,
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
