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
# set is pinned BY NAME. Round 3 ROTATES the budget: the 50 round-2
# entries are all proven driver-green (CORRECTNESS_r02.json, 50/50,
# rows+schema+hash), so this round's slots go to the highest-value
# queries that have never been inside a driver budget window —
# BM25/hybrid retrieval, the dedup/similarity family, corpus-pipeline,
# star/relational analytics — keeping ``simple_rag_topk`` as the slot-1
# canary. tests/test_registry_order.py regression-gates this list.
CORE_FIRST: tuple[str, ...] = (
    # canary: flagship, green r1+r2 — if THIS flips, the harness broke
    "simple_rag_topk",
    # retrieval + similarity search (never driver-checked)
    "bm25_scores", "bm25_topk", "hybrid_bm25_cosine_rerank",
    "knn_cosine_topk", "srp_lsh_buckets", "srp_near_pairs",
    "label_centroid_qsums", "embedding_int8_quantize",
    # dedup family (re-certs after the r2 shingle rewrite + never-checked)
    "exact_dedup_fingerprint", "ngram_jaccard_pairs",
    "minhash_lsh_bands", "minhash_candidate_pairs",
    "rolling_fingerprint", "neardup_components",
    "cluster_best_representative",
    # corpus / training-data pipeline (never driver-checked)
    "contamination_ngram_overlap", "vocab_min_max_df",
    "split_assignment_counts", "quality_filter_audit",
    "token_cooccurrence_top20", "repetition_top_bigram",
    "sequence_packing_bins", "props_digit_redaction",
    "doc_chunks_overlapping", "chunk_exact_dedup", "corpus_pipeline_e2e",
    # star / relational analytics (never driver-checked)
    "star_revenue_region_segment_month", "revenue_rollup_region_nation",
    "cube_orders_status_priority", "grouping_sets_region_priority",
    "unpivot_event_matrix", "pivot_event_type_by_day",
    "except_click_days_no_purchase", "intersect_click_and_purchase_days",
    "fuzzy_part_name_pairs", "value_histogram_by_type",
    "parts_no_bulk_order", "orders_above_priority_mean",
    "late_shipment_priority_counts", "big_order_customers",
    "customer_order_count_distribution", "orders_above_customer_avg",
    "except_all_click_days", "fact_fact_smj_rollup",
    # timeseries / labels / io tails (never driver-checked; forward_fill
    # rewritten this round — wants a fresh verdict)
    "forward_fill_user_values", "daily_revenue_7d_ma",
    "label_fact_urljoin", "jsonl_roundtrip_counts",
    # native strict-JSON path census (NEW r3 — the fast twin of
    # udtf_json_path_stats)
    "json_path_stats_native",
)


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
