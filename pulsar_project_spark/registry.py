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
NEVER_CHECKED_R6: tuple[str, ...] = (
    # the only 3 oracle-backed queries without a driver verdict after
    # rounds 1-5 (all landed after the round-5 pin; re-derived with
    # tools/rotate_budget.py): cumulative 159/162 green, 0 ever-failed.
    "session_path_trigrams",
    "bloom_gated_incremental_dedup",
    "compaction_plan_buckets",
)

NEW_R6: tuple[str, ...] = (
    # oracle-backed queries added in round 6 (each also fuzz/test-gated).
    # Names are appended here the commit their query lands — the
    # composition below self-adjusts, and tests/test_registry_order.py
    # keeps every name resolvable at every commit.
    "zorder_wide_range_stats",    # 2^61-range keys, divide-first branch (VERDICT #3)
    "jpeg_pixel_decode_features",  # integer-IDCT pixel path (VERDICT #2)
    "pq_trained_code_assignment",  # k-means-trained codebook PQ (VERDICT #4)
    "pq_trained_adc_topk",         # ADC against the trained codebook
    "product_type_profit",         # TPC-H Q9 shape (5-way join profit)
    "brand_quantity_revenue",      # TPC-H Q19 shape (disjunctive bands)
    "event_transition_pagerank",   # integer PageRank, K-round CTE oracle
    "range_partition_bounds",      # exact equi-depth range planner
    "ohlc_bars_5min",              # OHLC time-series downsampling
    "join_cardinality_forecast",   # pre-shuffle join-size/skew forecast
    "rolling_7d_active_users",     # WAU via bounded contribution explode
    "mad_outlier_census",          # robust MAD outlier flags, exact halves
    "percentile_bands_by_priority", # exact quartile bands
    "referential_integrity_census", # FK orphan sweep across the star
    "unattributed_clicks_census",  # left-outer attribution batch twin
    "cdc_snapshot_at_time",        # log time travel (VERSION AS OF)
    "late_arrival_census",         # watermark drop-rate observability
    "binary_quantize_hamming_topk", # 1-bit quantization + Hamming scan
    "functional_dependency_census", # FD-violation profiling sweep
    "neardup_cluster_size_histogram", # dedup executive report
    "user_journey_strings",        # ordered string agg, total-order safe
    "value_equiwidth_histogram",   # global-bounds profiling bins
)

RECERTS_R6: tuple[str, ...] = (
    # modules changed in round 6 after their round-5 verdict:
    # operators/layout.py (+ oracle): divide-first normalization
    "zorder_bucket_stats",
    # operators/multimodal.py (assert→ValueError) + queries/multimodal_ops.py
    # (oracle signed-modulo normalization — EVERY codec oracle edited)
    # + operators/jpeg.py (IDCT section)
    "png_decode_features", "png_permissive_decode_census",
    "jpeg_entropy_roundtrip_features",
    "wav_codec_roundtrip_features", "pgm_resize_features",
    "rawv_frame_sample_features",
    # operators/pq.py: pq_encode rewritten to the HOF argmin form
    "pq_code_assignment", "pq_adc_topk",
    # operators/text_analysis.py: string-replace BPE encoder +
    # Arrow-numpy char-bigram counting
    "bpe_fixed_merge_encode_census", "char_bigram_familiarity",
)

# Stalest-green refresh: last driver verdict round 2 (oldest first),
# then the round-3 tail; the composition trim keeps as many as fit.
STALE_REFRESH_R6: tuple[str, ...] = (
    "boolean_normalize", "clean_string_projection", "conversion_funnel",
    "customer_ltv_segments", "distinct_tokens_except_stopwords",
    "filename_sanitize", "group_count_by_type", "lang_corpus_stats",
    "marker_extraction", "national_revenue", "numeric_convertibility",
    "orders_by_month", "per_user_activity", "pricing_summary",
    "profile_orders_table", "shipping_priority_top10",
    "simhash_fingerprints", "sql_brand_volume", "term_frequency_top20",
    "title_extraction", "token_count_destopped", "top_revenue_orders",
    "truncate_display_200", "user_event_windows",
    # round-3 tail (fills whatever the trim leaves open)
    "big_order_customers", "bm25_scores", "bm25_topk",
    "chunk_exact_dedup", "cluster_best_representative",
    "contamination_ngram_overlap", "corpus_pipeline_e2e",
    "cube_orders_status_priority", "customer_order_count_distribution",
    "daily_revenue_7d_ma", "doc_chunks_overlapping",
    "embedding_int8_quantize", "exact_dedup_fingerprint",
    "except_all_click_days", "except_click_days_no_purchase",
    "fact_fact_smj_rollup", "orders_above_priority_mean",
    "late_shipment_priority_counts", "knn_cosine_topk",
)

CORE_FIRST: tuple[str, ...] = (
    # canary: flagship, green r1-r5 — if THIS flips, the harness broke
    "simple_rag_topk",
    *NEVER_CHECKED_R6,
    *NEW_R6,
    *RECERTS_R6,
    *STALE_REFRESH_R6,
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
