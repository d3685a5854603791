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
# set is pinned BY NAME. Round-5 rotation: after rounds 1-4 (cumulative
# 124 distinct driver-green, 0 ever-failed), exactly 16 oracle-backed
# queries — all added late in round 4 — have never been inside a driver
# budget window; they take slots 2-17. The next block is every query
# NEW this round (PNG codec, JPEG entropy codec, fixed-merge BPE twin,
# Z-order census, Bloom prefilter, count-min probe, char-bigram
# scoring, CDC/SCD2, priority dedup, exact-k sample, Q7/Q8 analytics).
# The remaining slots re-certify (a) every query whose module changed
# THIS round after its last verdict (temporal/interval join fix,
# text_analysis merge-order fix, io_ops split fix, multimodal PNG
# addition), then (b) the stalest green queries (last verdict round 2;
# several ceded their slots to the round-5 additions and stay covered
# by the fuzz families).
# ``simple_rag_topk`` stays the slot-1 canary.
# tests/test_registry_order.py regression-gates this list.
NEVER_CHECKED_R5: tuple[str, ...] = (
    "latest_event_argmax", "sql_window_top3_orders",
    "sql_nation_repeat_customers", "interval_join_bucketed",
    "ordered_funnel_stages", "cohort_retention_matrix",
    "series_pattern_distance_topk", "incremental_dedup_counts",
    "levenshtein_confirm_pairs", "wav_codec_roundtrip_features",
    "pgm_resize_features", "rawv_frame_sample_features",
    "csv_roundtrip_counts", "orc_roundtrip_counts",
    "schema_evolution_union_counts", "corrupt_json_lines_census",
)

NEW_R5: tuple[str, ...] = (
    "png_decode_features", "bpe_fixed_merge_encode_census",
    "zorder_bucket_stats", "bloom_prefilter_census", "cms_heavy_hitters",
    "char_bigram_familiarity", "jpeg_entropy_roundtrip_features",
    "cdc_apply_net_state", "scd2_user_type_history",
    "priority_source_dedup", "exact_k_per_group_sample",
    "nation_trade_volume", "market_share_by_year",
    "pq_code_assignment", "pq_adc_topk",
    "sql_trade_volume_identical", "lc_distinct_bitmap_census",
    "png_permissive_decode_census", "content_fingerprint_events",
)

CORE_FIRST: tuple[str, ...] = (
    # canary: flagship, green r1-r4 — if THIS flips, the harness broke
    "simple_rag_topk",
    # the 16 oracle-backed queries with no driver verdict yet
    *NEVER_CHECKED_R5,
    # NEW r5: PNG codec + deterministic BPE encode twin
    *NEW_R5,
    # re-certs: modules changed this round after their last verdict
    # (operators/temporal.py: exact-row interval-join rewrite)
    "asof_last_purchase", "attribution_window_join", "sessionization",
    # (queries/io_ops.py: negative-odd-id split fix)
    "jsonl_roundtrip_counts", "partitioned_prune_purchase_days",
    # (operators/text_analysis.py: merge-order array_sort fix)
    "bpe_token_counts", "langid_profile_scores", "quality_scores",
    "feature_hash_embeddings",
    # (queries/analytics2.py: zero-revenue share NULL guard)
    "nation_revenue_share",
    # (operators/multimodal.py: PNG section + docstring re-scope)
    "multimodal_asset_catalog", "image_decode_stub",
    "byte_histogram_features", "video_frame_sample_plan",
    # NOTE: every round-2-last stale re-cert ceded its slot to a
    # round-5 addition — all of them are now continuously fuzz-driven
    # (warehouse/pipeline/events families). A green CORRECTNESS_r05
    # closes cumulative driver ground truth at 159 of 162 oracle-backed
    # (bloom_gated_incremental_dedup, compaction_plan_buckets and
    # session_path_trigrams landed after the pin and queue for round 6;
    # all three are fuzz-driven meanwhile).
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
