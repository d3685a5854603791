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
# set is pinned BY NAME. Round 4 rotation closes the LAST certification
# gap: after rounds 1-3 (45 ∪ 50 ∪ 50 distinct = 104 driver-green),
# exactly 18 oracle-backed queries have never been inside a driver
# budget window — they take slots 2-19. Slots 20-21 are the NEW
# deterministic oracle twins of the rows-only ANN family (IVF cell
# assignment, integer-exact MMR). The remaining slots re-certify every
# r1/r2-green query whose module changed after its last driver verdict
# (the round-3 NULL-handling + fuzz fixes: commits e0da201/b6f93ac
# touched events_state, args, extraction, multimodal, text-analysis,
# timeseries, window, catalog, retrieval), plus asof/sessionization as
# streaming-twin anchors. ``simple_rag_topk`` stays the slot-1 canary.
# tests/test_registry_order.py regression-gates this list.
NEVER_CHECKED_R4: tuple[str, ...] = (
    "udtf_json_path_stats", "user_session_stats", "user_event_gap_stats",
    "salted_segment_event_counts", "skew_key_census",
    "snapshot_diff_counts", "mergeable_state_rollup",
    "partitioned_prune_purchase_days", "nation_revenue_share",
    "cumulative_new_users_by_day", "debounce_events_1s",
    "equidepth_deciles_by_type", "langid_confusion_matrix",
    "lang_sampling_weights", "winsorize_tail_counts",
    "training_order_shuffle", "hash_stratified_sample",
    "length_bucket_padding_stats",
)

CORE_FIRST: tuple[str, ...] = (
    # canary: flagship, green r1+r2+r3 — if THIS flips, the harness broke
    "simple_rag_topk",
    # the final 18 oracle-backed queries with no driver verdict yet
    *NEVER_CHECKED_R4,
    # NEW r4: deterministic oracle twins for the rows-only ANN ops
    "ivf_cell_assignment", "mmr_rerank_exact",
    # re-certs: r2-green, module changed by the r3 NULL/fuzz fixes
    # (events_state.py: NULLS LAST eviction, json_valid guards)
    "keep_last_n_per_user", "latest_event_per_user", "evict_min_per_type",
    "microbatch_rollup", "memory_state_snapshot", "json_props_extract",
    # (args_ops.py / extraction.py: json_valid + try_cast guards)
    "arg_whitelist_projection", "arg_schema_casting",
    "fenced_json_roundtrip",
    # (multimodal_ops.py: NULL-payload boundary drop — r1 verdicts)
    "multimodal_asset_catalog", "image_decode_stub",
    "byte_histogram_features", "video_frame_sample_plan",
    "audio_chunk_plan",
    # (text_analysis: NULL text as empty doc)
    "langid_profile_scores", "quality_scores",
    "feature_hash_embeddings", "bpe_token_counts",
    # (timeseries_ops.py: gap-fill cartesian → sequence() rewrite)
    "daily_user_series_gapfilled", "user_value_trend",
    "median_order_cents_by_priority",
    # (window_ops.py: NULLS LAST decile pinning)
    "user_value_ranks",
    # (operators/catalog.py changed)
    "tool_catalog_last_wins", "tool_routing_first_match",
    "extension_lookup_default", "kv_lookup_miss_message",
    # (queries/retrieval.py: zero-norm cosine fix)
    "keyword_score_scan",
    # streaming-twin anchors for the twin-pairing certification
    "asof_last_purchase", "sessionization",
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
