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
NEVER_CHECKED_R11: tuple[str, ...] = (
    # empty: every oracle-backed query declared before round 11 has a
    # cumulative driver-green verdict (CORRECTNESS_r01..r10 union:
    # 264/264 oracle-backed green); the round-11 oracle UPGRADES
    # (previously rows-only) sit in NEW_R11 instead.
)

NEW_R11: tuple[str, ...] = (
    # round-11 oracle upgrades, tier 1: the exactly-once tx-landing
    # pattern applied to the rows-only streaming tail (VERDICT r10 #1)
    "streaming_topic_frequencies",
    "streaming_windowed_counts",
    "streaming_keep_last_state",
    # tier 2: batch-split-independent folds adopt their batch twins'
    # oracles (additive / linear-sketch / bit_or / max-struct)
    "streaming_retractable_agg", "streaming_ks_drift",
    "streaming_cms_heavy_hitters", "streaming_lc_distinct",
    "streaming_cdc_apply",
    # tier 3: single-batch-exact pipelines with direct census oracles
    "streaming_exact_dedup", "streaming_stream_stream_join",
    "mq_pipeline_roundtrip",
    # tier 4: closed-form watermark emission rules (boundaries pinned
    # empirically: session end <= ms-floored wm emits; unmatched click
    # NULL row emits iff cts + horizon strictly < global wm)
    "streaming_session_windows", "streaming_left_outer_attribution",
    # round-11 capstone: decode → byte-stats quality → perceptual
    # dedup → split as ONE plan (VERDICT r10 order #4)
    "multimodal_corpus_pipeline",
    # round-11 oracle upgrade: the CJK tokenizer's RE2 replay (VERDICT
    # r10 order #7) — the one reference-defect deviation (SURVEY §7.3)
    # now carries a hash certificate
    "cjk_token_counts",
    # round-11 capstone: ANN index persisted as tx tables, maintained
    # incrementally off the change feed (VERDICT r10 order #8)
    "tx_ann_index_maintenance_census",
    # round-11 composition capstone: the embedding store's write path
    # as a genuine multi-batch stream (frozen quantizer, exactly-once
    # txn landing) — full oracle, batch-split-independent
    "streaming_ann_ingest_census",
)

# VERDICT r10 order #2: rows-only queries that have NEVER received any
# driver verdict get window slots so the driver at least records
# rows>0/err for them. After the round-11 oracle sweep these are the
# ENTIRE remaining rows-only surface that lacks a verdict: genuinely
# iterative (kmeans/IVF/BPE/react), sketch-internal (approx/HLL/KLL),
# sampling, greedy-state (debounce), or lenient-parse semantics — each
# twin-paired or replica-pinned in tests.
ROWS_ONLY_R11: tuple[str, ...] = (
    "react_loop_trace", "streaming_debounce", "lenient_json_parse",
    "ivf_cosine_topk", "kmeans_clusters", "mmr_diverse_topk",
    "bpe_learned_merges", "bpe_encode_token_census",
    "approx_distinct_users", "value_percentiles_sketch",
    "stratified_sample_by_type", "hll_rolling_distinct_users",
)

RECERTS_R11: tuple[str, ...] = (
    # modules changed in round 11 after their round-10 verdict:
    # queries/multimodal_ops.py (dHash banding 4x14 → 5x12, ADVICE),
    # queries/capstones.py (trunc-div oracle guard), queries/io_ops.py
    # (comment-only, cheap to re-cert), streaming/pipeline.py (the tx
    # landing generalization), queries/similarity_ops.py (PQ SQL
    # builder refactor — pq_code_assignment re-certs it),
    # queries/cdc_ops.py (oracle hoisted to a named constant) — the
    # queries on those paths:
    "pgm_dhash_dedup_census", "pgm_dhash_near_clusters",
    "context_assembly_snapshot", "task_update_snapshot",
    "tx_generated_dml_census", "tx_generated_column_census",
    "streaming_tx_exactly_once_census", "streaming_tx_mv_census",
    "pq_code_assignment", "cdc_apply_net_state",
)

# Stalest-green refresh: the full remaining round-3-verdict cohort,
# alphabetical — exactly the 10 names below (ADVICE r11 #4: the earlier
# comment claimed an 11th round-4 entry that was never in the block).
STALE_REFRESH_R11: tuple[str, ...] = (
    "repetition_top_bigram", "revenue_rollup_region_nation",
    "rolling_fingerprint", "sequence_packing_bins",
    "split_assignment_counts", "star_revenue_region_segment_month",
    "token_cooccurrence_top20", "unpivot_event_matrix",
    "value_histogram_by_type", "vocab_min_max_df",
)

_CORE_BLOCKS: tuple[str, ...] = (
    # canary: flagship, green r1-r11 — if THIS flips, the harness broke
    "simple_rag_topk",
    *NEVER_CHECKED_R11,
    *NEW_R11,
    *ROWS_ONLY_R11,
    *RECERTS_R11,
    *STALE_REFRESH_R11,
)
# ADVICE r11 #4: the [:50] trim used to silently drop overflow (and
# silently under-fill on a miscounted block) — the window must sum to
# EXACTLY the driver's 50 slots, loudly.
assert len(_CORE_BLOCKS) == 50, (
    f"CORE_FIRST blocks sum to {len(_CORE_BLOCKS)}, want exactly 50")
assert len(set(_CORE_BLOCKS)) == 50, "duplicate name across core blocks"
CORE_FIRST: tuple[str, ...] = _CORE_BLOCKS


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
