"""Zero-row-input robustness gate.

At 100 TB, planning-time partition pruning, a fresh layout, or a
filtered ingest routinely hand an operator a schema-correct EMPTY
relation — queries must plan and execute on one, returning zero rows,
not crash. (Round-3 sweep over all 139 declared queries found exactly
three raisers: the partitioned-layout roundtrip, fixed by reading back
with an explicit schema, and kmeans/ivf, whose "need at least k input
vectors" contract is a deliberate NAMED error for an impossible fit —
pinned as such below.)

A representative query per family keeps the gate fast; the fixed
regression (`partitioned_prune_purchase_days`) is always included.
"""

from __future__ import annotations

import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pulsar_project_spark.registry import QUERIES
from tests.conftest import canary_params
from pulsar_project_spark.sources.tables import TABLE_NAMES

_REPRESENTATIVE = (
    "partitioned_prune_purchase_days",  # the fixed regression
    "simple_rag_topk",                  # retrieval
    "bm25_scores",                      # bm25 corpus constants on 0 docs
    "hybrid_bm25_cosine_rerank",        # retrieval x embeddings compose
    "knn_cosine_topk",                  # vector search
    "exact_dedup_fingerprint",          # dedup
    "minhash_candidate_pairs",          # LSH banding
    "prefix_filtered_jaccard_pairs",    # prefix join over 0 docs
    "neardup_components",               # iterative fixpoint on 0 edges
    "neardup_cluster_size_histogram",   # dedup report on 0 docs
    "corpus_pipeline_e2e",              # composed pipeline
    "training_order_shuffle",           # hash shuffle
    "revenue_rollup_region_nation",     # star rollup
    "fact_fact_smj_rollup",             # fact-fact SMJ
    "sessionization",                   # windows
    "forward_fill_user_values",         # gap fill (sequence on empty span)
    "daily_revenue_7d_ma",              # moving average
    "json_path_stats_native",           # JSON census
    "udtf_json_path_stats",             # Python UDTF on 0 rows
    "hash_stratified_sample",           # deterministic sampling
    "stratified_sample_by_type",        # salted seeded sampling (r12)
    "streaming_debounce",               # greedy stateful chain, 0 rows
    "token_budget_mixture_sample",      # budget mix over 0 docs
    "repeated_ngram_span_census",       # window census over 0 docs
    "semdedup_embedding_prune",         # semantic dedup over 0 vectors
    "jsonl_roundtrip_counts",           # JSONL write/read roundtrip
    "tx_compaction_roundtrip_census",   # tx compaction on a 0-row table
    "tx_snapshot_time_travel_census",   # time travel over empty commits
    "tx_optimize_zorder_census",        # zorder rewrite of a 0-row table
    "streaming_tx_exactly_once_census", # stream-land 0 rows, replay no-op
    "streaming_topic_frequencies",      # tx-landed update agg of 0 rows
    "streaming_windowed_counts",        # tx-landed append windows, 0 rows
    "streaming_keep_last_state",        # tx-landed stateful tail, 0 rows
    "streaming_retractable_agg",        # weighted stream fold of 0 rows
    "streaming_ks_drift",               # ECDF histogram fold of 0 rows
    "streaming_cms_heavy_hitters",      # counter fold of 0 rows
    "streaming_lc_distinct",            # bitmap fold of 0 rows
    "streaming_cdc_apply",              # CDC max-struct fold of 0 rows
    "streaming_exact_dedup",            # watermarked dedup of 0 rows
    "streaming_stream_stream_join",     # stream-stream join of 0 rows
    "streaming_session_windows",        # session windows over 0 rows
    "streaming_left_outer_attribution", # outer join over 0 rows
    "mq_pipeline_roundtrip",            # MQ roundtrip of 0 messages
    "streaming_tx_change_feed",         # manifest tail over 0-row commits
    "tx_pruned_read_census",            # stats pruning over 0 files
    "sql_lateral_order_profile",        # lateral agg over 0 customers
    "tx_delete_range_census",           # delete over a 0-row table
    "tx_update_census",                 # COW update over a 0-row table
    "tx_typed_change_feed_census",      # typed feed over 0-row commits
    "tx_bloom_point_lookup_census",     # bloom probe over 0-row table
    "tx_rename_column_census",          # rename over 0-row generations
    "tx_drop_column_census",            # drop over 0-row generations
    "tx_pruned_read_renamed_census",    # chain-resolved pruning, 0 rows
    "tx_widen_column_census",           # widen over 0-row generations
    "streaming_tx_mv_census",           # streaming MV over 0-row commits
    "tx_merge_conditional_census",      # MERGE with empty target+source
    "tx_reorg_purge_census",            # reorg of 0-row generations
    "tx_row_tracking_census",           # tracked appends of 0 rows
    "dsir_importance_select",           # importance weights over 0 docs
    "tx_keyless_cdc_census",            # rid-diff over 0-row versions
    "tx_generated_column_census",       # generator over 0-row appends
    "streaming_tx_tracked_sink_census",  # tracked landing of 0 rows
    "k_anonymity_census",               # audit over 0 rows
    "tx_datasource_read_census",        # DataSource over 0-row table
    "tx_datasource_write_census",       # standard-API write of 0 rows
    # (tx_merge_upsert_census and coorder_part_triangles are GLOBAL
    # aggregates: on empty input each correctly returns one all-zero
    # row in both engines — zero-rows-out doesn't apply; their
    # empty-input parity is covered by the oracle gate)
    # (sql_recursive_reachability's UNCONDITIONAL seed row means both
    # engines correctly return 1 row on empty events — like the global
    # aggregates noted below, it doesn't belong in a zero-rows-out
    # gate; its empty-input parity is covered by the oracle gate)
    "retractable_agg_view_census",      # weighted changelog over 0 events
    "tx_catalog_atomic_move_census",    # two catalog moves over 0 rows
    "tx_vacuum_reclaim_census",         # compact+vacuum a 0-row table
    "ks_distance_order_values",         # ECDF walk over 0 orders
    "tx_partition_evolution_census",    # two clustered appends of 0 rows
    "bucketed_cojoin_rollup",           # bucketed write+join of 0-row tables
    "min_cost_supplier_per_part",       # Q2 decorrelated min on 0 supply
    "important_part_stock_value",       # Q11 NULL global scalar, 0 parts
    "ship_delay_priority_matrix",       # Q12 bands over 0 joined lines
    "small_qty_part_revenue",           # Q17 per-part stats on 0 lines
    "excess_supply_suppliers",          # Q20 semi join vs empty movers
    # (forecast_revenue_change and promo_revenue_share are GLOBAL
    # aggregates — one row on empty input in both engines, covered by
    # the oracle gate like the others noted above)
    "sole_late_supplier_waits",         # Q21 decorrelation on 0 lineitems
    "dormant_rich_customers",           # Q22 anti-join, NULL scalar mean
    "pareto_frontier_parts",            # banded skyline on 0 parts
    "coorder_part_kcore",               # 6 peel rounds over 0 edges
    "coorder_part_communities",         # 4 LPA rounds over 0 edges
    "user_value_ewma_dyadic",           # 8-lag window on 0 events
    "hilbert_bucket_stats",             # NULL bounds, 16 rounds on 0 rows
    "seasonal_revenue_anomaly_census",  # medians over 0 days
    "returned_item_top_customers",      # Q10 joins over 0 lineitems
    "top_supplier_by_quarter_revenue",  # NULL scalar max, 0 suppliers
    "association_rules_pairs",          # rules over 0 baskets
    "benford_first_digit_census",       # digit census over 0 orders
    "join_view_incremental_maintenance", # four delta terms over 0 rows
    "wav_spectral_tilt_features",       # codec tilt on 0 assets
    "wav_decimate2_features",           # FIR decimation on 0 assets
    "ivfpq_adc_topk",                   # probe/encode over 0 vectors
    "ivfpq_rerank_topk",                # rerank of a 0-row shortlist
    "tx_time_travel_timestamp_census",  # AS OF between empty commits
    "tx_delete_dv_census",              # DV delete over a 0-row table
    "tx_change_feed_census",            # feed over file-less commits
    "tx_restore_census",                # restore to a file-less version
    "tx_schema_evolution_census",       # merged read over 0-row generations
    "tx_cdf_incremental_agg_census",    # IVM fold of an empty feed
    "tx_clone_divergence_census",       # clone of a file-less table
    "zorder3_bucket_stats",             # NULL 3-dim bounds on 0 rows
    "interval_join_bucketed",           # keyless interval join, 0 anchors
    "incremental_dedup_counts",         # incoming vs empty store
    "levenshtein_confirm_pairs",        # blocking + bounded edit distance
    "cohort_retention_matrix",          # window-min cohort on 0 users
    "schema_evolution_union_counts",    # mergeSchema over 0-row batches
    "corrupt_json_lines_census",        # PERMISSIVE read of 0 lines
    "wav_codec_roundtrip_features",     # real codec on 0 assets
    "pgm_resize_features",              # real image resize on 0 assets
    "png_decode_features",              # full PNG codec on 0 assets
    "rawv_frame_sample_features",       # container frame slice on 0 clips
    "bpe_learned_merges",               # BPE training on an empty corpus
    "bpe_encode_token_census",          # train-then-encode on 0 docs
    "bpe_fixed_merge_encode_census",    # fixed-merge fold on 0 docs
    "zorder_bucket_stats",              # bounds agg + bit math on 0 rows
    "zorder_wide_range_stats",          # divide-first branch on 0 rows
    "bloom_prefilter_census",           # bloom build/probe on 0 docs
    "cms_heavy_hitters",                # sketch build/probe on 0 events
    "char_bigram_familiarity",          # corpus-trained scoring on 0 docs
    "jpeg_entropy_roundtrip_features",  # JPEG entropy codec on 0 docs
    "jpeg_pixel_decode_features",       # integer-IDCT pixel path on 0 docs
    "cdc_apply_net_state",              # change-log reduce on 0 rows
    "scd2_user_type_history",           # SCD2 windows on 0 rows
    "priority_source_dedup",            # priority argmin on 0 docs
    "exact_k_per_group_sample",         # windowed budget on 0 rows
    "nation_trade_volume",              # double-role dim joins on 0 facts
    "market_share_by_year",             # conditional agg share on 0 facts
    "product_type_profit",              # 5-way join profit on 0 facts
    "brand_quantity_revenue",           # disjunctive bands on 0 facts
    "sql_trade_volume_identical",       # identical-text SQL on 0 facts
    "lc_distinct_bitmap_census",        # bitmap sketch on 0 events
    "png_permissive_decode_census",     # corrupt-tolerant codec on 0 docs
    "pgm_permissive_decode_census",     # corrupt-tolerant PGM on 0 docs
    "rawv_permissive_sample_census",    # corrupt-tolerant video on 0 docs
    "jpeg_color_pixel_decode_features", # color decode over 0 assets
    "jpeg_color_permissive_decode_census",  # tolerant color on 0 assets
    "pq_code_assignment",               # PQ encode on 0 vectors
    "pq_adc_topk",                      # ADC search on 0 codes
    "pq_trained_code_assignment",       # Lloyd round + encode on 0 vectors
    "pq_trained_adc_topk",              # trained ADC on 0 codes
    "binary_quantize_hamming_topk",     # sign-pack + popcount on 0 vectors
    "content_fingerprint_events",       # xor fingerprint of 0 rows
    "bloom_gated_incremental_dedup",    # gated classify on 0 docs
    "compaction_plan_buckets",          # prefix-sum planner on 0 files
    "session_path_trigrams",            # path mining over 0 sessions
    "event_transition_pagerank",        # PageRank over 0 nodes
    "range_partition_bounds",           # equi-depth planner on 0 rows
    "ohlc_bars_5min",                   # bar compaction on 0 events
    "rolling_7d_active_users",          # WAU curve on 0 events
    "mad_outlier_census",               # two-level medians on 0 rows
    "percentile_bands_by_priority",     # quartiles on 0 rows
    "unattributed_clicks_census",       # semi/anti attribution on 0 events
    "cdc_snapshot_at_time",             # time travel over an empty log
    "late_arrival_census",              # watermark-loss census on 0 events
    "user_journey_strings",             # ordered string agg on 0 events
    "value_equiwidth_histogram",        # global-bounds bins on 0 events
    "context_assembly_snapshot",        # 5-branch lifecycle on 0 rows
    "task_update_snapshot",             # 4-branch lifecycle on 0 rows
    "tx_generated_dml_census",          # DML+derived pruning on 0 rows
    "pgm_dhash_dedup_census",           # perceptual hash on 0 assets
    "pgm_dhash_near_clusters",          # banded Hamming join on 0 reps
    "multimodal_corpus_pipeline",       # decode+dedup+split on 0 assets
    "cjk_token_counts",                 # RE2 token replay on 0 docs
    "tx_ann_index_maintenance_census",  # feed-maintained index on 0 vectors
    "streaming_ann_ingest_census",      # stream-ingested index, 0 vectors
    # (join_cardinality_forecast is a GLOBAL aggregate: on empty input
    # it correctly returns one NULL/0 row in BOTH engines — like the
    # funnel, it doesn't belong in a zero-rows-out gate)
)

_NAMED_RAISERS = {"kmeans_clusters", "ivf_cosine_topk"}


@pytest.fixture(scope="module")
def empty_sf_dir() -> str:
    src = "/root/testdata/sf0.001"
    d = tempfile.mkdtemp(prefix="empty_sf_")
    for t in TABLE_NAMES:
        s = pq.read_schema(f"{src}/{t}.parquet")
        s = pa.schema([f.remove_metadata() for f in s])
        pq.write_table(
            pa.table({f.name: pa.array([], f.type) for f in s}),
            f"{d}/{t}.parquet",
        )
    return d


@pytest.mark.parametrize("name", canary_params(_REPRESENTATIVE))
def test_runs_and_returns_zero_rows_on_empty_tables(name, spark, empty_sf_dir):
    assert QUERIES[name](spark, empty_sf_dir).count() == 0


@pytest.mark.parametrize("name", sorted(_NAMED_RAISERS))
def test_impossible_fit_raises_named_contract(name, spark, empty_sf_dir):
    with pytest.raises(Exception, match="need at least k="):
        QUERIES[name](spark, empty_sf_dir).count()
