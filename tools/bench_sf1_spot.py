#!/usr/bin/env python
"""One-decade scaling spot bench (VERDICT r3 ask #5).

Times the 15 most expensive declared queries (by the round-3 bench),
plus the round-4 session additions, at
sf0.1 AND at the 10x-derived sf1.0 corpus (tools/make_sf1_derived.py)
in one warmed session, and reports the per-query scaling ratio. A
scan-bound query should land near 10x; anything super-linear needs a
reason (the near-dup family's is documented: the derived corpus is ten
near-identical copies of every doc, so its candidate-pair graph is
deliberately worst-case dense, not 10x of independent docs).

Writes BENCH_sf1_spot.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

TOP15 = (  # the round-3 top-15 (kept intact so sf01/sf1 totals stay comparable)
    "streaming_debounce", "neardup_components",
    "revenue_rollup_region_nation", "udtf_json_path_stats",
    "cluster_best_representative", "streaming_stream_stream_join",
    "token_cooccurrence_top20", "mq_pipeline_roundtrip",
    "ngram_jaccard_pairs", "bm25_scores", "streaming_exact_dedup",
    "streaming_topic_frequencies", "hybrid_bm25_cosine_rerank",
    "mmr_diverse_topk", "kv_lookup_miss_message",
)

# round-4 session additions: scaling evidence for the new operators
ROUND4_ADDITIONS = (
    "interval_join_bucketed", "incremental_dedup_counts",
    "levenshtein_confirm_pairs", "ordered_funnel_stages",
    "cohort_retention_matrix", "csv_roundtrip_counts",
    "orc_roundtrip_counts", "latest_event_argmax",
    "series_pattern_distance_topk",
)

# round-5 (VERDICT r4 ask #4): the heaviest new families were absent
# from the spot set despite being 3 of the top-5 most expensive
# queries — BPE train/encode and the real codecs — plus this round's
# PNG codec and fixed-merge twin
ROUND5_ADDITIONS = (
    "bpe_encode_token_census", "bpe_learned_merges",
    "wav_codec_roundtrip_features", "pgm_resize_features",
    "rawv_frame_sample_features", "png_decode_features",
    "bpe_fixed_merge_encode_census",
    "jpeg_entropy_roundtrip_features", "zorder_bucket_stats",
    "bloom_prefilter_census", "cms_heavy_hitters",
    "char_bigram_familiarity", "cdc_apply_net_state",
    "scd2_user_type_history", "priority_source_dedup",
    "exact_k_per_group_sample",
    # late round-5 additions
    "pq_code_assignment", "pq_adc_topk", "lc_distinct_bitmap_census",
    "content_fingerprint_events", "bloom_gated_incremental_dedup",
    "compaction_plan_buckets", "session_path_trigrams",
    "sql_trade_volume_identical", "png_permissive_decode_census",
)

# round-6: integer-IDCT pixel decode, trained PQ, wide-range layout —
# plus re-timing of the two queries whose encode paths were rewritten
# this round (pq_encode HOF form, BPE string-replace encoder)
ROUND6_ADDITIONS = (
    "jpeg_pixel_decode_features", "zorder_wide_range_stats",
    "pq_trained_code_assignment", "pq_trained_adc_topk",
    "product_type_profit", "brand_quantity_revenue",
    "event_transition_pagerank", "range_partition_bounds",
    "ohlc_bars_5min", "join_cardinality_forecast",
    "rolling_7d_active_users", "mad_outlier_census",
    "percentile_bands_by_priority", "referential_integrity_census",
)

SPOT_QUERIES = TOP15 + ROUND4_ADDITIONS + ROUND5_ADDITIONS + ROUND6_ADDITIONS

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SF1_DERIVED_DIR", "/tmp/sf1_derived")


def _warm_payloads(spark, sf_dir):
    from pyspark.sql import functions as F

    from pulsar_project_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    for tbl, expr in (("documents", F.max(F.length("text"))),
                      ("events", F.max(F.length("props"))),
                      ("embeddings", F.max(F.size("embedding")))):
        (load_table(spark, sf_dir, tbl).select(expr.alias("m"))
         .write.format("noop").mode("overwrite").save())


def _time_set(queries, spark, sf_dir):
    out = {}
    for name in SPOT_QUERIES:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pulsar_project_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("bench-sf1-spot", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = e.queries()

    _warm_payloads(spark, SF01)
    # one untimed full pass at sf0.1 warms every codegen/worker path the
    # 15 queries touch, so BOTH timed passes run in a hot session
    _time_set(queries, spark, SF01)
    t_sf01 = _time_set(queries, spark, SF01)

    _warm_payloads(spark, SF1)
    t_sf1 = _time_set(queries, spark, SF1)

    ratios = {n: (round(t_sf1[n] / t_sf01[n], 2) if t_sf01[n] > 0 else None)
              for n in SPOT_QUERIES}
    result = {
        "sf01_sec": t_sf01,
        "sf1_sec": t_sf1,
        "ratio_10x_data": ratios,
        "sf01_total": round(sum(t_sf01.values()), 2),
        "sf1_total": round(sum(t_sf1.values()), 2),
        "note": ("sf1 corpus derived by tools/make_sf1_derived.py: facts "
                 "x10 with id offsets, dims unchanged; near-dup queries "
                 "see a worst-case-dense duplicate graph by construction"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_sf1_spot.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"sf01_total": result["sf01_total"],
                      "sf1_total": result["sf1_total"],
                      "ratio": ratios}, indent=1))


if __name__ == "__main__":
    main()
