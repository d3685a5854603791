"""Physical-plan audit: .explain('formatted') every declared query and
flag scale red-flags. The '100 TB question' as a script:

* CartesianProduct / BroadcastNestedLoopJoin — quadratic or broadcast-
  the-world joins (unless the query is an intentional small-×-scan).
* SortMergeJoin against a dimension table that should broadcast.
* Parquet scans with no PushedFilters where the query filters a scan
  column (pushdown lost).
* Exchange (shuffle) count — not a failure, but the number to justify.

Usage: python tools/explain_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

# queries where a nested-loop/cartesian shape is the algorithm (tiny
# broadcast side by construction), not an accident
ALLOWED_NESTED_LOOP = {
    "knn_cosine_topk",          # |queries| = 10, broadcast by design
    "simple_rag_topk",          # constant query row
    "keyword_score_scan",
    "kv_lookup_miss_message",   # 5-row probe side
    "kmeans_clusters",          # crossJoin(broadcast(k=8 centroids)) — Lloyd's
    "ivf_cosine_topk",          # same centroid crossJoin inside kmeans_fit
    "ivf_cell_assignment",      # same k=8 centroid broadcast (iters=1 fit)
    "semdedup_embedding_prune", # k=8 lowest-id centroid broadcast crossJoin
    "mmr_rerank_exact",         # 1-row query-vector broadcast crossJoin
    "bm25_scores",              # 1-row corpus-constants broadcast crossJoin
    "bm25_topk",                # same
    "vocab_min_max_df",         # 1-row corpus-count broadcast crossJoin
    "hybrid_bm25_cosine_rerank", # bm25 consts + 1-row query-vector broadcasts
    "mmr_diverse_topk",          # bm25 consts broadcast (candidate stage)
    "skew_key_census",           # 1-row total/keys broadcast crossJoin
    "forward_fill_user_values",  # 1-row global-max-day broadcast crossJoin (r3: the users×days grid is gone)
    "bpe_learned_merges",        # 1-row argmax-pair broadcast crossJoin per training round
    "bpe_encode_token_census",   # 1-row ranked-merge-array broadcast crossJoin
    "zorder_bucket_stats",       # 1-row min/max-bounds broadcast crossJoin
    "zorder_wide_range_stats",   # same operator, wide-range dims
    "range_partition_bounds",    # 15-row target broadcast >=-join onto histogram
    "referential_integrity_census",  # 1-row x 1-row count crossJoins per relation
    "cdc_snapshot_at_time",      # 1-row median-cut broadcast crossJoin
    "value_equiwidth_histogram", # 1-row min/max-bounds broadcast crossJoin
    "tx_optimize_zorder_census", # 1-row min/max-bounds broadcast crossJoin (zorder rewrite)
    "coorder_part_triangles",    # three 1-row count aggregates crossJoined
    "dormant_rich_customers",    # 1-row (n, Σcents) scalar broadcast crossJoin
    "hilbert_bucket_stats",      # 1-row min/max-bounds broadcast crossJoin
    "top_supplier_by_quarter_revenue",  # 1-row scalar-max broadcast crossJoin
    "association_rules_pairs",   # 1-row order-count broadcast crossJoin
    "benford_first_digit_census",  # 1-row total broadcast crossJoin
    "important_part_stock_value",  # 1-row (Σcents, n) scalar broadcast crossJoin (Q11)
    "ks_distance_order_values",    # 1-row bounds + totals broadcast crossJoins
    "ivfpq_adc_topk",            # 8-row centroid broadcast crossJoin (kmeans)
    "ivfpq_rerank_topk",         # same 8-row centroid crossJoin feeds stage 1
    "zorder3_bucket_stats",      # 1-row min/max-bounds broadcast crossJoin
    "dsir_importance_select",    # 1-row gram-totals broadcast crossJoin
    "tx_ann_index_maintenance_census",  # 8-row frozen-centroid broadcast crossJoin
}


def audit(name: str, df) -> list[str]:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    flags = []
    if name not in ALLOWED_NESTED_LOOP:
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan:
            flags.append("BroadcastNestedLoopJoin")
    n_shuffles = len(re.findall(r"\bExchange\b", plan))
    n_smj = len(re.findall(r"\bSortMergeJoin\b", plan))
    scans = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    empty_pushed = sum(1 for s in scans if not s.strip())
    summary = f"shuffles={n_shuffles} smj={n_smj} scans={len(scans)} scans_nofilter={empty_pushed}"
    return flags, summary, plan


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from pulsar_project_spark.session import get_spark

    spark = get_spark("explain_audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    n_flagged = 0
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        if name.startswith("streaming_") or name == "mq_pipeline_roundtrip":
            continue  # streaming plans are per-microbatch; audited separately
        try:
            df = fn(spark, sf_dir)
            flags, summary, plan = audit(name, df)
        except Exception as ex:
            print(f"ERROR {name}: {type(ex).__name__}: {ex}")
            n_flagged += 1
            continue
        tag = "FLAG" if flags else "ok  "
        if flags:
            n_flagged += 1
        print(f"{tag} {name}: {summary}{(' ' + ','.join(flags)) if flags else ''}")
        if flags and "-v" in sys.argv:
            print(plan)
    print(f"\n{n_flagged} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
