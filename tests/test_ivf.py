"""IVF ANN vs the exact brute-force twin: recall + actual pruning.

Everything in both paths is deterministic (md5 hyperplanes, integer
k-means, fixed tiebreaks), so recall at a given sf is a constant —
pinned as a lower bound to stay robust across Spark versions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_project_spark.operators.ivf import ivf_topk
from pulsar_project_spark.operators.kmeans import kmeans_fit
from pulsar_project_spark.operators.similarity import knn_cosine
from tests.conftest import SF_CORRECT
import pytest

N_Q, K = 10, 5


def _pairs(df):
    return {(r.query_id, r.vec_id) for r in df.collect()}


def test_ivf_recall_vs_exact(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    exact = _pairs(knn_cosine(emb, n_queries=N_Q, k=K))
    approx = _pairs(ivf_topk(emb, n_queries=N_Q, k=K,
                             k_clusters=8, iters=2, nprobe=3))
    assert len(exact) == N_Q * K
    assert len(approx) == N_Q * K  # every query fills its k slots
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"


def test_ivf_probes_prune_search_space(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    n = emb.count()
    cells, cent = kmeans_fit(emb, k=8, iters=2)
    assert cent.count() == 8
    # nprobe=3 of 8 cells → candidate set well under the full corpus
    sizes = cells.groupBy("label").count().collect()
    assert sum(r["count"] for r in sizes) == n
    top3 = sum(sorted((r["count"] for r in sizes), reverse=True)[:3])
    assert top3 < n  # probing 3 cells cannot degenerate to a full scan


def test_ivf_matches_exact_within_probed_cells(spark):
    """Inside the probed cells the answer must be exactly the brute-force
    answer restricted to those cells (IVF loses only out-of-cell hits)."""
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    approx = ivf_topk(emb, n_queries=N_Q, k=K, k_clusters=8, iters=2, nprobe=8)
    exact = knn_cosine(emb, n_queries=N_Q, k=K)
    # nprobe == k_clusters → no pruning → identical to exact search
    a = sorted(map(tuple, approx.select("query_id", "vec_id", "rnk").collect()))
    e = sorted(map(tuple, exact.select("query_id", "vec_id", "rnk").collect()))
    assert a == e


def test_semdedup_max_cluster_guard_bounds_degenerate_corpus(spark):
    # VERDICT r8 #5: k ∝ n bounds cluster size only in expectation — an
    # adversarial corpus whose points all assign to ONE centroid must
    # not re-quadratize the confirm. Clusters above max_cluster skip
    # pair generation entirely (conservative: everything kept).
    from pulsar_project_spark.operators.similarity import semdedup_prune

    # 40 identical vectors: one cluster holds everything
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # guard engaged: the single 40-point cluster exceeds max_cluster=10,
    # so NO pair is generated and nothing is pruned
    guarded = semdedup_prune(emb, threshold=0.9, max_cluster=10)
    assert guarded.filter("pruned = 1").count() == 0
    assert guarded.count() == 40
    # guard idle (default cap far above 40): everything after the
    # keep-first representative is pruned
    default = semdedup_prune(emb, threshold=0.9)
    assert default.filter("pruned = 1").count() == 39
    assert default.filter("pruned = 0").count() == 1


@pytest.mark.gate  # rebuild-equivalence certification arm (VERDICT r11 order 1)
def test_ann_index_maintenance_rebuild_equivalence(spark):
    # VERDICT r11 order #1: the rebuild-equivalence verification arm of
    # the ANN maintenance capstone runs HERE, not inside the declared
    # query. verify_rebuild=True rebuilds the index from the final
    # snapshot with the same frozen centroids and raises AssertionError
    # inside the runner if incremental != rebuilt (both exceptAll
    # directions); the returned census must equal the ungated one.
    from pulsar_project_spark.queries.similarity_ops import (
        run_ann_index_maintenance,
    )
    from tests.conftest import SF_SMOKE

    # collect each result BEFORE the next call: the runner stages its
    # tx tables under a per-pid dir it clears at entry
    gated = {tuple(r) for r in run_ann_index_maintenance(
        spark, SF_SMOKE, verify_rebuild=True).collect()}
    plain = {tuple(r) for r in run_ann_index_maintenance(
        spark, SF_SMOKE).collect()}
    assert gated == plain
