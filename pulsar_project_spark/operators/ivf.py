"""IVF (inverted-file) approximate nearest-neighbor search — the scale
path for similarity search (SURVEY.md §2.11), complementing SRP-LSH.

Structure is the classic IVF-Flat design (public: FAISS paper, Johnson
et al. 2017): a coarse quantizer (k-means centroids, operators/kmeans.py)
partitions vectors into cells; a query probes only its ``nprobe``
nearest cells and runs exact cosine inside them. Brute force scores
|queries| × N pairs; IVF scores ~|queries| × N × (nprobe/k) — at 100 TB
the cell relation is the partitioning key, so each probe is a
partition-pruned scan instead of a full-table pass.

Plan shape (all DataFrame ops, no UDF):
  1. ``kmeans_fit`` → cells (vec_id → label) + centroids (label → qc).
  2. queries × broadcast(centroids) → top-``nprobe`` labels per query
     (window rank over integer sq_dist — deterministic ties by label).
  3. probes ⋈ cells on label → candidate (query_id, vec_id) pairs.
  4. one re-join to fetch both vectors → exact cosine → window top-k.

Iterative centroid fit → not SQL-expressible → rows-only declared query;
tests pin recall against the exact ``knn_cosine`` twin and assert the
candidate set is a strict subset of the corpus (it actually pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_project_spark.operators.kmeans import (
    _fold_centroids,
    _quantize,
    _sq_dist,
    kmeans_fit,
)
from pulsar_project_spark.operators.similarity import cosine, with_norm


def ivf_topk(emb: DataFrame, n_queries: int = 10, k: int = 5,
             k_clusters: int = 8, iters: int = 2, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, vec_id, cosine, rnk): top-k cosine neighbors of the
    query set ``id < n_queries`` — an explicit predicate contract (see
    ``similarity.knn_cosine``: sparse/offset id spaces yield a smaller
    query set; pass ids that exist) — searching only ``nprobe`` IVF
    cells per query (self excluded)."""
    cells, cent = kmeans_fit(emb, k=k_clusters, iters=iters,
                             id_col=id_col, vec_col=vec_col)

    # Probe list: each query's nprobe nearest centroids (integer
    # distance in the same quantized space the cells were built in).
    # Map-side top-nprobe (round 12): fold the k centroids into one
    # broadcast array row and slice the sorted (cdist, label) struct
    # array — BIGINT distances total-order, so the slice IS the
    # window's row_number <= nprobe under ORDER BY cdist, label, with
    # no per-query exchange.
    q = _quantize(emb.filter(F.col(id_col) < n_queries), id_col, vec_col)
    from pulsar_project_spark.operators.kmeans import _SQ_DIST_SQL
    nearest = F.expr(
        "slice(array_sort(transform(__cents, c -> struct("
        + _SQ_DIST_SQL.format(a="qv", b="c.qc")
        + f" as cdist, c.label as label))), 1, {int(nprobe)})"
    )
    probes = (
        q.crossJoin(F.broadcast(_fold_centroids(cent)))
        .select(F.col(id_col).alias("query_id"),
                F.explode(nearest).alias("p"))
        .select("query_id", F.col("p.label").alias("label"))
    )

    # Candidates: every vector in a probed cell. The probe list is tiny
    # (|queries| × nprobe) → broadcast it against the big cell relation;
    # the cell label is the partition-pruning axis at scale.
    cand = (
        cells.select(id_col, "label").join(F.broadcast(probes), "label")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
    )

    base = with_norm(emb, vec_col).select(F.col(id_col), F.col(vec_col), F.col("nrm"))
    qv = base.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        cand.join(base, id_col)
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", id_col,
            cosine(F.col("q_vec"), F.col(vec_col),
                   F.col("q_nrm"), F.col("nrm")).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "cosine", "rnk")
    )
