"""Similarity search over embedding columns — north-star extension
(SURVEY.md §2.11, generalizing the reference's ``simple_rag`` top-k
retrieval ``utils.py:326-330`` from keyword space to vector space).

Two paths, mirroring the dedup family's exact/LSH split:

* **Brute-force cosine top-k** — broadcast the (small) query set, scan
  the embedding table once, per-pair cosine, window top-k per query.
  The baseline: one narrow pass, no shuffle on the big side except the
  final per-query top-k (bounded: |queries| × k rows survive).
* **Sign-random-projection LSH (SRP)** — L hash tables × b hyperplane
  sign bits → bucket key per vector; same-bucket vectors are ANN
  candidates, verified with exact cosine. At 100 TB the all-pairs
  cosine is impossible; SRP turns it into L bucket groupBys whose
  output is data-dependent. Collision probability per table is
  ``(1 - θ/π)^b`` — tune (L, b) to the recall target.

Determinism/portability: hyperplanes are ±1 vectors derived from md5 in
PYTHON at import time and inlined as literals into both the Spark plan
and the DuckDB oracle — no engine RNG anywhere. All per-pair math is a
sequential left fold (Spark ``aggregate`` with 0.0 init ≡ DuckDB
``list_reduce``: IEEE addition order identical → bit-exact doubles).
Cross-row float sums are avoided entirely: centroids aggregate
``floor(v·1e6)`` BIGINTs, which are order-independent.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

# SRP-LSH geometry: 4 tables × 8 sign bits = 256 buckets/table.
SRP_TABLES = 4
SRP_BITS = 8
SRP_DIM = 64
QUANT_SCALE = 1_000_000  # centroid quantization: floor(v * 1e6)


def _srp_sign(table: int, bit: int, dim: int) -> int:
    """Deterministic ±1 hyperplane component from md5 (public,
    engine-independent): parity of the first 8 hex chars."""
    h = hashlib.md5(f"srp_{table}_{bit}_{dim}".encode()).hexdigest()
    return 1 if int(h[:8], 16) % 2 == 0 else -1


# hyperplanes[t][j] = 64-element ±1 list; built once at import.
HYPERPLANES: list[list[list[int]]] = [
    [[_srp_sign(t, j, i) for i in range(SRP_DIM)] for j in range(SRP_BITS)]
    for t in range(SRP_TABLES)
]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float-array columns, in double.
    Fold order matches DuckDB ``list_reduce`` bit-for-bit."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Zero-safe cosine: a zero-norm vector (empty doc, failed embedding
    job — guaranteed to exist somewhere in 100 TB) scores 0.0 instead of
    raising DIVIDE_BY_ZERO under ANSI mode / yielding NULL in DuckDB.
    0.0 (not NULL) keeps top-k window ordering engine-independent —
    NULLS FIRST/LAST defaults differ across engines. Mirror the CASE in
    every oracle that divides by norms (found by the embedding fuzz
    gate, tests/test_fuzz_oracle.py)."""
    den = norm_a * norm_b
    return F.when(den != 0, dot(a, b) / den).otherwise(F.lit(0.0))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Materialize the L2 norm next to each vector (computed once — see
    dedup module notes on lambda-expression inlining). NULL vectors are
    dropped here — a row without an embedding is not a point in the
    space, so no similarity operator should see it (mirrored as WHERE
    embedding IS NOT NULL in the oracles; found by the NULL-input
    sweep — at 100 TB a failed embedding job guarantees such rows)."""
    return emb.filter(F.col(vec_col).isNotNull()).withColumn(
        "nrm", norm(F.col(vec_col))
    )


def knn_cosine(emb: DataFrame, n_queries: int = 10, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: the query set is ``id < n_queries`` —
    an explicit predicate contract (mirrored verbatim in the DuckDB
    oracle), NOT "first n rows": with a sparse or offset id space the
    query set is smaller than ``n_queries``; pass ids that exist.
    Each query retrieves its ``k`` nearest neighbors (self excluded).

    Plan shape: broadcast(queries) × one scan of the table → window
    top-k per query. The only shuffle carries (queries × table) scored
    rows partitioned by query_id; at scale, pre-aggregate per-partition
    top-k first (AQE handles the final singleton-partition merge)."""
    base = with_norm(emb, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("nrm")
    )
    q = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = base.join(F.broadcast(q), F.col(id_col) != F.col("query_id")).select(
        "query_id", id_col,
        cosine(F.col("q_vec"), F.col(vec_col), F.col("q_nrm"), F.col("nrm")).alias("cosine"),
    )
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "cosine", "rnk")
    )


# All 32 hyperplanes as one 64×32 ±1 matrix (column t*SRP_BITS+j is
# table t's bit-j plane) so every bucket bit falls out of ONE matmul.
_SIGNS = np.array(
    [[HYPERPLANES[t][j][i] for t in range(SRP_TABLES) for j in range(SRP_BITS)]
     for i in range(SRP_DIM)],
    dtype=np.int64,
)
_BITPOW = (1 << np.arange(SRP_BITS, dtype=np.int64))


@F.pandas_udf(ArrayType(IntegerType()))
def _srp_table_buckets(vecs: pd.Series) -> pd.Series:
    """Per row: array of SRP_TABLES bucket ids. Quantized-integer sign
    dots — floor(v·1e6) int64 matmul — so the result is EXACT and
    summation-order-independent (numpy BLAS order ≠ a sequential fold,
    which is why the float formulation could never be oracle-parity-safe
    in a vectorized kernel)."""
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
    q = np.floor(m * QUANT_SCALE).astype(np.int64)     # B×64, |q| ≤ 1e6·max|v|
    d = q @ _SIGNS                                     # B×32 exact int64
    bits = (d > 0).astype(np.int64)
    buckets = np.stack(
        [bits[:, t * SRP_BITS:(t + 1) * SRP_BITS] @ _BITPOW
         for t in range(SRP_TABLES)],
        axis=1,
    ).astype(np.int32)
    return pd.Series(list(buckets))


def srp_buckets(emb: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(vec_id, table_id, bucket): per hash table, the vector's b-bit
    sign pattern against the fixed hyperplanes. One Arrow-batched
    vectorized projection + one explode — no shuffle; the relation ANN
    candidate joins run on. (Sign dots use quantized ints: measured ~40×
    less per-vector CPU than 32 interpreted higher-order folds, and the
    quantization makes the buckets engine-portable bit-for-bit.)"""
    return emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(_srp_table_buckets(F.col(vec_col))).alias("table_id", "bucket"),
    )


def srp_near_pairs(emb: DataFrame, threshold: float = 0.3,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed: candidates share an SRP
    bucket in ANY table; exact cosine ≥ threshold confirms. Bucket
    groupBy + local pair expansion (dedup-module pattern), then ONE
    re-join to fetch vectors for the exact check. The semantics ARE
    LSH semantics (recall < 1 by design) — the oracle replays the same
    buckets, so parity is exact."""
    from pulsar_project_spark.operators.dedup import _bucket_pairs

    from pulsar_project_spark.operators.dedup import MAX_BUCKET

    buckets = (
        srp_buckets(emb, id_col, vec_col)
        .groupBy("table_id", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ds"))
        .filter(F.size("ds").between(2, MAX_BUCKET))
    )
    cand = (
        buckets.select(F.explode(_bucket_pairs(buckets)).alias("p"))
        .select(F.col("p.a").alias("vec_a"), F.col("p.b").alias("vec_b"))
        .distinct()
    )
    base = with_norm(emb, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("nrm")
    )
    a = base.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
                    F.col("nrm").alias("na"))
    b = base.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
                    F.col("nrm").alias("nb"))
    return (
        cand.join(a, "vec_a").join(b, "vec_b")
        .select("vec_a", "vec_b",
                cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def label_centroid_qsums(emb: DataFrame, label_col: str = "label",
                         vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid building block, quantized for cross-engine
    exactness: (label, pos, qsum, n_vecs) where qsum = Σ floor(v·1e6)
    as BIGINT (order-independent — safe under Spark partial aggregation)
    and centroid[pos] ≈ qsum / (n_vecs·1e6). The k-means/assignment
    primitive for embedding clustering at scale: one explode + one
    shuffle on (label, pos)."""
    return (
        emb.filter(F.col(vec_col).isNotNull())
        .select(label_col, F.posexplode(vec_col).alias("pos0", "v"))
        .select(
            label_col,
            (F.col("pos0") + 1).alias("pos"),
            F.floor(F.col("v").cast("double") * QUANT_SCALE).cast("bigint").alias("q"),
        )
        .groupBy(label_col, "pos")
        .agg(F.sum("q").alias("qsum"), F.count("*").alias("n_vecs"))
    )


# worst-case guard (the MinHash MAX_BUCKET precedent): k ∝ n bounds
# cluster size only in EXPECTATION — a pathological corpus whose points
# all argmax onto one centroid would re-quadratize the per-cluster
# confirm. Clusters above this cap skip the pairwise confirm entirely
# (all members kept, pruned=0): conservative — semantic dedup may keep
# a duplicate, it must never drop a non-duplicate or the job.
SEMDEDUP_MAX_CLUSTER = 20_000


def semdedup_prune(emb: DataFrame, k: int | None = None,
                   threshold: float = 0.3,
                   per_cluster: int = 625,
                   max_cluster: int = SEMDEDUP_MAX_CLUSTER,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SEMANTIC DEDUPLICATION (SemDeDup, Abbas et al. 2023, arXiv
    2303.09540): cluster the embedding space, then drop near-duplicate
    points WITHIN each cluster — the trick that makes semantic dedup
    tractable at corpus scale, because the quadratic cosine check runs
    per cluster (O(n²/k) pairs), never across the corpus. Returns
    (id, cluster_id, pruned 0/1) for every embedded point.

    Deterministic, engine-portable variant: centroids are the ``k``
    lowest-id vectors (no RNG — the seeded-hash-twin convention of
    ``get_random_label``); assignment is argmax cosine with ties to the
    lowest centroid id; a point is pruned iff SOME lower-id point in
    its cluster sits within ``threshold`` cosine — the keep-first rule
    every exact-dedup family member uses, applied pairwise (NOT a
    transitive closure: each survivor is genuinely non-duplicate
    against every earlier survivor-or-not, matching the paper's
    epsilon-ball pruning more closely than component collapse would).

    Plan shape: one broadcast of k centroid rows × one scan (argmax
    window), then a self-equi-join ON cluster id with the lower-id
    filter — a shuffle on cluster, pairs expanded only within. k is
    NOT a constant: by default it scales as max(8, n // per_cluster)
    (one count() planning aggregate — the merge-bounds precedent), so
    per-cluster work stays bounded at any corpus size and total
    pairwise cost is O(n · per_cluster), linear in n. A fixed k would
    be quadratic — measured 43 s at a 10× corpus before this scaling,
    ~4 s after. The paper's k ≈ n/100 is the same law."""
    from pyspark.sql.window import Window

    base = with_norm(emb, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("nrm"))
    if k is None:
        k = max(8, base.count() // per_cluster)
    cent = base.orderBy(F.asc(id_col)).limit(k).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("c_vec"),
        F.col("nrm").alias("c_nrm"),
    )
    scored = base.crossJoin(F.broadcast(cent)).select(
        id_col, vec_col, "nrm", "cid",
        cosine(F.col(vec_col), F.col("c_vec"),
               F.col("nrm"), F.col("c_nrm")).alias("ccos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("cid"))
    assigned = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(id_col, "cid", vec_col, "nrm")
    )
    # only clusters within the worst-case cap enter pair generation —
    # the size relation is k rows, broadcast back onto the build side
    small = (assigned.groupBy("cid")
             .agg(F.count(F.lit(1)).alias("__csz"))
             .filter(F.col("__csz") <= max_cluster)
             .select(F.col("cid").alias("jcid")))
    a = assigned.select(F.col("cid").alias("jcid"),
                        F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("va"), F.col("nrm").alias("na")) \
        .join(F.broadcast(small), "jcid")
    b = assigned.select(F.col("cid").alias("jcid"),
                        F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("vb"), F.col("nrm").alias("nb"))
    pruned_ids = (
        a.join(b, "jcid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("va"), F.col("vb"),
                       F.col("na"), F.col("nb")) >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assigned.select(id_col, F.col("cid").alias("cluster_id"))
        .join(pruned_ids.withColumn("__p", F.lit(1)), id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce(F.col("__p"), F.lit(0)).cast("int").alias("pruned"),
        )
    )
