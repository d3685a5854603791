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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    return dot(a, b) / (norm_a * norm_b)


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Materialize the L2 norm next to each vector (computed once — see
    dedup module notes on lambda-expression inlining)."""
    return emb.withColumn("nrm", norm(F.col(vec_col)))


def knn_cosine(emb: DataFrame, n_queries: int = 10, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: the first ``n_queries`` vectors (by id)
    each retrieve their ``k`` nearest neighbors (self excluded).

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


def srp_buckets(emb: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(vec_id, table_id, bucket): per hash table, the vector's b-bit
    sign pattern against the fixed hyperplanes. Pure projection + one
    explode — no shuffle; the relation ANN candidate joins run on."""
    rows = []
    for t in range(SRP_TABLES):
        bits = [
            F.when(
                dot(F.col(vec_col),
                    F.array(*[F.lit(float(s)) for s in HYPERPLANES[t][j]])) > 0,
                F.lit(1 << j),
            ).otherwise(F.lit(0))
            for j in range(SRP_BITS)
        ]
        bucket = bits[0]
        for b in bits[1:]:
            bucket = bucket + b
        rows.append(F.struct(F.lit(t).alias("table_id"), bucket.alias("bucket")))
    return emb.select(
        F.col(id_col), F.explode(F.array(*rows)).alias("tb")
    ).select(id_col, F.col("tb.table_id").alias("table_id"),
             F.col("tb.bucket").alias("bucket"))


def srp_near_pairs(emb: DataFrame, threshold: float = 0.3,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed: candidates share an SRP
    bucket in ANY table; exact cosine ≥ threshold confirms. Bucket
    groupBy + local pair expansion (dedup-module pattern), then ONE
    re-join to fetch vectors for the exact check. The semantics ARE
    LSH semantics (recall < 1 by design) — the oracle replays the same
    buckets, so parity is exact."""
    from pulsar_project_spark.operators.dedup import _bucket_pairs

    buckets = (
        srp_buckets(emb, id_col, vec_col)
        .groupBy("table_id", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ds"))
        .filter(F.size("ds") > 1)
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
        emb.select(label_col, F.posexplode(vec_col).alias("pos0", "v"))
        .select(
            label_col,
            (F.col("pos0") + 1).alias("pos"),
            F.floor(F.col("v").cast("double") * QUANT_SCALE).cast("bigint").alias("q"),
        )
        .groupBy(label_col, "pos")
        .agg(F.sum("q").alias("qsum"), F.count("*").alias("n_vecs"))
    )
