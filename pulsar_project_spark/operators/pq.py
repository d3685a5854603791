"""Product quantization (PQ) for the embedding store — the ANN
family's memory-compression path (brute-force kNN is the exact
baseline, SRP-LSH and IVF are the pruning paths; PQ is how 100 TB of
float vectors become bytes: Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011).

The vector splits into M subspaces; each subvector is replaced by the
id of its nearest subspace centroid, so a D-float vector stores as M
small codes, and search runs over codes with a per-query lookup table
(asymmetric distance computation, ADC) — no float vector is ever
touched at query time.

Certification: like ``ivf_cell_assignment``, the codebooks here are
FIXED integer-valued centroids and the inputs quantize to integers
first, so assignment argmins and ADC distances are exact integer
arithmetic the DuckDB oracle replays term by term (the trained-
codebook variant would ride the same plan with k-means output
broadcast in — the training loop already exists in operators/kmeans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PQ_DIM = 64        # embedding dimensionality
PQ_M = 8           # subspaces
PQ_SUB = PQ_DIM // PQ_M
PQ_K = 4           # centroids per subspace (tiny fixed codebook)
PQ_SCALE = 64      # fixed-point input quantization: xq = floor(x*64)
                   # (floor, not round — the repo-wide convention the
                   # label_centroid_qsums oracle already certifies)


def pq_codebook(m: int, c: int, j: int) -> int:
    """Deterministic integer codebook entry (subspace m, centroid c,
    local dim j), already in the quantized domain (×PQ_SCALE)."""
    return (((m * 31 + c * 17 + j * 7) % 13) - 6) * PQ_SCALE


def _sq_dist(m: int, c: int):
    """Integer squared distance from subvector m to centroid c."""
    terms = []
    for j in range(PQ_SUB):
        x = F.expr(
            f"cast(floor(cast(element_at(embedding, {m * PQ_SUB + j + 1}) "
            f"as double) * {PQ_SCALE}) as bigint)"
        )
        d = x - F.lit(pq_codebook(m, c, j))
        terms.append(d * d)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def pq_encode(vecs: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(vec_id, subspace, code): nearest-centroid assignment per
    subspace — exact integer argmin with lowest-code tiebreak. One
    codegen projection + explode; no shuffle, no UDF: at 100 TB this
    is a map-only pass that shrinks the store ~32×."""
    subs = []
    for m in range(PQ_M):
        dists = [_sq_dist(m, c) for c in range(PQ_K)]
        best = F.least(*dists)
        code = F.lit(PQ_K - 1)
        for c in range(PQ_K - 2, -1, -1):
            code = F.when(dists[c] == best, F.lit(c)).otherwise(code)
        subs.append(F.struct(
            F.lit(m).cast("int").alias("subspace"),
            code.cast("int").alias("code"),
        ))
    return vecs.select(
        F.col(id_col), F.explode(F.array(*subs)).alias("s")
    ).select(
        id_col,
        F.col("s.subspace").alias("subspace"),
        F.col("s.code").alias("code"),
    )


def pq_query_lut(query_q: list[int]) -> list[tuple[int, int, int]]:
    """(subspace, code, sq_dist) ADC lookup table for a quantized
    query vector — M×K integers, the per-query constant that replaces
    every float op at search time."""
    lut = []
    for m in range(PQ_M):
        for c in range(PQ_K):
            d = sum(
                (query_q[m * PQ_SUB + j] - pq_codebook(m, c, j)) ** 2
                for j in range(PQ_SUB)
            )
            lut.append((m, c, d))
    return lut


def pq_adc_topk(codes: DataFrame, query_q: list[int], k: int = 10,
                id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance top-k over the CODE relation: broadcast-join
    the M×K-row lookup table onto the codes, sum per vector, take the
    k smallest (vec_id tiebreak). The float vectors are never read —
    the whole search touches M integers per stored vector plus one
    32-row broadcast."""
    spark = codes.sparkSession
    lut = spark.createDataFrame(
        pq_query_lut(query_q), "subspace int, code int, sq_dist long"
    )
    return (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .groupBy(id_col)
        .agg(F.sum("sq_dist").cast("bigint").alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
