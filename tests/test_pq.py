"""Pins for product quantization beyond the oracle's bit parity.

Zero-residual exactness: a vector sitting EXACTLY on a codebook
centroid combination must encode to those codes, and its ADC distance
to any query must equal the true quantized squared distance (PQ's
approximation error IS the residual; at residual zero, ADC is exact).
This separates "the argmin matches the oracle" from "the geometry is
right".
"""

from __future__ import annotations

from pulsar_project_spark.operators.pq import (
    PQ_DIM,
    PQ_K,
    PQ_M,
    PQ_SCALE,
    PQ_SUB,
    pq_adc_topk,
    pq_codebook,
    pq_encode,
    pq_query_lut,
)


def _centroid_vector(codes: list[int]) -> list[float]:
    """Float vector whose quantization lands exactly on the given
    centroid per subspace (codebook values are multiples of PQ_SCALE,
    so value/SCALE is exactly representable and floor() recovers it)."""
    v = []
    for m in range(PQ_M):
        for j in range(PQ_SUB):
            v.append(pq_codebook(m, codes[m], j) / PQ_SCALE)
    return v


def test_zero_residual_vectors_encode_to_their_codes(spark):
    rows = []
    expected = {}
    for i in range(8):
        codes = [(i + m) % PQ_K for m in range(PQ_M)]
        rows.append((i, _centroid_vector(codes)))
        expected[i] = codes
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got: dict[int, dict[int, int]] = {}
    for r in pq_encode(vecs).collect():
        got.setdefault(r["vec_id"], {})[r["subspace"]] = r["code"]
    for i, codes in expected.items():
        assert [got[i][m] for m in range(PQ_M)] == codes


def test_adc_is_exact_at_zero_residual(spark):
    codes = [1] * PQ_M
    vecs = spark.createDataFrame(
        [(0, _centroid_vector(codes))], "vec_id long, embedding array<double>"
    )
    query_q = [(((i * 5) % 7) - 3) * PQ_SCALE for i in range(PQ_DIM)]
    [row] = pq_adc_topk(pq_encode(vecs), query_q, k=1).collect()
    true_sq = sum(
        (query_q[m * PQ_SUB + j] - pq_codebook(m, 1, j)) ** 2
        for m in range(PQ_M) for j in range(PQ_SUB)
    )
    assert row["adc_dist"] == true_sq
    # and the LUT the operator builds is the same closed form
    lut = {(m, c): d for m, c, d in pq_query_lut(query_q)}
    assert sum(lut[(m, 1)] for m in range(PQ_M)) == true_sq


# --- round-6: trained codebooks ---------------------------------------------


def test_trained_pq_improves_or_matches_fixed_quantization_error(spark):
    """Lloyd's must not LOSE to the data-blind fixed codebook on the
    training data itself: mean squared quantization error of the
    trained assignment <= the fixed codebook's (the monotone-descent
    property of k-means applied per subspace — init already covers the
    data better than arbitrary fixed integers, and each round only
    decreases total distortion)."""
    from pyspark.sql import functions as F

    from pulsar_project_spark.operators.pq import (
        _sq_dist,
        _sv_dist,
        _pq_subvectors,
        pq_train,
    )
    from tests.conftest import SF_CORRECT

    emb = (spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
           .filter(F.col("embedding").isNotNull()
                   & F.col("vec_id").isNotNull()))

    # fixed-codebook distortion: min over c of the closed-form distance
    fixed = emb.select(*[
        F.least(*[_sq_dist(m, c) for c in range(4)]).alias(f"d{m}")
        for m in range(8)
    ])
    fixed_total = fixed.select(
        sum(F.sum(f"d{m}") for m in range(8)).alias("t")
    ).collect()[0]["t"]

    # trained distortion: min over trained centroids
    cb = pq_train(emb, rounds=1)
    sub = _pq_subvectors(emb)
    scored = sub.join(F.broadcast(cb), "m").select(
        "vec_id", "m", _sv_dist(F.col("sv"), F.col("qc")).alias("d")
    )
    trained_total = (scored.groupBy("vec_id", "m").agg(F.min("d").alias("d"))
                     .agg(F.sum("d").alias("t")).collect()[0]["t"])

    assert trained_total <= fixed_total, (
        f"trained distortion {trained_total} worse than fixed {fixed_total}"
    )


def test_trained_adc_recall_vs_exact_quantized_l2(spark):
    """Recall pin in the test_ivf style: the exact top-10 (integer
    quantized L2 over the FULL vectors) must largely survive inside the
    trained-codebook ADC top-100 SHORTLIST — shortlist-then-rerank is
    how PQ is actually deployed, and a 16-bit code (M=8, K=4) cannot be
    expected to rank the top-10 exactly. Chance level for a 100-of-500
    shortlist is 0.2; observed 0.9 — pin well above chance, below
    observed, to stay robust across Spark versions."""
    from pyspark.sql import functions as F

    from pulsar_project_spark.operators.pq import (
        PQ_DIM,
        PQ_SCALE,
        pq_adc_topk_trained,
        pq_encode_trained,
        pq_train,
    )
    from tests.conftest import SF_CORRECT

    emb = (spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
           .filter(F.col("embedding").isNotNull()
                   & F.col("vec_id").isNotNull()))
    query_q = [(((i * 5) % 7) - 3) * PQ_SCALE for i in range(PQ_DIM)]

    # exact: integer L2 between quantized vectors and the query
    qv = F.expr(
        f"transform(embedding, v -> cast(floor(cast(v as double) "
        f"* {PQ_SCALE}) as bigint))"
    )
    qlit = F.array(*[F.lit(x).cast("bigint") for x in query_q])
    dist = F.aggregate(
        F.zip_with(qv, qlit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v,
    )
    exact = {r.vec_id for r in
             emb.select("vec_id", dist.alias("d"))
             .orderBy(F.asc("d"), F.asc("vec_id")).limit(10).collect()}

    cb = pq_train(emb, rounds=1)
    approx = {r.vec_id for r in
              pq_adc_topk_trained(pq_encode_trained(emb, cb), cb,
                                  query_q, k=100).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"trained-ADC shortlist recall collapsed: {recall}"


def test_binary_quantization_shortlist_recall(spark):
    """1-bit quantization is the fast-scan stage of a scan-then-rerank
    pipeline: the exact top-10 must survive the Hamming top-100
    shortlist well above chance (100 of 500 = 0.2). Observed 0.6 on
    the fixed corpus; pinned at 0.4 — sign bits of random-ish vectors
    can't be expected to do better, and the claim under test is
    'useful shortlist', not 'exact ranking'."""
    from pyspark.sql import functions as F

    from pulsar_project_spark.operators.pq import PQ_DIM, PQ_SCALE
    from pulsar_project_spark.queries.similarity_ops import (
        _bq_pack_sql,
        _bq_query_words,
    )
    from tests.conftest import SF_CORRECT

    emb = (spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
           .filter(F.col("embedding").isNotNull()
                   & F.col("vec_id").isNotNull()))
    query_q = [(((i * 5) % 7) - 3) * PQ_SCALE for i in range(PQ_DIM)]
    qv = F.expr(
        f"transform(embedding, v -> cast(floor(cast(v as double) "
        f"* {PQ_SCALE}) as bigint))"
    )
    qlit = F.array(*[F.lit(x).cast("bigint") for x in query_q])
    dist = F.aggregate(
        F.zip_with(qv, qlit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v,
    )
    exact = {r.vec_id for r in
             emb.select("vec_id", dist.alias("d"))
             .orderBy(F.asc("d"), F.asc("vec_id")).limit(10).collect()}

    lo_e, hi_e = _bq_pack_sql(lambda i: f"element_at(embedding, {i})")
    qlo, qhi = _bq_query_words()
    packed = emb.select(
        "vec_id",
        F.expr(lo_e).cast("bigint").alias("lo"),
        F.expr(hi_e).cast("bigint").alias("hi"),
    )
    short = {r.vec_id for r in
             packed.select(
                 "vec_id",
                 (F.bit_count(F.expr(f"lo ^ {qlo}"))
                  + F.bit_count(F.expr(f"hi ^ {qhi}"))).alias("h"))
             .orderBy(F.asc("h"), F.asc("vec_id")).limit(100).collect()}
    recall = len(exact & short) / 10
    assert recall >= 0.4, f"Hamming shortlist recall collapsed: {recall}"


def test_ivfpq_rerank_recall_vs_global_exact(spark):
    """VERDICT r7 #4's recall pin, decomposed the way the two-stage
    design actually budgets its losses (everything here is
    deterministic — fixed query, deterministic k-means — so each
    number is a constant of the sf0.01 corpus, the test_ivf style):

    1. EXACTNESS of stage 2: the reranked top-10 must equal the exact
       top-10 RESTRICTED to the shortlist ids — the rerank stage
       itself is allowed zero loss.
    2. Rerank never hurts: global recall of the reranked top-10 >=
       global recall of the plain ADC top-10 (which is 0.0 here —
       16-bit codes on near-random synthetic vectors carry almost no
       rank signal; the rerank stage is what makes IVF-PQ usable).
    3. The measured global recall constant (0.5 routing x 0.5
       shortlist ~= 0.1 end to end on this corpus) must not regress."""
    from pyspark.sql import functions as F

    from pulsar_project_spark.operators.kmeans import kmeans_fit, _sq_dist
    from pulsar_project_spark.operators.pq import (
        PQ_DIM,
        PQ_SCALE,
        pq_adc_topk,
        pq_encode,
    )
    from pulsar_project_spark.queries.similarity_ops import (
        q_ivfpq_rerank_topk,
    )
    from tests.conftest import SF_CORRECT

    emb = (spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
           .filter(F.col("embedding").isNotNull()
                   & F.col("vec_id").isNotNull()))
    qv = F.expr(
        "transform(embedding, v -> cast(floor(cast(v as double) "
        "* 1000000.0) as bigint))"
    )
    qlit = F.array(*[F.lit((((i * 5) % 7) - 3) * 1_000_000).cast("bigint")
                     for i in range(PQ_DIM)])
    dist = F.aggregate(
        F.zip_with(qv, qlit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v,
    )
    exact_global = {r.vec_id for r in
                    emb.select("vec_id", dist.alias("d"))
                    .orderBy(F.asc("d"), F.asc("vec_id")).limit(10).collect()}

    # rebuild the pipeline's stage-1 shortlist to isolate stage 2
    cells, cent = kmeans_fit(emb, k=8, iters=1, require_k=False)
    probes = (cent.select("label", _sq_dist(qlit, F.col("qc")).alias("d"))
              .orderBy(F.asc("d"), F.asc("label")).limit(3).select("label"))
    cand = cells.join(F.broadcast(probes), "label").select("vec_id")
    query_q = [(((i * 5) % 7) - 3) * PQ_SCALE for i in range(PQ_DIM)]
    codes = pq_encode(emb).join(cand, "vec_id", "left_semi")
    shortlist = pq_adc_topk(codes, query_q, k=100).select("vec_id")
    exact_over_shortlist = [
        r.vec_id for r in
        emb.join(F.broadcast(shortlist), "vec_id", "left_semi")
        .select("vec_id", dist.alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id")).limit(10).collect()]

    reranked = [r.vec_id
                for r in q_ivfpq_rerank_topk(spark, SF_CORRECT).collect()]
    # 1. stage-2 exactness (order included)
    assert reranked == exact_over_shortlist
    # 2. rerank never hurts vs the no-rerank ADC top-10
    adc10 = {r.vec_id for r in
             pq_adc_topk(codes, query_q, k=10).collect()}
    r_rerank = len(exact_global & set(reranked)) / 10
    r_adc = len(exact_global & adc10) / 10
    assert r_rerank >= r_adc
    # 3. the deterministic end-to-end constant must not regress
    assert r_rerank >= 0.1, f"ivfpq rerank recall regressed: {r_rerank}"
