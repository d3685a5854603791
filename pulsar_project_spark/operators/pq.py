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


def pq_quantize_expr(vec_col: str = "embedding") -> str:
    """The family's ONE fixed-point input quantization (floor(x*SCALE)
    per coordinate) as a SQL string — shared by encode, training, and
    tests so the rounding mode can never drift between them (the
    norm16_sql / zbucket_shift pattern)."""
    return (f"transform({vec_col}, v -> cast(floor(cast(v as double) "
            f"* {PQ_SCALE}) as bigint))")


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


def pq_encode(vecs: DataFrame, id_col: str = "vec_id",
              carry: tuple[str, ...] = ()) -> DataFrame:
    """(vec_id, subspace, code): nearest-centroid assignment per
    subspace — exact integer argmin with lowest-code tiebreak. One
    map-only projection + explode; no shuffle, no UDF: at 100 TB this
    is the pass that shrinks the store ~32×.

    Expression shape matters here (round-6 probe, BENCH_NOTES.md): the
    original scalar form re-embedded each 8-term distance ~9× inside
    its least()/CASE argmin chains, blowing the tree past what codegen
    handles and costing ~7 s hot at sf0.1. This form quantizes the
    vector ONCE into a named array column, takes per-centroid
    distances with zip_with/aggregate, and argmins by sorting a K-row
    (dist, code) struct array — identical integer semantics (exceptAll
    parity both directions), ~3.5× faster, and each input element is
    referenced exactly once.

    ``carry`` keeps extra input columns through the explode (round 12:
    lets a preceding map-side cell assignment ride the same projection
    instead of re-joining on the id)."""
    qv = F.expr(pq_quantize_expr())

    # The expression is assembled as ONE SQL string parsed JVM-side
    # (round 13): the previous Column-API form created 96 Python
    # lambdas (8 subspaces x 4 centroids x zip_with/aggregate), each a
    # py4j callback round-trip, costing ~1.4 s of pure DRIVER time per
    # call — paid per micro-batch in the streaming ANN ingest and per
    # call site across the pq/ivfpq family. The parsed tree is the
    # same expression (same plan, byte-identical output; exceptAll
    # parity pinned in tests/test_pq.py).
    def sub_struct(m: int) -> str:
        dists = []
        for c in range(PQ_K):
            cent = ",".join(
                f"CAST({pq_codebook(m, c, j)} AS BIGINT)"
                for j in range(PQ_SUB)
            )
            dists.append(
                f"aggregate(zip_with(slice(__qv, {m * PQ_SUB + 1}, "
                f"{PQ_SUB}), array({cent}), (x, y) -> (x - y) * (x - y)), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            )
        # struct array sorts lexicographically: (dist, code) ascending
        # IS the argmin with lowest-code tiebreak
        pairs = ",".join(
            f"struct({d} AS d, CAST({c} AS INT) AS c)"
            for c, d in enumerate(dists)
        )
        return (f"struct(CAST({m} AS INT) AS subspace, "
                f"array_sort(array({pairs}))[0].c AS code)")

    exploded = F.expr(
        "explode(array(" + ",".join(sub_struct(m) for m in range(PQ_M)) + "))"
    )
    return (vecs.withColumn("__qv", qv)
            .select(F.col(id_col), *[F.col(c) for c in carry],
                    exploded.alias("s"))
            .select(id_col, *carry,
                    F.col("s.subspace").alias("subspace"),
                    F.col("s.code").alias("code")))


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


# ---------------------------------------------------------------------------
# Trained codebooks (round 6, VERDICT r5 #4): per-subspace Lloyd's
# k-means in the SAME quantized integer domain as the fixed-codebook
# path, so the trained encode/ADC ride the exact plans above with the
# codebook relation broadcast in — the promise the round-5 docstring
# made, now real. With a deterministic init (the PQ_K lowest vec_ids'
# subvectors) and a fixed round count, the whole computation is
# closed-form and the DuckDB oracle replays it; more rounds just nest
# more CTEs. Integer floor-mean updates keep every round reproducible
# under any partitioning (operators/kmeans.py rationale).
# ---------------------------------------------------------------------------


def _pq_subvectors(vecs: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(vec_id, m, sv ARRAY<BIGINT>): the quantized subvector relation
    — one row per (vector, subspace), the unit Lloyd's operates on."""
    qv = F.expr(pq_quantize_expr())
    subs = F.expr("array(" + ",".join(
        f"struct(CAST({m} AS INT) AS m, "
        f"slice(__qv, {m * PQ_SUB + 1}, {PQ_SUB}) AS sv)"
        for m in range(PQ_M)
    ) + ")")
    return (vecs.withColumn("__qv", qv)
            .select(F.col(id_col), F.explode(subs).alias("s"))
            .select(id_col, F.col("s.m").alias("m"), F.col("s.sv").alias("sv")))


# SQL-string distance (round 13, the pq_encode rationale): Python-lambda
# HOFs pay a py4j callback per construction; the parsed tree is the
# same expression.
_SV_DIST_SQL = ("aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
                "cast(0 as bigint), (acc, v) -> acc + v)")


def _sv_dist(a, b):
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def _fold_codebook(codebook: DataFrame) -> DataFrame:
    """``(m, cands ARRAY<STRUCT<c,qc>>)``: the per-subspace codebook
    rows folded into one sorted array row per subspace, so the encode
    join stays 1:1 (M broadcast rows) instead of multiplying every
    subvector by K candidate rows and re-collapsing through a window
    exchange (round 12 — see ``_assign_sv``)."""
    return codebook.groupBy("m").agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("c").cast("int").alias("c"), F.col("qc").alias("qc"),
        ))).alias("__cands"))


def _assign_sv(sub: DataFrame, codebook: DataFrame) -> DataFrame:
    """Map-side per-(vector, subspace) argmin against a trained
    codebook: broadcast the M folded rows, sort the K-element
    ``(__d, c)`` struct array — BIGINT distances total-order, so the
    lexicographic sort IS the window's ``ORDER BY __d ASC, c ASC``
    pick-first with no exchange. Keeps ``sv`` (the training update
    step needs it)."""
    best = F.expr(
        "array_sort(transform(__cands, cc -> struct("
        + _SV_DIST_SQL.format(a="sv", b="cc.qc")
        + " as __d, cc.c as c)))[0]"
    )
    return (sub.join(F.broadcast(_fold_codebook(codebook)), "m")
            .withColumn("__best", best)
            .withColumns({"c": F.col("__best")["c"],
                          "__d": F.col("__best")["__d"]}))


def pq_train(vecs: DataFrame, rounds: int = 1,
             id_col: str = "vec_id") -> DataFrame:
    """Per-subspace Lloyd's: returns the trained codebook relation
    ``(m, c, qc ARRAY<BIGINT>)``. Init: centroid c of every subspace is
    the subvector of the c-th lowest vec_id (no RNG — reproducible and
    SQL-replayable). Each round: assign every (vector, subspace) to its
    nearest centroid (integer argmin, lowest-label tiebreak), then
    floor-mean update per (m, label, dim). Labels with no members drop
    out, exactly as in ``kmeans_fit``. Precondition: unique vec_ids
    (true of every corpus here); duplicate ids would make the init
    join ambiguous.

    Scale shape per round: one M-row folded-codebook broadcast, one
    MAP-SIDE argmin pass (round 12 — previously a K-way row expansion
    re-collapsed through a (vec_id, m)-window exchange), one groupBy
    update over (m, label, j) — M*K*SUB groups, trivially mergeable."""
    from pyspark.sql.window import Window

    # duplicate ids would make the init join ambiguous AND diverge from
    # the oracle (Spark's window argmin would score each duplicate
    # centroid separately while the oracle's GROUP BY sums across them)
    # — fail loudly instead, the kmeans_fit require_k precedent. The
    # corpus contract (tests/test_corpus_contracts.py) makes this free
    # on real data; the count guards dirty inputs.
    # one job, not two (ADVICE r6): count + countDistinct in a single agg
    n_rows, n_ids = vecs.agg(
        F.count(F.lit(1)), F.countDistinct(id_col)).first()
    if n_rows != n_ids:
        raise ValueError(
            f"pq_train: need unique {id_col}s (got {n_rows} rows, "
            f"{n_ids} distinct) — deduplicate before training"
        )
    sub = _pq_subvectors(vecs, id_col).localCheckpoint(eager=True)
    init_ids = (vecs.select(id_col).distinct().orderBy(F.asc(id_col))
                .limit(PQ_K))
    w0 = Window.orderBy(F.asc(id_col))
    init = init_ids.select(
        F.col(id_col).alias("__cvid"),
        (F.row_number().over(w0) - 1).cast("int").alias("c"),
    )
    cent = (sub.join(init, sub[id_col] == init["__cvid"])
            .select("m", "c", F.col("sv").alias("qc"))
            .localCheckpoint(eager=True))
    for _ in range(rounds):
        assign = _assign_sv(sub, cent).select(id_col, "m", "sv", "c")
        upd = (
            assign.select("m", F.col("c").alias("label"),
                          F.posexplode("sv").alias("j", "x"))
            .groupBy("m", "label", "j")
            .agg(F.floor(F.sum("x") / F.count("*")).alias("qcj"))
        )
        cent = (
            upd.groupBy("m", F.col("label").alias("c"))
            .agg(F.sort_array(F.collect_list(F.struct("j", "qcj"))).alias("jc"))
            .select("m", "c",
                    F.expr("transform(jc, s -> s.qcj)").alias("qc"))
            .localCheckpoint(eager=True)
        )
    return cent


def pq_encode_trained(vecs: DataFrame, codebook: DataFrame,
                      id_col: str = "vec_id") -> DataFrame:
    """(vec_id, subspace, code) against a TRAINED codebook relation:
    the data-dependent twin of ``pq_encode`` — same argmin semantics,
    but the codebook arrives as a broadcast relation instead of
    compile-time literals (one M-row folded broadcast join + MAP-SIDE
    per-(vector, subspace) argmin — round 12: no window exchange, no
    K-way row expansion; still no wide shuffle of the store)."""
    sub = _pq_subvectors(vecs, id_col)
    return (_assign_sv(sub, codebook)
            .select(id_col, F.col("m").alias("subspace"),
                    F.col("c").cast("int").alias("code")))


def pq_adc_topk_trained(codes: DataFrame, codebook: DataFrame,
                        query_q: list[int], k: int = 10,
                        id_col: str = "vec_id") -> DataFrame:
    """ADC search against a trained codebook: the LUT is computed AS A
    RELATION (query subvectors joined to the codebook — M*K rows) and
    broadcast onto the code relation; after that the plan is identical
    to the fixed-codebook ``pq_adc_topk``."""
    spark = codes.sparkSession
    qsub = spark.createDataFrame(
        [(m, [query_q[m * PQ_SUB + j] for j in range(PQ_SUB)])
         for m in range(PQ_M)],
        "m int, qsub array<bigint>",
    )
    lut = codebook.join(F.broadcast(qsub), "m").select(
        F.col("m").alias("subspace"), F.col("c").alias("code"),
        F.expr(_SV_DIST_SQL.format(a="qsub", b="qc")).alias("sq_dist"),
    )
    return (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .groupBy(id_col)
        .agg(F.sum("sq_dist").cast("bigint").alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
