"""Lloyd's k-means over the embedding table — iterative DataFrame ML
(SURVEY.md §2.11 similarity family; the clustering counterpart of the
centroid building block in operators/similarity.py).

Distributed determinism by construction: every coordinate is quantized
to BIGINT (``floor(v·1e6)``), distances are integer sums of squares,
centroid updates are integer floor-divisions — so the result is
EXACTLY reproducible regardless of partitioning, partial-aggregation
order, or cluster size, and a numpy replica asserts equality in tests.
(Float k-means differs in the last bits across reduction orders, which
makes distributed runs non-reproducible — the classic trap.)

Per iteration: one broadcast of k centroids (tiny), one MAP-SIDE
assignment pass (argmin over k via a sorted struct array — round 12:
the original crossJoin-k-rows + row_number window shuffled k rows per
vector per iteration; folding the k centroids into ONE broadcast array
row makes assignment a zero-shuffle projection with identical integer
argmin + lowest-label tiebreak semantics), one groupBy(label, pos)
shuffle for the update — Lloyd's at 100 TB is exactly these steps;
``localCheckpoint`` truncates plan lineage per round (see
operators/clustering.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT = 1_000_000


# Expressions below are SQL strings parsed JVM-side, not Column-API
# lambda compositions (round 13): every Python lambda in a HOF costs a
# py4j callback round trip at DataFrame-construction time, and these
# run per call site (per Lloyd round, per micro-batch in streaming).
# The parsed trees are the identical expressions — same plan, same
# bytes out (numpy replica + oracle parity unchanged).

def _quantize(emb: DataFrame, id_col: str, vec_col: str,
              keep: tuple[str, ...] = ()) -> DataFrame:
    qv = F.expr(
        f"transform({vec_col}, v -> "
        f"cast(floor(cast(v as double) * {QUANT}) as bigint))"
    )
    return emb.select(F.col(id_col), *[F.col(c) for c in keep],
                      qv.alias("qv"))


_SQ_DIST_SQL = ("aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
                "cast(0 as bigint), (acc, v) -> acc + v)")


def _sq_dist(a, b):
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def _fold_centroids(cent: DataFrame) -> DataFrame:
    """The k centroid rows folded into ONE ``(cents
    ARRAY<STRUCT<label,qc>>)`` row, sorted by label — the broadcastable
    scalar form of the quantizer. ``collect_list`` order is partition-
    dependent, so the fold sorts; labels are unique, making the sorted
    array deterministic."""
    return cent.agg(F.array_sort(F.collect_list(F.struct(
        F.col("label").cast("int").alias("label"), F.col("qc").alias("qc"),
    ))).alias("__cents"))


def _assign_nearest(q: DataFrame, cent: DataFrame,
                    out_cols: list) -> DataFrame:
    """Map-side nearest-centroid assignment: 1-row broadcast crossJoin
    of the folded quantizer, then a per-row argmin by sorting the
    k-element ``(sq_dist, label)`` struct array — BIGINT distances
    total-order, so the lexicographic struct sort IS the window's
    ``ORDER BY sq_dist ASC, label ASC`` pick-first, with no exchange.
    Adds ``label`` and ``sq_dist`` columns; ``out_cols`` is the final
    projection."""
    best = F.expr(
        "array_sort(transform(__cents, c -> struct("
        + _SQ_DIST_SQL.format(a="qv", b="c.qc")
        + " as d, c.label as label)))[0]"
    )
    # one withColumn + one select (was four chained transformations —
    # each DataFrame method analyzes the whole growing tree eagerly)
    proj = {"label": F.col("__best")["label"].alias("label"),
            "sq_dist": F.col("__best")["d"].alias("sq_dist")}
    return (
        q.crossJoin(F.broadcast(_fold_centroids(cent)))
        .withColumn("__best", best)
        .select(*[proj.get(c, F.col(c)) for c in out_cols])
    )


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 3,
               id_col: str = "vec_id", vec_col: str = "embedding",
               require_k: bool = True) -> tuple[DataFrame, DataFrame]:
    """Lloyd rounds returning BOTH the assignment ``(vec_id, label,
    sq_dist)`` and the final quantized centroids ``(label, qc
    ARRAY<BIGINT>)`` — the coarse quantizer IVF search probes against.
    Init: centroids = the first k vectors by id (deterministic, no RNG).
    ``require_k=False`` degrades to min(k, n) centroids on a tiny input
    instead of raising — the oracle-checked cell-assignment query needs
    that (its SQL ``LIMIT k`` naturally takes fewer rows)."""
    q = _quantize(emb, id_col, vec_col).localCheckpoint(eager=True)
    # First k BY ORDER (TakeOrderedAndProject), not `id < k`: sparse or
    # offset id spaces would silently yield < k centroids under a filter.
    first_k = q.orderBy(F.asc(id_col)).limit(k)
    w0 = Window.orderBy(F.asc(id_col))
    cent = first_k.select(
        (F.row_number().over(w0) - 1).cast("int").alias("label"),
        F.col("qv").alias("qc"),
    ).localCheckpoint(eager=True)
    if require_k and cent.count() < k:
        raise ValueError(
            f"kmeans_fit: need at least k={k} input vectors, "
            f"got {cent.count()}"
        )

    assign = None
    for it in range(iters):
        assign = _assign_nearest(q, cent, [id_col, "qv", "label", "sq_dist"])
        if it == iters - 1:
            break  # returned centroids are the ones that PRODUCED assign
        # update: quantized mean per (label, dim) — floor(sum/count) in
        # double (sums < 2^34, exact in float64; numpy replica matches)
        upd = (
            assign.select("label", F.posexplode("qv").alias("pos", "x"))
            .groupBy("label", "pos")
            .agg(F.floor(F.sum("x") / F.count("*")).alias("c"))
        )
        cent = (
            upd.groupBy("label")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select(
                "label",
                F.expr("transform(pc, s -> s.c)").alias("qc"),
            )
            .localCheckpoint(eager=True)
        )
    return assign.select(id_col, "label", "sq_dist"), cent


def kmeans_assign_to(emb: DataFrame, cent: DataFrame,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     keep: tuple[str, ...] = ()) -> DataFrame:
    """Assign vectors to FROZEN centroids ``(label, qc)`` — the
    incremental-index maintenance primitive: new vectors join an
    existing coarse quantizer WITHOUT retraining (retraining on every
    append would re-shard the whole store; production IVF freezes the
    quantizer at train time and only re-trains offline). Same integer
    argmin + lowest-label tiebreak as ``kmeans_fit``'s assignment
    step, so assign-then-union == union-then-assign exactly.

    ``keep`` carries extra input columns through the (map-side)
    assignment — e.g. ``keep=("embedding",)`` lets a PQ encode follow
    without re-joining on the id (round 12: the assign⋈encode join was
    a per-micro-batch shuffle in the ANN ingest/maintenance paths)."""
    q = _quantize(emb, id_col, vec_col, keep=keep)
    return _assign_nearest(q, cent,
                           [id_col, *keep, "label", "sq_dist"])


def kmeans_assign(emb: DataFrame, k: int = 8, iters: int = 3,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, label, sq_dist) after ``iters`` Lloyd rounds."""
    assign, _ = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    return assign
