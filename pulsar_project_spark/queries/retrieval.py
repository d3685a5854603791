"""Declared queries: keyword-overlap retrieval (SURVEY.md §2.5).

Flagship ``simple_rag`` (reference utils.py:326-330) plus the scored
relation it derives from. The query string is a constant so the DuckDB
oracle can inline the same keyword literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.operators.retrieval import (
    extract_query_keywords,
    score_corpus,
    simple_rag,
)
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_table

# Constant flagship query. "windo" is a deliberate partial token: the
# reference scores by SUBSTRING containment (utils.py:254-259), so it must
# match every document containing "window" — this pins the semantic.
FLAGSHIP_QUERY = "Fast vector scan, merge windo!"
FLAGSHIP_KEYWORDS = extract_query_keywords(FLAGSHIP_QUERY)
FLAGSHIP_TOP_K = 5  # reference default, utils.py:326

_CLEANED = r"regexp_replace(lower(text), '[^\w\s]', '', 'g')"


def _score_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN contains(cleaned, '{kw}') THEN 1 ELSE 0 END)"
        for kw in FLAGSHIP_KEYWORDS
    )
    return f"""
WITH cleaned_docs AS (
  SELECT doc_id, {_CLEANED} AS cleaned FROM documents
)
SELECT doc_id, {terms} AS score
FROM cleaned_docs
"""


@declare(
    "simple_rag_topk",
    oracle=_score_sql() + f"ORDER BY score DESC, doc_id ASC LIMIT {FLAGSHIP_TOP_K}",
)
def q_simple_rag_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: top-5 docs by keyword-overlap with stable tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    return simple_rag(docs, FLAGSHIP_QUERY, top_k=FLAGSHIP_TOP_K)


@declare("keyword_score_scan", oracle=_score_sql())
def q_keyword_score_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full scored relation (no top-k) — checks the scoring expression
    over every row, not just the winners."""
    docs = load_table(spark, sf_dir, "documents")
    return score_corpus(docs, FLAGSHIP_QUERY)


# --- BM25 (beyond-reference retrieval upgrade) ------------------------------

from pulsar_project_spark.functions.text import COMMON_ENGLISH_WORDS
from pulsar_project_spark.operators.retrieval import bm25_scores

BM25_TERMS = ["filter", "merge", "scan", "window"]  # fixed, sorted

_BM25_STOP = "[" + ",".join(f"'{w}'" for w in sorted(COMMON_ENGLISH_WORDS)) + "]"

_BM25_SCORES_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(regexp_replace(lower(text), '[^\w\s]', '', 'g'), '\s+'),
           t -> t <> '' AND NOT list_contains({_BM25_STOP}, t))) AS token
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
consts AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM toks) AS t_tokens
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks
  WHERE token IN ('filter', 'merge', 'scan', 'window')
  GROUP BY doc_id, token
),
idf AS (
  SELECT token,
         CAST(round(ln(CAST(2*(n_docs+1) AS DOUBLE)/CAST(2*count(DISTINCT doc_id)+1 AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS idf_u
  FROM tf, consts GROUP BY token, n_docs
),
contrib AS (
  SELECT tf.doc_id, tf.token,
         (CAST(idf_u AS DOUBLE)/1000000.0)
         * (CAST(44*tf*t_tokens AS DOUBLE)
            / CAST(20*tf*t_tokens + 6*t_tokens + 18*dl*n_docs AS DOUBLE)) AS c
  FROM tf JOIN idf USING (token) JOIN dl USING (doc_id), consts
)
SELECT doc_id,
       COALESCE(max(CASE WHEN token = 'filter' THEN c END), 0.0)
       + COALESCE(max(CASE WHEN token = 'merge' THEN c END), 0.0)
       + COALESCE(max(CASE WHEN token = 'scan' THEN c END), 0.0)
       + COALESCE(max(CASE WHEN token = 'window' THEN c END), 0.0) AS score,
       count(*) AS n_terms
FROM contrib
GROUP BY doc_id
"""


@declare("bm25_scores", oracle=_BM25_SCORES_SQL)
def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 score of every document against the fixed term set — the
    real-ranking upgrade of keyword_score_scan. Cross-engine float
    parity via per-term idf quantization (see operators/retrieval.py
    bm25_scores docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, BM25_TERMS)


@declare(
    "bm25_topk",
    oracle=_BM25_SCORES_SQL + "ORDER BY score DESC, doc_id ASC LIMIT 10",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 docs by BM25 — global top-k via TakeOrderedAndProject,
    stable doc_id tiebreak like the flagship."""
    docs = load_table(spark, sf_dir, "documents")
    scored = bm25_scores(docs, BM25_TERMS)
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


# --- Hybrid search: BM25 candidates → embedding-cosine rerank ---------------

from pulsar_project_spark.operators.similarity import cosine as _cosine
from pulsar_project_spark.operators.similarity import with_norm as _with_norm
from pulsar_project_spark.queries.similarity_ops import _dot_sql

_HYBRID_CANDS = 50
_HYBRID_K = 10
_HYBRID_QVEC = 0  # embedding of vec_id 0 is the query vector

_HYBRID_SQL = f"""
WITH bm AS (
  SELECT doc_id, score AS bm25 FROM ({_BM25_SCORES_SQL}) s
  ORDER BY score DESC, doc_id ASC LIMIT {_HYBRID_CANDS}
),
base AS (
  SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
  FROM embeddings
),
q AS (SELECT embedding AS qe, nrm AS qn FROM base WHERE vec_id = {_HYBRID_QVEC})
SELECT bm.doc_id, bm.bm25,
       CASE WHEN b.nrm * q.qn = 0 THEN 0.0
            ELSE {_dot_sql('b.embedding', 'q.qe')} / (b.nrm * q.qn)
       END AS cosine
FROM bm JOIN base b ON bm.doc_id = b.vec_id, q
WHERE bm.doc_id <> {_HYBRID_QVEC}
ORDER BY cosine DESC, bm.doc_id ASC
LIMIT {_HYBRID_K}
"""


@declare("hybrid_bm25_cosine_rerank", oracle=_HYBRID_SQL)
def q_hybrid_bm25_cosine_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval, the shape every production RAG stack runs:
    a cheap lexical pass (BM25 top-50) prunes the corpus, then the
    surviving candidates are re-ranked by embedding cosine against a
    query vector. Composes three engine pieces — bm25_scores, the
    vector-norm projection, and the sequential-fold dot product whose
    order matches DuckDB list_reduce bit-for-bit.

    Scale shape: stage 1 is the BM25 plan (token-filtered shuffles +
    global top-k); the 50-row candidate set then BROADCASTS against the
    embeddings table, so the rerank is one scan with no shuffle; the
    1-row query vector rides a crossJoin (allow-listed)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cands = (
        bm25_scores(docs, BM25_TERMS)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_HYBRID_CANDS)
        .select("doc_id", F.col("score").alias("bm25"))
    )
    base = _with_norm(emb)
    q = (
        base.filter(F.col("vec_id") == _HYBRID_QVEC)
        .select(F.col("embedding").alias("qe"), F.col("nrm").alias("qn"))
    )
    return (
        F.broadcast(cands)
        .join(base, F.col("doc_id") == F.col("vec_id"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("doc_id") != _HYBRID_QVEC)
        .select(
            "doc_id",
            "bm25",
            _cosine(F.col("embedding"), F.col("qe"), F.col("nrm"), F.col("qn")).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(_HYBRID_K)
    )


# --- MMR diversity rerank ----------------------------------------------------

from pulsar_project_spark.operators.mmr import mmr_rerank


@declare("mmr_diverse_topk")
def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware top-10: BM25 top-50 candidates reranked by
    Maximal Marginal Relevance (λ=0.7) against their embeddings —
    the third retrieval stage after simple_rag (keyword), bm25
    (lexical), and hybrid (vector rerank): this one optimizes the SET,
    not each item, so the 10 results aren't 10 near-duplicates.

    No oracle: MMR's greedy argmax is iterative (k sequential steps) —
    not expressible as a DuckDB one-shot; correctness is pinned by
    tests/test_mmr.py against an independent numpy replica, and the
    candidate stage (bm25_scores) IS oracle-checked.

    Scale shape: candidate generation is the distributed BM25 plan;
    the greedy loop runs once, on one executor, over one 50-row Arrow
    batch (applyInPandas on a constant key) — no driver collect."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cands = (
        bm25_scores(docs, BM25_TERMS)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_HYBRID_CANDS)
        .select("doc_id", F.col("score").alias("rel"))
    )
    with_vec = F.broadcast(cands).join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    return mmr_rerank(with_vec, k=10, lam=0.7)


_QDOT = (
    "list_reduce(list_transform(generate_series(1, 64), "
    "i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
)

_MMR_Q_SQL = f"""
WITH RECURSIVE
q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qv
  FROM embeddings WHERE embedding IS NOT NULL
),
qry AS (SELECT qv AS query_qv FROM q WHERE vec_id = 0),
cand AS (
  SELECT q.vec_id AS doc_id, q.qv,
         {_QDOT.format(a='q.qv', b='qry.query_qv')} AS rel_q
  FROM q, qry WHERE q.vec_id <> 0
  ORDER BY rel_q DESC, doc_id ASC LIMIT 20
),
sims AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         {_QDOT.format(a='a.qv', b='b.qv')} AS s
  FROM cand a, cand b WHERE a.doc_id <> b.doc_id
),
pick(rank, doc_id, rel_q, mmr_q, sel) AS (
  SELECT 1, doc_id, rel_q, 10 * rel_q, [doc_id]
  FROM (SELECT * FROM cand ORDER BY rel_q DESC, doc_id ASC LIMIT 1)
  UNION ALL
  SELECT p.rank + 1, nxt.doc_id, nxt.rel_q, nxt.score, list_append(p.sel, nxt.doc_id)
  FROM pick p, LATERAL (
    SELECT c.doc_id, c.rel_q,
           7 * c.rel_q - 3 * (SELECT max(s.s) FROM sims s
                              WHERE s.a_id = c.doc_id
                                AND list_contains(p.sel, s.b_id)) AS score
    FROM cand c WHERE NOT list_contains(p.sel, c.doc_id)
    ORDER BY score DESC, c.doc_id ASC LIMIT 1
  ) nxt
  WHERE p.rank < 5
)
SELECT rank, doc_id, rel_q, mmr_q FROM pick
"""


@declare("mmr_rerank_exact", oracle=_MMR_Q_SQL)
def q_mmr_rerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact MMR (λ=7/10, k=5) over the top-20 candidates of
    query vec_id=0 by quantized-dot relevance — the oracle-checkable
    twin of ``mmr_diverse_topk``. The float MMR's greedy argmax can't
    be hash-compared across engines (normalization order differs at
    the last bit); this variant runs the SAME greedy loop in int64
    (operators/mmr.py ``mmr_select_q``) and the oracle replays it as a
    DuckDB recursive CTE — so the driver verdict covers the MMR
    algorithm shape, not just its candidate stage.

    Scale shape: candidate generation is a 1-row broadcast dot + top-k
    (TakeOrderedAndProject); the greedy loop is one 20-row Arrow batch
    on one executor — identical to the production float path."""
    from pulsar_project_spark.operators.kmeans import _quantize
    from pulsar_project_spark.operators.mmr import mmr_rerank_q

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = _quantize(emb, "vec_id", "embedding")
    qry = q.filter(F.col("vec_id") == 0).select(F.col("qv").alias("query_qv"))
    rel = (
        q.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qry))
        .select(
            F.col("vec_id").alias("doc_id"),
            "qv",
            F.aggregate(
                F.zip_with(F.col("qv"), F.col("query_qv"), lambda x, y: x * y),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("rel_q"),
        )
    )
    cands = rel.orderBy(F.desc("rel_q"), F.asc("doc_id")).limit(20)
    return mmr_rerank_q(cands, k=5)
