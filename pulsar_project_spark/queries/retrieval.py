"""Declared queries: keyword-overlap retrieval (SURVEY.md §2.5).

Flagship ``simple_rag`` (reference utils.py:326-330) plus the scored
relation it derives from. The query string is a constant so the DuckDB
oracle can inline the same keyword literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
