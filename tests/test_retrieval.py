"""Retrieval operator tests, including the reference's own pinned case.

The reference's only test (tests/test_simple_rag.py) pins the semantic
quirks: substring-containment scoring, clean_string before matching,
stable-sort tiebreak. We assert the exact expected ranking here.
"""

from __future__ import annotations

from pulsar_project_spark.operators.retrieval import (
    extract_query_keywords,
    simple_rag,
)
from tests.conftest import SF_SMOKE, assert_matches_oracle


def test_reference_pinned_case(spark):
    # Reference fixture: records + query "wo d1", top 3
    # (tests/test_simple_rag.py:5-10). Expected: doc 3 ("word1, wo")
    # scores 2; docs 2/4/5 score 1 ("wo" in "word*"); stable order keeps
    # 2 then 4. NB "word" itself is a stopword in the QUERY tokenizer but
    # records are scored by substring, not tokens.
    records = ["abc", "bca", "word", "word1, wo", "word2", "word3"]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(records)], ["doc_id", "text"]
    )
    out = simple_rag(df, "wo d1", top_k=3).collect()
    assert [(r.doc_id, r.score) for r in out] == [(3, 2), (2, 1), (4, 1)]


def test_keywords_extraction():
    assert extract_query_keywords("wo d1") == ["wo", "d1"]
    # stopwords dropped, punctuation stripped, lowercased
    assert extract_query_keywords("The Word, and a Part!") == []
    assert extract_query_keywords("Fast vector scan, merge windo!") == [
        "fast", "vector", "scan", "merge", "windo",
    ]


def test_flagship_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    rows = out.collect()
    assert len(rows) == 5
    assert {c for c in out.columns} == {"doc_id", "score"}
    # scores sorted desc with doc_id tiebreak
    pairs = [(r.score, r.doc_id) for r in rows]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_flagship_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "simple_rag_topk")
    assert_matches_oracle(spark, duck, "keyword_score_scan")


def test_simple_rag_no_shuffle(spark):
    """Scale guard: the flagship plan must be scan → project → global
    top-k (TakeOrderedAndProject), with NO shuffle exchange."""
    from pulsar_project_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    explained = simple_rag(docs, "fast scan")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in explained
    assert "Exchange" not in explained
