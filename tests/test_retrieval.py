"""Retrieval operator tests, including the reference's own pinned case.

The reference's only test (tests/test_simple_rag.py) pins the semantic
quirks: substring-containment scoring, clean_string before matching,
stable-sort tiebreak. We assert the exact expected ranking here.
"""

from __future__ import annotations

from pulsar_project_spark.operators.retrieval import (
    bm25_scores,
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


def test_bm25_matches_textbook_formula(spark):
    """The folded integer rational + quantized idf must equal textbook
    BM25 (k1=1.2, b=0.75) to within the idf quantization error (~5e-7
    relative) — proves the algebra is BM25, not merely self-consistent
    across engines."""
    import math

    corpus = [
        (0, "merge scan merge filter the a window"),
        (1, "scan scan scan scan nothing else here"),
        (2, "window filter window filter window"),
        (3, "totally unrelated words only"),
        (4, "merge"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    terms = ["filter", "merge", "scan", "window"]
    out = {r.doc_id: (r.score, r.n_terms)
           for r in bm25_scores(docs, terms).collect()}

    from pulsar_project_spark.functions.text import COMMON_ENGLISH_WORDS
    tok = {d: [t for t in txt.lower().split() if t not in COMMON_ENGLISH_WORDS]
           for d, txt in corpus}
    N = len(corpus)
    T = sum(len(ts) for ts in tok.values())
    avgdl = T / N
    k1, b = 1.2, 0.75
    df = {t: sum(1 for ts in tok.values() if t in ts) for t in terms}
    expected = {}
    for d, ts in tok.items():
        s, matched = 0.0, 0
        for t in terms:
            tf = ts.count(t)
            if not tf:
                continue
            matched += 1
            idf = math.log((N - df[t] + 0.5) / (df[t] + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if matched:
            expected[d] = (s, matched)
    assert set(out) == set(expected)
    for d, (s, m) in expected.items():
        assert out[d][1] == m
        assert abs(out[d][0] - s) <= 2e-6 * max(1.0, abs(s)), (d, out[d][0], s)
