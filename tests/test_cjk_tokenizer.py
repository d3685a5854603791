"""CJK tokenizer pinned against an independent replica of the reference
loop (utils.py:291-316) with the utils.py:300 defect fixed
(``len(char.strip)`` → ``len(char.strip()) > 0``), per SURVEY.md §7.3."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_project_spark.functions.text import (
    COMMON_CHINESE_WORDS,
    COMMON_ENGLISH_WORDS,
    _keywords_cjk_py,
    keywords_cjk,
)


def _ref_loop(text: str) -> list[str]:
    """The reference's char loop, transcribed from its documented
    behavior with the broken line fixed."""
    words = []
    temp = ""
    for ch in text:
        if "一" <= ch <= "鿿":
            if temp:
                if temp.lower() not in COMMON_ENGLISH_WORDS:
                    words.append(temp)
                temp = ""
            if len(ch.strip()) > 0 and ch not in COMMON_CHINESE_WORDS:
                words.append(ch)
        else:
            if ch.isalnum():
                temp += ch
            else:
                if temp:
                    if temp.lower() not in COMMON_ENGLISH_WORDS:
                        words.append(temp)
                    temp = ""
                if len(ch.strip()) > 0:
                    words.append(ch)
    temp = temp.strip()
    if len(temp) > 0:
        if temp.lower() not in COMMON_ENGLISH_WORDS:
            words.append(temp)
    return words


CASES = [
    "Hello the 世界 of 模型s!",
    "的你好世界 plain ascii text",
    "under_score and-dash 3.14",
    "纯中文的句子没有空格",
    "",
    "   ",
    "mixed 中a文b 12三45",
]


def test_replica_matches_reference_loop():
    for text in CASES:
        assert _keywords_cjk_py(text) == _ref_loop(text), text


def test_pinned_example():
    # SURVEY §7.3 intent: CJK singles minus zh-stopwords, alnum runs
    # minus en-stopwords, punctuation kept as its own token
    assert _keywords_cjk_py("Hello the 世界 of 模型s!") == [
        "Hello", "世", "界", "模", "型", "s", "!",
    ]


def test_udf_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], ["i", "t"])
    got = {r.i: r.toks for r in df.select("i", keywords_cjk("t").alias("toks")).collect()}
    for i, text in enumerate(CASES):
        assert got[i] == _keywords_cjk_py(text), text


def test_declared_query_runs(spark):
    from tests.conftest import SF_SMOKE

    import __spark_entry__ as e

    df = e.queries()["cjk_token_counts"](spark, SF_SMOKE)
    rows = df.orderBy("doc_id").limit(5).collect()
    assert rows and all(r.n_cjk_tokens >= 2 for r in rows)  # 世界/模型 survive
    assert all("的" not in r.head_tokens.split(" ") for r in rows)
