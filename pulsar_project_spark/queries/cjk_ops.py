"""Declared query: CJK tokenizer surface (SURVEY.md §7.3 —
``utils.py:291-316``).

The test corpus is ASCII-only even for lang='zh' rows (TESTDATA.md), so
the query builds deterministic mixed-script text in-plan: a CJK pre/
suffix (containing Chinese stopwords, to prove they drop) around each
document's ASCII prefix.

ORACLE-BACKED since round 11 (VERDICT r10 order #7): the fixed
reference loop is one regex alternation —
``([一-鿿])|([^\\W_一-鿿]+)|(\\S)`` — and DuckDB's RE2 agrees with
Python's ``re`` on this query's whole input domain (ASCII document
text + the fixed CJK affixes): the only divergence surface is
``\\w``'s unicode coverage (Python: all unicode letters; RE2: ASCII),
which would need non-CJK non-ASCII letters (é, kana) to show — absent
here by construction, and pinned equal on adversarial mixed-script
cases by tests/test_cjk_tokenizer.py. So the per-codepoint emission,
both stopword drops, and the punctuation-as-token rule all carry a
driver hash certificate now, not just a replica pin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.functions.text import (
    COMMON_CHINESE_WORDS,
    COMMON_ENGLISH_WORDS,
    keywords_cjk,
)
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_table

# 的/你/好 are reference Chinese stopwords (dropped); 世/界/模/型 are not.
_PREFIX = "的你好世界 "
_SUFFIX = " 模型的"

# The reference loop's exact alternation (functions/text.py
# _keywords_cjk_py) — group 1: one CJK codepoint; group 2: a run of
# word chars excluding underscore and the CJK block; group 3: any
# other non-space char as its own token.
_CJK_RE = r"([一-鿿])|([^\W_一-鿿]+)|(\S)"

_ZH_LIST = ", ".join(f"'{w}'" for w in sorted(COMMON_CHINESE_WORDS))
_EN_LIST = ", ".join(f"'{w}'" for w in sorted(COMMON_ENGLISH_WORDS))

_CJK_SQL = rf"""
WITH mixed AS (
  SELECT doc_id, '{_PREFIX}' || substr(text, 1, 60) || '{_SUFFIX}' AS mtext
  FROM documents WHERE text IS NOT NULL
), tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(mtext, '{_CJK_RE}')) AS t,
         generate_subscripts(regexp_extract_all(mtext, '{_CJK_RE}'), 1)
           AS pos
  FROM mixed
), kept AS (
  SELECT doc_id, pos, t,
         regexp_full_match(t, '[一-鿿]') AS is_cjk
  FROM tok
  WHERE CASE
          WHEN regexp_full_match(t, '[一-鿿]')
            THEN t NOT IN ({_ZH_LIST})
          WHEN regexp_full_match(t, '[^\W_一-鿿]+')
            THEN lower(t) NOT IN ({_EN_LIST})
          ELSE TRUE
        END
), renum AS (
  SELECT doc_id, t, is_cjk,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM kept
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN is_cjk THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cjk_tokens,
       COALESCE(string_agg(t, ' ' ORDER BY rn)
                  FILTER (WHERE rn <= 8), '') AS head_tokens
FROM renum GROUP BY doc_id
"""


@declare("cjk_token_counts", oracle=_CJK_SQL)
def q_cjk_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-script keyword extraction: per-doc token list from the
    (fixed) reference CJK loop — single-char CJK tokens minus Chinese
    stopwords, ASCII alnum runs minus English stopwords, punctuation as
    its own token. Arrow-batched UDF, one narrow projection, no shuffle;
    at 100 TB this is a map-only pass like the other text scorers. The
    DuckDB oracle replays the loop as RE2 ``regexp_extract_all`` over
    the same alternation (module docstring explains why the engines
    provably agree on this domain)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    mixed = F.concat(F.lit(_PREFIX), F.substring("text", 1, 60), F.lit(_SUFFIX))
    toks = docs.select(
        "doc_id", keywords_cjk(mixed).alias("tokens")
    )
    is_cjk = lambda t: t.rlike("^[一-鿿]$")  # noqa: E731
    return toks.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.size(F.filter("tokens", is_cjk)).cast("bigint")
        .alias("n_cjk_tokens"),
        F.array_join(F.slice("tokens", 1, 8), " ").alias("head_tokens"),
    )
