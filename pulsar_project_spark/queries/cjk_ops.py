"""Declared query: CJK tokenizer surface (SURVEY.md §7.3 —
``utils.py:291-316``).

The test corpus is ASCII-only even for lang='zh' rows (TESTDATA.md), so
the query builds deterministic mixed-script text in-plan: a CJK pre/
suffix (containing Chinese stopwords, to prove they drop) around each
document's ASCII prefix. Tokenization is Python-defined (the fixed
reference loop) → rows-only check; the per-case semantics are pinned in
tests/test_cjk_tokenizer.py against an independent replica of the loop.
Registers late on purpose: rows-only entries must not consume slots in
the driver's ~50-query oracle budget (see queries/__init__.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.functions.text import keywords_cjk
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_table

# 的/你/好 are reference Chinese stopwords (dropped); 世/界/模/型 are not.
_PREFIX = "的你好世界 "
_SUFFIX = " 模型的"


@declare("cjk_token_counts")
def q_cjk_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-script keyword extraction: per-doc token list from the
    (fixed) reference CJK loop — single-char CJK tokens minus Chinese
    stopwords, ASCII alnum runs minus English stopwords, punctuation as
    its own token. Arrow-batched UDF, one narrow projection, no shuffle;
    at 100 TB this is a map-only pass like the other text scorers."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = F.concat(F.lit(_PREFIX), F.substring("text", 1, 60), F.lit(_SUFFIX))
    toks = docs.select(
        "doc_id", keywords_cjk(mixed).alias("tokens")
    )
    is_cjk = lambda t: t.rlike("^[一-鿿]$")  # noqa: E731
    return toks.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.filter("tokens", is_cjk)).alias("n_cjk_tokens"),
        F.array_join(F.slice("tokens", 1, 8), " ").alias("head_tokens"),
    )
