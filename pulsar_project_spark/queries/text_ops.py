"""Declared queries: text scalar operators over documents (SURVEY.md §2.8).

Each is a pure projection — codegen'd, shuffle-free, trivially parallel at
any scale. The DuckDB oracle mirrors each expression; where DuckDB lacks a
builtin (initcap) the oracle reconstructs it from primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.functions.text import (
    clean_string,
    extract_between_markers,
    extract_title,
    keywords,
    sanitize_filename,
    truncate_display,
)
from pulsar_project_spark.functions.text import COMMON_ENGLISH_WORDS
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_table

_STOP_SQL = "[" + ",".join(f"'{w}'" for w in sorted(COMMON_ENGLISH_WORDS)) + "]"


@declare(
    "clean_string_projection",
    oracle=r"""
SELECT doc_id, regexp_replace(lower(text), '[^\w\s]', '', 'g') AS cleaned
FROM documents
""",
)
def q_clean_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_string (utils.py:249-252): lowercase + strip non-word/space."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", clean_string("text").alias("cleaned"))


@declare(
    "truncate_display_200",
    oracle="""
SELECT doc_id,
       CASE WHEN length(text) > 200 THEN substr(text, 1, 200) || '...'
            ELSE text END AS preview
FROM documents
""",
)
def q_truncate_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Response-summary truncation (task.py:505-509, cap=200 + '...')."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", truncate_display("text", 200).alias("preview"))


@declare(
    "token_count_destopped",
    oracle=rf"""
SELECT doc_id,
       len(list_filter(
             string_split_regex(regexp_replace(lower(text), '[^\w\s]', '', 'g'), '\s+'),
             t -> t <> '' AND NOT list_contains({_STOP_SQL}, t)
           )) AS n_keywords
FROM documents
""",
)
def q_token_count_destopped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_keywords pipeline (utils.py:291-316): clean → tokenize →
    stopword drop; multiplicity preserved (array_except would dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.size(keywords("text")).alias("n_keywords"))


@declare(
    "filename_sanitize",
    oracle=r"""
SELECT doc_id,
       substr(regexp_replace(regexp_replace(substr(text, 1, 45), '[^\w\s-]', '', 'g'),
                             '[-\s]+', '_', 'g'),
              1, 30) AS fname
FROM documents
""",
)
def q_filename_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename sanitization (task.py:236-239) applied to a text prefix:
    strip → collapse [-\\s]+ to '_' → 30-char stem cap."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", sanitize_filename(F.substring("text", 1, 45)).alias("fname")
    )


# DuckDB has no initcap; reconstruct Spark's semantics (capitalize first
# letter of each whitespace-separated word, lowercase the rest).
_DUCK_INITCAP = (
    "array_to_string(list_transform(string_split({expr}, ' '), "
    "w -> CASE WHEN length(w) > 0 THEN upper(substr(w,1,1)) || lower(substr(w,2)) "
    "ELSE w END), ' ')"
)
_TITLE_BASE = (
    "trim(regexp_replace(trim(CASE WHEN contains(text, '.') "
    "THEN string_split(text, '.')[1] ELSE substr(text, 1, 50) END), "
    "'(?i)^(create|build|develop|make|generate|write)\\s+', ''))"
)


@declare(
    "title_extraction",
    oracle=f"""
SELECT doc_id, substr({_DUCK_INITCAP.format(expr=_TITLE_BASE)}, 1, 60) AS title
FROM documents
""",
)
def q_title_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title extraction (task.py:350-370): first sentence else first 50
    chars, leading create/build/... verb dropped, title-cased, capped 60."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", extract_title("text").alias("title"))


_MARK_S, _MARK_E = "spark", "window"


@declare(
    "marker_extraction",
    oracle=f"""
WITH spans AS (
  SELECT doc_id,
         strpos(text, '{_MARK_S}') AS spos,
         substr(text, strpos(text, '{_MARK_S}')) AS aft
  FROM documents
  WHERE strpos(text, '{_MARK_S}') > 0
)
SELECT doc_id,
       CASE WHEN strpos(substr(aft, {len(_MARK_S) + 1}), '{_MARK_E}') > 0
            THEN substr(aft, 1, {len(_MARK_S)} + strpos(substr(aft, {len(_MARK_S) + 1}), '{_MARK_E}') - 1 + {len(_MARK_E)})
            ELSE array_to_string(string_split(aft, chr(10))[1:20], chr(10))
       END AS extracted
FROM spans
""",
)
def q_marker_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-substring extraction (task.py:263-285):
    text[find(start) : find(end, after start)+len(end)]; missing end marker
    → first-20-lines fallback; missing start marker → row excluded."""
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id",
        extract_between_markers("text", _MARK_S, _MARK_E).alias("extracted"),
    )
    return out.filter(F.col("extracted").isNotNull())
