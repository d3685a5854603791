"""Declared queries: aggregations (SURVEY.md §2.4) + set ops (§2.6).

All are hash aggregations with map-side partial aggregation — at 100 TB
each is one shuffle on the group key, with AQE coalescing the reduce
side. Measure sums go through DECIMAL (exact, associative) so Spark's
partial-agg summation order can't diverge from the oracle's single-node
order in the low float bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.functions.text import COMMON_ENGLISH_WORDS, keywords
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table

_STOP_SQL = "[" + ",".join(f"'{w}'" for w in sorted(COMMON_ENGLISH_WORDS)) + "]"


@declare(
    "group_count_by_type",
    oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
)
def q_group_count_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-type group-count (task.py:87-100): count per type."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(F.count("*").alias("n"))


@declare(
    "per_user_activity",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       max(epoch_us(ts)) AS last_ts_us
FROM events
GROUP BY user_id
""",
)
def q_per_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """files-count sum per task (app.py:165,241,268) + last-updated per
    task (app.py:269) in one grouped pass."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.max("ts_us").alias("last_ts_us"),
    )


@declare(
    "term_frequency_top20",
    oracle=rf"""
SELECT token, count(*) AS freq
FROM (
  SELECT unnest(list_filter(
           string_split_regex(regexp_replace(lower(text), '[^\w\s]', '', 'g'), '\s+'),
           t -> t <> '' AND NOT list_contains({_STOP_SQL}, t))) AS token
  FROM documents
)
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 20
""",
)
def q_term_frequency_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term frequencies over the de-stopworded corpus — the batch form of
    the topic frequency counter (memory.py:319-323) and the §2.11 text-
    analysis extension. explode → partial-agg count → global top-k."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(keywords("text")).alias("token"))
    return (
        tokens.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


@declare(
    "lang_corpus_stats",
    oracle="""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM documents
GROUP BY lang
""",
)
def q_lang_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per language — records-count family (app.py:164,337).
    avg computed as exact-int sum / count so both engines produce the
    identical double."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@declare(
    "distinct_tokens_except_stopwords",
    oracle=rf"""
SELECT DISTINCT token
FROM (
  SELECT unnest(string_split_regex(regexp_replace(lower(text), '[^\w\s]', '', 'g'), '\s+')) AS token
  FROM documents
)
WHERE token <> '' AND NOT list_contains({_STOP_SQL}, token)
""",
)
def q_distinct_tokens_except_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword anti-join as an explicit set op (utils.py:297,307): the
    distinct vocabulary minus the stopword set — explode + left-anti
    against the broadcast stopword relation."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(
            F.filter(F.split(F.regexp_replace(F.lower("text"), r"[^\w\s]", ""), r"\s+"),
                     lambda t: t != F.lit(""))
        ).alias("token")
    ).distinct()
    stop = spark.createDataFrame([(w,) for w in sorted(COMMON_ENGLISH_WORDS)], ["token"])
    return tokens.join(F.broadcast(stop), "token", "left_anti")
