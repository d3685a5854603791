"""Declared queries: corpus-preparation ops a training-data pipeline
needs beyond the reference's surface — eval-set decontamination and
vocabulary construction (SURVEY.md §2.11 extension family; same corpus
surface as the reference's keyword pipeline, utils.py:246-316).

Both are count-shaped (BIGINT outputs only), so the DuckDB oracle is
hash-exact with no float-parity work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.functions.text import clean_string, tokenize
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_table

# Raw-token split, no stopword drop — decontamination and vocab stats
# operate on the full token stream (same split the oracle uses).
_TOKS_SQL = (
    r"list_filter(string_split_regex(regexp_replace(lower(text), '[^\w\s]', '', 'g'), "
    r"'\s+'), t -> t <> '')"
)

# Deterministic eval-set rule: every 50th doc is "benchmark" data. In a
# real pipeline this side is the fixed benchmark suite — small by
# construction, hence broadcast.
_EVAL_MOD = 50

_CONTAM_SQL = rf"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(tk) - 1),
                                 i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS gram
    FROM toks WHERE len(tk) >= 3
  )
)
SELECT t.doc_id AS train_doc_id,
       e.doc_id AS eval_doc_id,
       count(*) AS shared_trigrams
FROM (SELECT * FROM grams WHERE doc_id % {_EVAL_MOD} <> 0) t
JOIN (SELECT * FROM grams WHERE doc_id % {_EVAL_MOD} = 0) e USING (gram)
GROUP BY t.doc_id, e.doc_id
"""


@declare("contamination_ngram_overlap", oracle=_CONTAM_SQL)
def q_contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check: for every (train doc, eval doc)
    pair sharing at least one word trigram, the number of distinct
    shared trigrams. The standard pre-training decontamination shape
    (n-gram overlap against held-out benchmarks).

    Scale shape: trigram generation is a map-side explode; grams
    deduplicate per doc before the join so repeated phrases don't
    inflate traffic; the eval side is a small fixed benchmark set →
    broadcast hash join, train side streams. The pair aggregation
    shuffles only matching pairs. At 100 TB the only unbounded shuffle
    is the final pair group-by, whose size is bounded by actual
    contamination, not corpus size. In production the join key would be
    xxhash64(gram) to cut shuffle width; the literal gram keeps the
    oracle comparison byte-transparent."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(clean_string("text")).alias("tk"))
    grams = (
        toks.filter(F.size("tk") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tk) - 3),"
                    " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    train = grams.filter(F.col("doc_id") % _EVAL_MOD != 0)
    ev = grams.filter(F.col("doc_id") % _EVAL_MOD == 0)
    return (
        train.join(F.broadcast(ev.withColumnRenamed("doc_id", "eval_doc_id")), "gram")
        .withColumnRenamed("doc_id", "train_doc_id")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("shared_trigrams"))
    )


_VOCAB_SQL = rf"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
),
stats AS (
  SELECT token,
         count(DISTINCT doc_id) AS doc_freq,
         count(*) AS term_freq
  FROM tok GROUP BY token
)
SELECT token, doc_freq, term_freq
FROM stats, (SELECT count(*) AS n_docs FROM documents) c
WHERE doc_freq >= 5 AND doc_freq * 100 <= n_docs * 77
"""


@declare("vocab_min_max_df", oracle=_VOCAB_SQL)
def q_vocab_min_max_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction with document-frequency pruning: keep
    tokens appearing in >= 5 docs and <= 77% of the corpus (min_df /
    max_df, the CountVectorizer convention; 77% chosen to split this
    corpus's dense head). Thresholds compared in integer math
    (df*100 <= N*77) so no float enters the plan.

    Scale shape: one explode + one token-keyed aggregate with map-side
    partial counts; the corpus size N is a 1-row broadcast riding a
    crossJoin (allow-listed 1-row BNLJ, same pattern as bm25)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokenize(clean_string("text"))).alias("token"))
    stats = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count("*").alias("term_freq"),
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        stats.crossJoin(F.broadcast(n))
        .filter((F.col("doc_freq") >= 5) & (F.col("doc_freq") * 100 <= F.col("n_docs") * 77))
        .select("token", "doc_freq", "term_freq")
    )
