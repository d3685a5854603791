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


# --- Deterministic train/val/test split -------------------------------------

_SPLIT_SQL = """
WITH assigned AS (
  SELECT doc_id, lang,
         CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
           WHEN 'e' THEN 'val' WHEN 'f' THEN 'test' ELSE 'train'
         END AS split
  FROM documents
)
SELECT split, lang, count(*) AS n_docs
FROM assigned
GROUP BY split, lang
"""


@declare("split_assignment_counts", oracle=_SPLIT_SQL)
def q_split_assignment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split: the first hex digit of md5(doc_id)
    buckets every document into train (14/16), val ('e'), test ('f') —
    stable under reshuffles, re-ingestion, and cluster size, which is
    the property a training pipeline needs (no RNG, no state). md5 hex
    is byte-identical across engines, so the assignment itself is the
    oracle-checked operator; the query reports per-(split, lang)
    counts. Scale shape: one projection + one grouped count."""
    docs = load_table(spark, sf_dir, "documents")
    first = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    assigned = docs.select(
        "lang",
        F.when(first == "e", "val").when(first == "f", "test")
        .otherwise("train").alias("split"),
    )
    return assigned.groupBy("split", "lang").agg(F.count("*").alias("n_docs"))


# --- Composite quality filter with audit trail ------------------------------
#
# Thresholds compare in integer cross-multiplication (no float ever
# enters): low_alpha = alpha/chars < 0.7, high_punct = punct/chars >
# 0.05, too_short/long on token counts.

_FILTER_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         len({_TOKS_SQL}) AS n_tokens
  FROM documents
)
SELECT doc_id,
       COALESCE(array_to_string(list_sort(list_filter([
         CASE WHEN n_tokens < 30 THEN 'too_short' END,
         CASE WHEN n_tokens > 200 THEN 'too_long' END,
         CASE WHEN n_alpha * 10 < n_chars * 7 THEN 'low_alpha' END,
         CASE WHEN n_punct * 20 > n_chars THEN 'high_punct' END
       ], x -> x IS NOT NULL)), ','), '') AS fail_reasons,
       (n_tokens >= 30 AND n_tokens <= 200
        AND n_alpha * 10 >= n_chars * 7
        AND n_punct * 20 <= n_chars) AS keep
FROM base
"""


@declare("quality_filter_audit", oracle=_FILTER_SQL)
def q_quality_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style keep/drop decision per document WITH the audit trail —
    which rules failed — as a sorted comma-joined string. Production
    filters need the reasons (for tuning thresholds and reporting drop
    rates), not just the boolean. All thresholds are integer
    cross-multiplications, so the only output types are string/bool.
    Scale shape: pure per-row projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    n_tokens = F.size(tokenize(clean_string("text")))
    base = docs.select(
        "doc_id",
        n_chars.alias("n_chars"), n_punct.alias("n_punct"),
        n_alpha.alias("n_alpha"), n_tokens.alias("n_tokens"),
    )
    rules = F.array(
        F.when(F.col("n_tokens") < 30, "too_short"),
        F.when(F.col("n_tokens") > 200, "too_long"),
        F.when(F.col("n_alpha") * 10 < F.col("n_chars") * 7, "low_alpha"),
        F.when(F.col("n_punct") * 20 > F.col("n_chars"), "high_punct"),
    )
    return base.select(
        "doc_id",
        F.concat_ws(",", F.array_sort(F.array_compact(rules))).alias("fail_reasons"),
        (
            (F.col("n_tokens") >= 30) & (F.col("n_tokens") <= 200)
            & (F.col("n_alpha") * 10 >= F.col("n_chars") * 7)
            & (F.col("n_punct") * 20 <= F.col("n_chars"))
        ).alias("keep"),
    )


# --- Token co-occurrence (association mining) --------------------------------
#
# Self-join of per-doc distinct tokens with itself (t1 < t2). The
# frequency guard (both tokens in >= 20 docs) is the mega-token cap:
# it bounds the per-doc pair fanout to frequent-vocab² instead of
# vocab², the same discipline as the LSH bucket caps.

_COOC_SQL = rf"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
),
freq AS (
  SELECT token FROM toks GROUP BY token HAVING count(*) >= 20
),
ft AS (
  SELECT t.doc_id, t.token FROM toks t JOIN freq USING (token)
)
SELECT a.token AS token_a, b.token AS token_b, count(*) AS n_docs
FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.token < b.token
GROUP BY a.token, b.token
ORDER BY n_docs DESC, token_a ASC, token_b ASC
LIMIT 20
"""


@declare("token_cooccurrence_top20", oracle=_COOC_SQL)
def q_token_cooccurrence_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-occurring token pairs by document count — the
    association-mining / co-occurrence-graph primitive (feeds PMI,
    word-graph, and related-term features downstream).

    Scale shape: NOT a self-join — per-doc pairs are generated
    map-side from the sorted frequent-token set (nested transform +
    flatten), so the only data-sized shuffles are the doc-frequency
    count, the per-doc collect_set, and the (token_a, token_b) pair
    count (all with map-side partials); a doc_id self-join would
    shuffle the exploded rows twice more and add a join. The frequency
    guard (≥20 docs) broadcasts and bounds per-doc fanout to frequent
    tokens only; the top-20 is TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokenize(clean_string("text")))).alias("token"),
    )
    freq = (
        toks.groupBy("token").agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 20)
        .select("token")
    )
    per_doc = (
        toks.join(F.broadcast(freq), "token")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("token")).alias("ts"))
    )
    pairs = per_doc.select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (x, i) -> "
                "transform(slice(ts, i + 2, size(ts)), "
                "y -> struct(x AS token_a, y AS token_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.token_a").alias("token_a"),
                      F.col("p.token_b").alias("token_b"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("token_a"), F.asc("token_b"))
        .limit(20)
    )
