"""Declared queries: text-analysis family (SURVEY.md §2.11 — langid,
quality scoring, token budgeting over ``documents``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.functions.text import COMMON_ENGLISH_WORDS
from pulsar_project_spark.operators.text_analysis import (
    BPE_PATTERN,
    FEATURE_DIM,
    LANG_ORDER,
    LANG_PROFILES,
    bpe_token_counts,
    feature_hash_embedding,
    language_id,
    quality_scores,
)
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_table

_TOKS = (
    r"list_filter(string_split_regex(regexp_replace(lower(text), '[^\w\s]', '', 'g'), "
    r"'\s+'), t -> t <> '')"
)


def _lits(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _hits(profile: str) -> str:
    return f"len(list_filter({profile}, m -> list_contains(tk, m)))"


def _langid_sql() -> str:
    scores = ", ".join(
        f"{_hits(_lits(LANG_PROFILES[lang]))} AS s_{lang}" for lang in LANG_ORDER
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_ORDER) + ")"
    arms = " ".join(f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in LANG_ORDER)
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
scored AS (SELECT doc_id, {scores} FROM toks)
SELECT doc_id, {', '.join(f's_{lang}' for lang in LANG_ORDER)},
       CASE WHEN {best} <= 0 THEN 'und' {arms} END AS pred_lang
FROM scored
"""


@declare("langid_profile_scores", oracle=_langid_sql())
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: function-word profile hit counts + fixed-
    preference argmax. One codegen projection over the corpus."""
    return language_id(load_table(spark, sf_dir, "documents"))


_STOPS = _lits(sorted(COMMON_ENGLISH_WORDS))

_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         {_TOKS} AS tk
  FROM documents
), counted AS (
  SELECT doc_id, n_chars, n_punct, n_alpha,
         len(tk) AS n_tokens,
         len(list_filter(tk, x -> list_contains({_STOPS}, x))) AS n_stop,
         list_reduce(list_prepend(0, list_transform(tk, x -> length(x))),
                     (a, b) -> a + b) AS tok_chars
  FROM base
)
SELECT doc_id, n_chars, n_tokens, n_stop,
       CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stop_ratio,
       CASE WHEN n_chars > 0 THEN n_alpha / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS alpha_ratio,
       CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS punct_ratio,
       CASE WHEN n_tokens > 0 THEN tok_chars / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS mean_token_len,
       ((0.4 * (CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END))
        + (0.3 * (CASE WHEN n_chars > 0 THEN n_alpha / CAST(n_chars AS DOUBLE) ELSE 0.0 END))
        + (0.2 * (CASE WHEN n_tokens >= 20 THEN 1.0 ELSE CAST(n_tokens AS DOUBLE) / 20.0 END)))
       - (0.1 * (CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END)) AS quality_score
FROM counted
"""


@declare("quality_scores", oracle=_QUALITY_SQL)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality signals + fixed-weight composite. All
    per-row integer counts with one final division — bit-exact floats."""
    return quality_scores(load_table(spark, sf_dir, "documents"))


@declare(
    "feature_hash_embeddings",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), h AS (
  SELECT doc_id, (('0x' || substr(md5(tok), 1, 8))::BIGINT) AS h FROM toks
)
SELECT doc_id, h % {FEATURE_DIM} AS dim_id,
       CAST(sum(CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS weight
FROM h GROUP BY doc_id, dim_id
HAVING CAST(sum(CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) <> 0
""",
)
def q_feature_hash_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorizer: sparse (doc_id, dim_id, weight) with
    md5-portable buckets/signs and integer weights — the deterministic
    text→embedding generation pass."""
    return feature_hash_embedding(load_table(spark, sf_dir, "documents"))


@declare(
    "bpe_token_counts",
    oracle=f"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}'))
         - len(regexp_extract_all(text, '\\s+')) AS n_bpe_tokens
FROM documents
""",
)
def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token budgeting: whitespace tokens vs BPE-ish pretokenizer
    pieces (leftmost-first alternation — identical in Java regex and
    RE2, verified by the oracle)."""
    return bpe_token_counts(load_table(spark, sf_dir, "documents"))


def _langid_pred_sql() -> str:
    scores = ", ".join(
        f"{_hits(_lits(LANG_PROFILES[lang]))} AS s_{lang}" for lang in LANG_ORDER
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_ORDER) + ")"
    arms = " ".join(f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in LANG_ORDER)
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
scored AS (SELECT doc_id, {scores} FROM toks),
pred AS (
  SELECT doc_id, CASE WHEN {best} <= 0 THEN 'und' {arms} END AS pred_lang
  FROM scored
)
SELECT d.lang AS true_lang, p.pred_lang, count(*) AS n
FROM pred p JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


@declare("langid_confusion_matrix", oracle=_langid_pred_sql())
def q_langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation matrix: labeled lang × predicted lang
    counts for the language-ID heuristic — the metrics artifact every
    model-quality loop materializes (here it also documents that the
    ASCII word-salad corpus predicts mostly 'en'/'und', which is a
    property of the data, not the operator).

    Scale shape: the scoring projection is map-side; one join back to
    the label column on doc_id and a 25-cell aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    pred = language_id(docs).select("doc_id", "pred_lang")
    return (
        pred.join(docs.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


@declare("bpe_learned_merges")
def q_bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE training (Sennrich merges) on the corpus — rows-only by
    design: the merge table is the fixpoint of an 8-round iterative
    argmax, not a SQL expression (same class as kmeans/IVF). The
    independent pure-Python replica in ``tests/test_bpe_merges.py``
    pins every (rank, left, right, merged) row exactly; the corpus scan
    happens once, and each round runs on the vocab table only
    (operators/text_analysis.py:learn_bpe_merges)."""
    from pulsar_project_spark.operators.text_analysis import learn_bpe_merges

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return learn_bpe_merges(docs, n_merges=8)


@declare("bpe_encode_token_census")
def q_bpe_encode_token_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→APPLY BPE end to end: the 8 learned merges encode every
    word via one nested higher-order fold (outer: ranked merges;
    inner: the same greedy left-to-right pass as training), and the
    per-doc census reports words, BPE tokens, and pre-merge symbol
    count (chars + one </w> per word). Rows-only by design (depends on
    the iteratively learned table); the pure-Python replica in
    ``tests/test_bpe_merges.py`` pins the full train→encode→census
    chain exactly."""
    from pulsar_project_spark.operators.text_analysis import bpe_encode_census

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return bpe_encode_census(docs, n_merges=8)


_FIXED_BPE_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest({_TOKS}) AS w FROM documents
), enc AS (
  SELECT doc_id, length(w) AS n_chars,
         length(
           replace(replace(replace(replace(replace(w,
             'th', chr(1)),
             chr(1) || 'e', chr(2)),
             'er', chr(3)),
             'an', chr(4)),
             'in', chr(5))
         ) + 1 AS n_tokens
  FROM words
)
SELECT doc_id, count(*) AS n_words,
       CAST(sum(n_tokens) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(n_chars) + count(*) AS BIGINT) AS n_symbols_pre
FROM enc GROUP BY doc_id
"""


@declare("bpe_fixed_merge_encode_census", oracle=_FIXED_BPE_SQL)
def q_bpe_fixed_merge_encode_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic oracle twin for the BPE ENCODE path (the
    ``ivf_cell_assignment`` certification pattern): the exact nested
    higher-order merge fold of ``bpe_encode_token_census``, but with
    the merge table pinned to five constant ranked merges — including
    one CASCADE (rank 2 consumes rank 1's output), so symbol-level
    semantics are what's tested. The oracle replays each greedy
    left-to-right merge pass as a SQL ``replace()`` onto a fresh
    control character (both are single-pass non-overlapping scans, so
    they are the same function), then counts ``length + 1`` for the
    never-merged ``</w>`` marker. A hash match certifies the fold the
    learned pair shares; the learned pair itself stays pinned by the
    pure-Python replica test."""
    from pulsar_project_spark.operators.text_analysis import (
        bpe_fixed_encode_census,
    )
    return bpe_fixed_encode_census(load_table(spark, sf_dir, "documents"))


_BIGRAM_SQL = """
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND length(text) >= 2 AND doc_id IS NOT NULL
), bi AS (
  SELECT doc_id, substr(text, i, 2) AS bg
  FROM d, LATERAL (
    SELECT unnest(generate_series(1, length(text) - 1)) AS i
  ) i
), tab AS (
  SELECT bg, count(*) AS cnt FROM bi GROUP BY 1
)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(t.cnt) AS BIGINT) AS familiarity_sum
FROM bi JOIN tab t USING (bg)
GROUP BY doc_id
"""


@declare("char_bigram_familiarity", oracle=_BIGRAM_SQL)
def q_char_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained character-bigram familiarity per document — the
    integer-exact stand-in for LM perplexity scoring (rare-bigram docs
    = mojibake / binary spill / wrong-language shards). One explode
    feeds both the corpus bigram table (tiny domain, map-side combine)
    and the scoring join (table broadcast back); the oracle replays
    the identical two-pass plan in SQL."""
    from pulsar_project_spark.operators.text_analysis import (
        char_bigram_familiarity,
    )
    return char_bigram_familiarity(load_table(spark, sf_dir, "documents"))
