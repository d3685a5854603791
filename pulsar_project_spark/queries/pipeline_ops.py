"""Declared queries: training-data pipeline extensions round 2 —
repetition filtering (Gopher-style), deterministic sequence packing,
PII-shaped masking, and inter-event cadence stats.

These extend the SURVEY.md §2.11 family (dedup / quality / text
analysis) with the remaining ops a pre-training corpus pipeline runs
between "filtered documents" and "token batches". All outputs are
integer/string/bool or exact-rational doubles, so every oracle is
hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_project_spark.functions.text import clean_string, tokenize
from pulsar_project_spark.queries.corpus_ops import _TOKS_SQL
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table

# --- Gopher-style repetition filter -----------------------------------------
#
# A document whose single most frequent word bigram covers >20% of all
# bigrams is repetitive boilerplate (Gopher's "top n-gram fraction"
# rule). 20% compares as top_count * 5 > n_bigrams — integer
# cross-multiplication, no float.

_REP_SQL = rf"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
),
bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS bigram
  FROM toks WHERE len(tk) >= 2
),
counts AS (
  SELECT doc_id, bigram, count(*) AS cnt
  FROM bigrams GROUP BY doc_id, bigram
)
SELECT doc_id,
       CAST(max(cnt) AS BIGINT) AS top_count,
       CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       (max(cnt) * 5 > sum(cnt)) AS repetitive
FROM counts GROUP BY doc_id
"""


@declare("repetition_top_bigram", oracle=_REP_SQL)
def q_repetition_top_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-bigram concentration (Gopher repetition rule):
    the most frequent word bigram's count, the total bigram count, and
    a repetitive flag at the 20% threshold.

    Scale shape: bigram construction is a map-side zip of two shifted
    slices (no UDF); the explode multiplies rows by ~doc length but the
    (doc_id, bigram) count immediately collapses them with map-side
    partials, and the per-doc rollup shuffles on doc_id only. No
    all-pairs anything; memory per task is one doc's bigram set."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(clean_string("text")).alias("tk"))
    bigrams = (
        toks.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.expr("slice(tk, 1, size(tk) - 1)"),
                    F.expr("slice(tk, 2, size(tk) - 1)"),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("bigram"),
        )
    )
    counts = bigrams.groupBy("doc_id", "bigram").agg(F.count("*").alias("cnt"))
    return counts.groupBy("doc_id").agg(
        F.max("cnt").alias("top_count"),
        F.sum("cnt").alias("n_bigrams"),
        (F.max("cnt") * 5 > F.sum("cnt")).alias("repetitive"),
    )


# --- Deterministic sequence packing ------------------------------------------
#
# Contiguous greedy packing: within each lang, documents in doc_id
# order are appended to the current bin; a document whose tokens start
# at cumulative offset c lands in bin c DIV budget. Deterministic (no
# RNG, no state), so re-runs and the oracle agree exactly.

_PACK_BUDGET = 2048

_PACK_SQL = f"""
WITH sized AS (
  SELECT doc_id, lang, len({_TOKS_SQL}) AS n_tokens FROM documents
),
placed AS (
  SELECT lang, n_tokens,
         COALESCE(CAST(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS BIGINT), 0) // {_PACK_BUDGET} AS bin
  FROM sized
)
SELECT lang, bin,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM placed GROUP BY lang, bin
"""


@declare("sequence_packing_bins", oracle=_PACK_SQL)
def q_sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget training bins (budget
    2048): each doc's bin is its cumulative token offset DIV budget,
    per lang in doc_id order. Returns per-(lang, bin) doc and token
    counts — the batch manifest a data loader would consume.

    Scale shape: one running-sum window per lang partition, then a
    grouped rollup. A single lang is processed sequentially within its
    window partition; at 100 TB you'd sub-partition the window key into
    (lang, doc_id range) buckets sized to a worker — offsets stay
    deterministic because doc_id ranges are disjoint and bucket token
    totals are known after one aggregate pass. The 2048 DIV is integer
    math, so no float drift moves a doc across a bin boundary."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "lang", F.size(tokenize(clean_string("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = sized.select(
        "lang",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint").alias("cum_before"),
    ).select(
        "lang",
        "n_tokens",
        F.expr(f"cum_before DIV {_PACK_BUDGET}").alias("bin"),
    )
    return placed.groupBy("lang", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


# --- PII-shaped masking -------------------------------------------------------
#
# The test corpus carries no real PII; digit runs in the event props
# JSON stand in for the account-number / phone-number shape. The
# operator is the real thing: regex run masking plus an audit count,
# pure per-row projection.

_REDACT_SQL = r"""
SELECT event_id,
       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS masked,
       length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS n_digits,
       length(regexp_replace(props, '[0-9]+', '#', 'g'))
         - length(regexp_replace(props, '[0-9]+', '', 'g')) AS n_runs
FROM events
"""


@declare("props_digit_redaction", oracle=_REDACT_SQL)
def q_props_digit_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mask every digit run in the event props payload with <NUM> and
    report the digit and run counts — the PII-redaction shape (mask +
    audit trail) over a corpus with stand-in digits.

    Scale shape: stateless per-row regex projection, whole-stage
    codegen, no shuffle; at 100 TB this is scan-bound and trivially
    parallel."""
    ev = load_events(spark, sf_dir)
    digits_stripped = F.regexp_replace("props", "[0-9]", "")
    runs_marked = F.regexp_replace("props", "[0-9]+", "#")
    runs_stripped = F.regexp_replace("props", "[0-9]+", "")
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("masked"),
        (F.length("props") - F.length(digits_stripped)).alias("n_digits"),
        (F.length(runs_marked) - F.length(runs_stripped)).alias("n_runs"),
    )


# --- Inter-event cadence ------------------------------------------------------

_GAP_SQL = """
WITH seq AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
)
SELECT user_id,
       count(gap_us) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(CAST(sum(gap_us) AS BIGINT) AS DOUBLE) / count(gap_us) AS mean_gap_us
FROM seq
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@declare("user_event_gap_stats", oracle=_GAP_SQL)
def q_user_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event cadence: min/max/mean gap between
    consecutive events in exact microseconds (lag over the (ts,
    event_id) order). The mean is the one float — a single
    BIGINT-sum / count division, identical IEEE in both engines.

    Scale shape: one window shuffle on user_id, then a grouped
    aggregate on the same key (no second shuffle under AQE)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return seq.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        (F.sum("gap_us").cast("double") / F.count("gap_us")).alias("mean_gap_us"),
    )


# --- Session windows (batch twin of the streaming op) -------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes

_SESSION_SQL = f"""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                 >= {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
labeled AS (
  SELECT user_id, ts_us,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM seq
)
SELECT user_id,
       min(ts_us) AS session_start_us,
       max(ts_us) + {_SESSION_GAP_US} AS session_end_us,
       count(*) AS n_events
FROM labeled GROUP BY user_id, sid
"""


@declare("user_session_stats", oracle=_SESSION_SQL)
def q_user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user via Spark's native ``session_window``
    (30-minute gap) in BATCH mode: one row per merged session with
    start, end (last event + gap — the session_window contract), and
    event count. The oracle reproduces the merge rule relationally
    (lag → new-session flag → running sum → group), proving the native
    operator's semantics against first principles.

    This is the batch twin of ``streaming_session_windows``; the
    streaming test asserts the streaming emission is a subset of these
    rows.

    Scale shape: session_window is one shuffle on user_id then a
    per-partition sort-merge of adjacent windows — same cost class as
    the window formulation but fused into a single aggregate."""
    ev = load_events(spark, sf_dir)
    evt = ev.withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    return (
        evt.groupBy(
            "user_id", F.session_window("event_time", "30 minutes").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


# --- Overlapping document chunking (RAG ingestion) ---------------------------
#
# Fixed-size token chunks with overlap: window 80, stride 60 (20-token
# overlap). Chunk starts at offsets 0, 60, 120, … while offset < n;
# every doc gets >=1 chunk (short docs yield their full text).

_CHUNK_W = 80
_CHUNK_STRIDE = 60

_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(range(0, greatest(len(tk), 1), {_CHUNK_STRIDE})) AS start_tok,
         tk
  FROM toks
)
SELECT doc_id,
       CAST(start_tok // {_CHUNK_STRIDE} AS BIGINT) AS chunk_seq,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(least(len(tk) - start_tok, {_CHUNK_W}) AS BIGINT) AS n_tokens,
       coalesce(array_to_string(list_slice(tk, start_tok + 1, start_tok + {_CHUNK_W}), ' '),
                '') AS chunk_text
FROM chunks
"""
# ^ coalesce: DuckDB's array_to_string over an empty slice is NULL, but
# the chunker contract is "every doc gets >=1 chunk carrying its full
# text" — for a zero-token doc that text is '' (what concat_ws yields on
# the Spark side). Found by the corpus fuzz gate on text=''.


@declare("doc_chunks_overlapping", oracle=_CHUNK_SQL)
def q_doc_chunks_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-ingestion chunker: split every document into 80-token chunks
    on a 60-token stride (20-token overlap), emitting chunk sequence,
    start offset, token count, and the chunk text. The chunk table is
    what an embedding stage consumes; overlap preserves cross-boundary
    context.

    Scale shape: per-row sequence generation + explode — map-side only,
    no shuffle; output rows ≈ docs × (len/stride). The slice/join is
    array math on the already-tokenized column, one pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(clean_string("text")).alias("tk"))
    chunks = toks.select(
        "doc_id",
        "tk",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("tk") - 1, F.lit(0)),
                F.lit(_CHUNK_STRIDE),
            )
        ).alias("start_tok"),
    )
    return chunks.select(
        "doc_id",
        (F.col("start_tok") / _CHUNK_STRIDE).cast("bigint").alias("chunk_seq"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.least(F.size("tk") - F.col("start_tok"), F.lit(_CHUNK_W))
        .cast("bigint").alias("n_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("tk"), F.col("start_tok") + 1, F.lit(_CHUNK_W))
        ).alias("chunk_text"),
    )


# --- Chunk-level (sub-document) exact dedup ----------------------------------

_CHUNK_DEDUP_SQL = f"""
WITH chunks AS ({_CHUNK_SQL.strip()})
SELECT md5(chunk_text) AS chunk_fp,
       count(*) AS n_copies,
       count(DISTINCT doc_id) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc_id
FROM chunks
WHERE n_tokens > 0
GROUP BY md5(chunk_text)
HAVING count(*) > 1
"""


@declare("chunk_exact_dedup", oracle=_CHUNK_DEDUP_SQL)
def q_chunk_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup: exact duplicate CHUNKS across the corpus
    (boilerplate paragraphs repeated inside otherwise-distinct
    documents — the case document-level fingerprints miss entirely).
    Composes the overlapping chunker with md5-fingerprint grouping;
    emits every chunk shape that appears more than once, with its copy
    count, distinct-document spread, and first-seen document.

    Scale shape: chunking is map-side; the fingerprint groupBy is one
    shuffle on md5 keys (uniformly distributed by construction — no
    skew), with map-side partials. Same first-seen-wins convention as
    exact_dedup_fingerprint."""
    chunks = q_doc_chunks_overlapping(spark, sf_dir).filter(F.col("n_tokens") > 0)
    return (
        chunks.select("doc_id", F.md5(F.col("chunk_text")).alias("chunk_fp"))
        .groupBy("chunk_fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


# --- Capstone: the composed corpus pipeline ----------------------------------
#
# clean -> quality filter -> exact-dedup keeper -> hash split, in ONE
# declared plan. Each stage is individually oracle-checked elsewhere
# (quality_filter_audit, exact_dedup_fingerprint,
# split_assignment_counts); this query proves the COMPOSITION — the
# thing a user actually runs — stays correct end to end.

_E2E_SQL = rf"""
WITH base AS (
  SELECT doc_id, lang, text,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         len({_TOKS_SQL}) AS n_tokens
  FROM documents
),
kept AS (
  SELECT doc_id, lang, text FROM base
  WHERE n_tokens >= 30 AND n_tokens <= 200
    AND n_alpha * 10 >= n_chars * 7
    AND n_punct * 20 <= n_chars
),
fp AS (
  SELECT doc_id, lang,
         md5(regexp_replace(lower(text), '[^\w\s]', '', 'g')) AS fingerprint
  FROM kept
),
keepers AS (
  SELECT lang, fingerprint, min(doc_id) AS doc_id
  FROM fp GROUP BY lang, fingerprint
),
assigned AS (
  SELECT lang,
         CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
           WHEN 'e' THEN 'val' WHEN 'f' THEN 'test' ELSE 'train'
         END AS split
  FROM keepers
)
SELECT split, lang, count(*) AS n_docs
FROM assigned GROUP BY split, lang
"""


@declare("corpus_pipeline_e2e", oracle=_E2E_SQL)
def q_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-corpus pipeline as one declared plan:
    quality filter (C4-style integer thresholds) → exact-dedup keeper
    (first-seen-wins per (lang, fingerprint)) → deterministic md5
    train/val/test split → per-(split, lang) counts. Every stage is
    oracle-checked on its own elsewhere; this pins the composition.

    Scale shape: filter and fingerprint are map-side over one scan;
    the keeper groupBy is the one data-sized shuffle; the split is a
    projection on the (already small) keeper set; final rollup is 15
    cells. Catalyst fuses the filter+fingerprint into the scan stage —
    the whole pipeline is scan → shuffle → tiny agg."""
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    n_tokens = F.size(tokenize(clean_string("text")))
    kept = docs.filter(
        (n_tokens >= 30) & (n_tokens <= 200)
        & (n_alpha * 10 >= n_chars * 7)
        & (n_punct * 20 <= n_chars)
    )
    fp = kept.select(
        "doc_id", "lang",
        F.md5(F.regexp_replace(F.lower("text"), r"[^\w\s]", "")).alias("fingerprint"),
    )
    keepers = fp.groupBy("lang", "fingerprint").agg(
        F.min("doc_id").alias("doc_id")
    )
    first = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    assigned = keepers.select(
        "lang",
        F.when(first == "e", "val").when(first == "f", "test")
        .otherwise("train").alias("split"),
    )
    return assigned.groupBy("split", "lang").agg(F.count("*").alias("n_docs"))


# --- Deterministic training-order shuffle ------------------------------------

_SHUFFLE_SQL = """
WITH keyed AS (
  SELECT doc_id,
         md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
)
SELECT doc_id,
       ascii(substr(shuffle_key, 1, 1)) % 8 AS shard,
       row_number() OVER (
         PARTITION BY ascii(substr(shuffle_key, 1, 1)) % 8
         ORDER BY shuffle_key, doc_id
       ) AS pos
FROM keyed
"""


@declare("training_order_shuffle", oracle=_SHUFFLE_SQL)
def q_training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global training order: every document gets an
    (epoch-salted) md5 shuffle key, a shard from the key's first hex
    digit, and a position within its shard. The training-data
    counterpart of ORDER BY random(): RNG order depends on engine,
    partitioning, and seed plumbing, but a hash order is a pure
    function of (epoch_salt, doc_id) — the same corpus yields the same
    batch order on any cluster size, any engine, forever, and the next
    epoch is just a different salt.

    Scale shape: NO global sort — the expensive total order is never
    materialized. One shuffle partitions by shard (16 hex digits % 8,
    uniform), and each shard sorts independently inside its window; at
    100 TB shards map to writer tasks emitting sorted shard files.
    ``ascii(first_hex_char) % 8`` is used instead of a hex→int
    conversion because Spark and DuckDB share ``ascii``/``substr``
    semantics exactly, keeping the oracle bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("epoch0:"), F.col("doc_id").cast("string")))
        .alias("shuffle_key"),
    )
    shard = (F.ascii(F.substring("shuffle_key", 1, 1)) % 8).alias("shard")
    w = Window.partitionBy(F.ascii(F.substring("shuffle_key", 1, 1)) % 8).orderBy(
        "shuffle_key", "doc_id"
    )
    return keyed.select(
        "doc_id", shard, F.row_number().over(w).alias("pos")
    )


# --- Length-bucket padding-waste census --------------------------------------

_PADDING_SQL = """
SELECT CAST(n_chars // 256 AS BIGINT) AS bucket,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       max(n_chars) AS max_chars,
       count(*) * max(n_chars) - CAST(sum(n_chars) AS BIGINT)
         AS padding_waste_chars
FROM documents
GROUP BY 1
"""


@declare("length_bucket_padding_stats", oracle=_PADDING_SQL)
def q_length_bucket_padding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-packing efficiency census: bucket documents by length
    (256-char granularity) and measure the padding a
    pad-to-longest-in-batch collator would waste per bucket — the
    number that motivates length-bucketed batching (and the
    ``sequence_packing_bins`` operator) in the first place. All-integer
    arithmetic → bit-exact across engines. The bucket uses FLOOR
    division on both sides (Spark ``div`` truncates toward zero while
    DuckDB ``//`` floors toward -inf, so a corrupt negative n_chars
    would otherwise land in different buckets per engine — the corpus
    contract additionally pins n_chars >= 0).

    Scale shape: single scan → one low-cardinality grouped agg with
    map-side partials; ``sum``/``max``/``count`` are mergeable, so this
    is the canonical 100 TB-safe shape (no row ever leaves its
    partition unaggregated)."""
    docs = load_table(spark, sf_dir, "documents")
    # floor(), not `div`: floor division matches DuckDB `//` on
    # negatives; n_chars < 2^53 so the double division is exact
    cents = F.floor(F.col("n_chars") / F.lit(256)).alias("bucket")
    grouped = docs.groupBy(cents).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.max("n_chars").alias("max_chars"),
    )
    return grouped.select(
        "bucket", "n_docs", "sum_chars", "max_chars",
        (F.col("n_docs") * F.col("max_chars") - F.col("sum_chars"))
        .alias("padding_waste_chars"),
    )


_MIX_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         GREATEST(1, COALESCE(n_chars, 0) // 4) AS tok,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
lagg AS (
  SELECT lang, CAST(sum(tok) AS BIGINT) AS tok_l FROM d GROUP BY lang
),
wts AS (
  SELECT lang, tok_l,
         CAST(floor(sqrt(tok_l * 1000000.0)) AS BIGINT) AS w
  FROM lagg
),
tot AS (
  SELECT CAST(sum(tok_l) AS BIGINT) // 2 AS budget,
         CAST(sum(w) AS BIGINT) AS wsum
  FROM wts
),
budgets AS (
  SELECT lang, CAST((budget * w) // wsum AS BIGINT) AS b_l
  FROM wts, tot
),
ordered AS (
  SELECT doc_id, lang, tok,
         CAST(COALESCE(sum(tok) OVER (
           PARTITION BY lang ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM d
)
SELECT o.doc_id, o.lang, CAST(o.tok AS BIGINT) AS tok
FROM ordered o JOIN budgets b ON o.lang = b.lang
WHERE o.cum_before < b.b_l
"""


@declare("token_budget_mixture_sample", oracle=_MIX_SQL)
def q_token_budget_mixture_sample(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TEMPERATURE-BALANCED MIXTURE SAMPLING TO A TOKEN BUDGET — the
    step that turns ``lang_sampling_weights`` (α=0.5 weights) into an
    actual training corpus: a global budget of half the corpus tokens
    is split across languages ∝ √(token mass) (upweighting tail
    languages, the multilingual-LM standard), and each language fills
    its share in deterministic md5(doc_id) order until the running
    token total crosses its budget (the crossing doc is included, so a
    positive budget never selects zero docs). Membership is a pure
    function of the data — identical on 1 executor or 1000, re-runnable
    forever (the ``hash_stratified_sample`` argument: the sample
    DEFINES the dataset, so RNG-stream reproducibility is
    disqualifying). Every step is integer math or a correctly-rounded
    sqrt/floor of an exact integer, so the oracle replays it
    bit-for-bit; token counts are the 4-chars≈1-token estimate
    (integer division — the planner's estimate, not the tokenizer's
    output, which is fine because the budget is a target, not an
    invoice). At extreme corpus scale (≳10^4 TB) the budget·weight
    product approaches INT64 — normalize weights first if that day
    comes (documented rather than silently doubled).

    Plan shape: one scan → 5-row lang aggregate (map-side partials) →
    broadcast the 5-row budget relation back onto the scan → one
    window cumsum per lang partition. No shuffle wider than the
    per-lang sort; at 100 TB the cumsum partitions by lang and Spark
    range-partitions within, exactly how sequence packing runs."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "lang",
        F.greatest(F.lit(1), F.expr("COALESCE(n_chars, 0) div 4"))
        .alias("tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    lagg = d.groupBy("lang").agg(F.sum("tok").cast("bigint").alias("tok_l"))
    wts = lagg.select(
        "lang", "tok_l",
        F.floor(F.sqrt(F.col("tok_l") * 1000000.0)).cast("bigint").alias("w"),
    )
    wtot = Window.partitionBy()
    # integer div end to end — `/` is double division in Spark and a
    # 2^53-crossing product would truncate differently than DuckDB's //
    budgets = wts.select(
        "lang",
        F.sum("tok_l").over(wtot).cast("bigint").alias("tot_tok"),
        F.col("w"),
        F.sum("w").over(wtot).cast("bigint").alias("wsum"),
    ).select(
        "lang",
        F.expr("((tot_tok div 2) * w) div wsum").cast("bigint").alias("b_l"),
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = d.select(
        "doc_id", "lang", "tok",
        F.coalesce(F.sum("tok").over(wcum), F.lit(0)).cast("bigint")
        .alias("cum_before"),
    )
    return (
        ordered.join(F.broadcast(budgets), "lang")
        .filter(F.col("cum_before") < F.col("b_l"))
        .select("doc_id", "lang", F.col("tok").cast("bigint").alias("tok"))
    )


# --- Round 9 (continuation): DSIR importance resampling -----------------------

# Hashed n-gram feature space. 64 buckets keeps the oracle's lambda
# relation readable; production would use 10^4-10^5 (Xie et al. 2023
# use 10^4) — still broadcast-sized, nothing else changes.
_DSIR_B = 64

_DSIR_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang, {_TOKS_SQL} AS tk FROM documents
),
grams AS (
  SELECT doc_id, lang, unnest(tk) AS gram FROM toks
  UNION ALL
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS gram
  FROM toks WHERE len(tk) >= 2
),
b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % {_DSIR_B} AS bucket
  FROM grams
),
seedb AS (
  SELECT bucket, count(*) AS ct FROM b
  WHERE lang = 'en' AND doc_id % 5 = 0 GROUP BY bucket
),
rawb AS (
  SELECT bucket, count(*) AS cr FROM b
  WHERE COALESCE(lang, '') <> 'en' OR doc_id % 5 <> 0 GROUP BY bucket
),
tot AS (
  SELECT (SELECT COALESCE(sum(ct), 0) FROM seedb) AS t_total,
         (SELECT COALESCE(sum(cr), 0) FROM rawb) AS r_total
),
spine AS (SELECT unnest(range(0, {_DSIR_B})) AS bucket),
lam AS (
  SELECT bucket,
         CAST(round((ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE))
                     - ln(CAST(COALESCE(cr, 0) + 1 AS DOUBLE))
                     + ln(CAST(r_total + {_DSIR_B} AS DOUBLE))
                     - ln(CAST(t_total + {_DSIR_B} AS DOUBLE)))
                    * 1000000.0) AS BIGINT) AS lam_u
  FROM spine LEFT JOIN seedb USING (bucket) LEFT JOIN rawb USING (bucket), tot
),
docb AS (
  SELECT doc_id, bucket, count(*) AS c FROM b
  WHERE COALESCE(lang, '') <> 'en' OR doc_id % 5 <> 0
  GROUP BY doc_id, bucket
),
scored AS (
  SELECT doc_id,
         CAST(sum(c * lam_u) AS BIGINT) AS logw_u,
         CAST(sum(c) AS BIGINT) AS n_grams
  FROM docb JOIN lam USING (bucket) GROUP BY doc_id
)
SELECT doc_id, logw_u, n_grams
FROM scored ORDER BY logw_u DESC, doc_id ASC LIMIT 100
"""


@declare("dsir_importance_select", oracle=_DSIR_SQL)
def q_dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): select raw-corpus documents whose hashed
    n-gram feature distribution looks like a small trusted target set.
    Target seed = every 5th English doc; candidates = everything else.
    Features are word unigrams+bigrams hashed into {B} buckets with the
    portable md5 hash; bucket unigram models get add-1 smoothing; each
    candidate's importance weight is sum_b count_doc[b] * ln(p_hat[b] /
    q_hat[b]), and the top-100 by weight are selected (stable doc_id
    tiebreak).

    Cross-engine float parity uses the bm25_scores recipe: the
    log-ratio is quantized ONCE per bucket to integer micro-units
    (lambda_u = round(1e6 * (ln(ct+1) - ln(cr+1) + ln(R+B) - ln(T+B))),
    the subtracted-logs form that cannot overflow at corpus scale), so
    every doc-level number is an exact BIGINT sum — no float summation
    order anywhere.

    Scale shape: gram explode is map-side; (doc, bucket) counts partial-
    aggregate before the shuffle; the lambda relation is B rows →
    broadcast; the global totals are a 1-row broadcast; selection is
    TakeOrderedAndProject. At 100 TB the only data-sized shuffle is the
    (doc_id, bucket) count — bounded by docs x B, not by token count.
    Reference scope: the reference's keyword pipeline (utils.py:246-316)
    scores docs against a query; this scores them against a target
    DISTRIBUTION — the data-curation upgrade of the same surface.
    """.replace("{B}", str(_DSIR_B))
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", tokenize(clean_string("text")).alias("tk"))
    # ONE explode over unigrams ++ bigrams: a union of two explodes
    # would scan and re-tokenize the corpus twice (slice(tk,1,0) is
    # the typed empty array for the size<2 branch)
    bi = F.expr(
        "CASE WHEN size(tk) >= 2 THEN"
        " transform(sequence(0, size(tk) - 2),"
        "           i -> concat_ws(' ', tk[i], tk[i+1]))"
        " ELSE slice(tk, 1, 0) END")
    grams = toks.select(
        "doc_id", "lang",
        F.explode(F.concat(F.col("tk"), bi)).alias("gram"))
    b = grams.select(
        "doc_id", "lang",
        F.pmod(
            F.conv(F.substring(F.md5(F.encode("gram", "utf-8")), 1, 8),
                   16, 10).cast("bigint"),
            F.lit(_DSIR_B)).alias("bucket"))
    is_seed = (F.col("lang") == "en") & (F.col("doc_id") % 5 == 0)
    is_cand = (F.coalesce(F.col("lang"), F.lit("")) != "en") \
        | (F.col("doc_id") % 5 != 0)
    seedb = b.filter(is_seed).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("ct"))
    rawb = b.filter(is_cand).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"))
    tot = seedb.agg(
        F.coalesce(F.sum("ct"), F.lit(0)).alias("t_total")).crossJoin(
        rawb.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("r_total")))
    spine = spark.range(_DSIR_B).select(F.col("id").alias("bucket"))
    lam = (
        spine.join(F.broadcast(seedb), "bucket", "left")
        .join(F.broadcast(rawb), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                (F.log(F.coalesce(F.col("ct"), F.lit(0)).cast("double") + 1)
                 - F.log(F.coalesce(F.col("cr"), F.lit(0)).cast("double") + 1)
                 + F.log((F.col("r_total") + _DSIR_B).cast("double"))
                 - F.log((F.col("t_total") + _DSIR_B).cast("double")))
                * 1_000_000.0
            ).cast("bigint").alias("lam_u"),
        ))
    docb = b.filter(is_cand).groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("c"))
    scored = (
        docb.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lam_u")).cast("bigint").alias("logw_u"),
             F.sum("c").cast("bigint").alias("n_grams")))
    return scored.orderBy(F.desc("logw_u"), F.asc("doc_id")).limit(100)
