"""Capstone queries: the reference's two per-turn LIFECYCLES, each as
ONE composed, oracle-backed plan (VERDICT r9 orders #2 and #3).

The individual operators have been green for rounds; what was missing
was the COMPOSITION a real user of the reference hits on every turn:

- ``context_assembly_snapshot`` — the read side of a turn
  (client.py:107-186 ``_context_to_prompt`` calling
  memory.py:117-144 ``get_dynamic_context``): argmax summary +
  records tail + ``simple_rag`` top-k topics + ``simple_rag`` top-k
  KV facts + the federated tool catalog, unioned into one tagged
  relation. The §3.1 twin of ``memory_state_snapshot`` (§3.3).
- ``task_update_snapshot`` — the write side of a turn
  (task.py:491-627 ``TaskManager.update``): response-summary
  truncation + marker-based file extraction with its census +
  title derivation + the keep-last-50 log retention, as one plan.

Scale shape: every branch is a proven retention/argmax/top-k/census
shape over ONE scan of its table; the union is a zero-shuffle
concatenation, so Spark runs the branches as independent stages in
parallel. Nothing here collects, crosses, or funnels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_project_spark.functions.text import (
    extract_between_markers,
    extract_title,
    truncate_display,
)
from pulsar_project_spark.operators.retention import (
    keep_last_n,
    last_wins_dedup,
)
from pulsar_project_spark.operators.retrieval import simple_rag
from pulsar_project_spark.queries.retrieval import (
    FLAGSHIP_KEYWORDS,
    FLAGSHIP_QUERY,
)
from pulsar_project_spark.queries.text_ops import (
    _DUCK_INITCAP,
    _MARK_E,
    _MARK_S,
    _TITLE_BASE,
)
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table

# reference defaults, memory.py:125-141
_CTX_RECORDS = 10        # latest_record_num
_CTX_TOPICS = 3          # relevant_topics_num
_CTX_KV = 3              # relevant_key_value_num
_SUMMARY_BATCH = 5       # micro-batch size, client.py react loop
_MAX_LOGS = 50           # max_logs, task.py:618
_TITLE_SAMPLE = 5        # title branch: first docs by id (deterministic)

_RAG_TERMS = " + ".join(
    f"(CASE WHEN contains(cleaned, '{kw}') THEN 1 ELSE 0 END)"
    for kw in FLAGSHIP_KEYWORDS
)

# Spark's integer ``div`` truncates toward zero; DuckDB's ``//``
# floors. event_id carries no nonnegative bound in this query, so the
# oracle spells out trunc division (the repo's sign-guard convention —
# same reason the dhash oracle writes ((doc_id % 4 + 4) % 4)).
_BATCH_ID = (f"CASE WHEN event_id >= 0 THEN event_id // {_SUMMARY_BATCH} "
             f"ELSE -((-event_id) // {_SUMMARY_BATCH}) END")

_CTX_ORACLE = rf"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
  FROM events
), summary_latest AS (
  -- argmax summary: max(self.summary.keys()), memory.py:119-121
  SELECT 'summary' AS section, CAST(batch_id AS VARCHAR) AS k,
         n_events AS n, batch_value AS v
  FROM (
    SELECT batch_id, n_events, batch_value,
           row_number() OVER (ORDER BY batch_id DESC) AS rn
    FROM (SELECT {_BATCH_ID} AS batch_id,
                 count(*) AS n_events,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS batch_value
          FROM ev GROUP BY 1)
  ) WHERE rn = 1
), records_tail AS (
  -- records[-latest_record_num:], memory.py:123-126
  SELECT 'record' AS section, CAST(event_id AS VARCHAR) AS k,
         user_id AS n, value AS v
  FROM (SELECT *, row_number() OVER (ORDER BY ts_us DESC,
                                     event_id DESC) AS rn FROM ev)
  WHERE rn <= {_CTX_RECORDS}
), scored AS (
  SELECT doc_id, doc_id % 2 AS corpus, {_RAG_TERMS} AS score
  FROM (SELECT doc_id,
               regexp_replace(lower(text), '[^\w\s]', '', 'g') AS cleaned
        FROM documents)
), topics AS (
  -- simple_rag over the topic corpus (even doc ids), memory.py:128-134
  SELECT 'topic' AS section, CAST(doc_id AS VARCHAR) AS k,
         score AS n, CAST(NULL AS DOUBLE) AS v
  FROM (SELECT *, row_number() OVER (ORDER BY score DESC,
                                     doc_id ASC) AS rn
        FROM scored WHERE corpus = 0)
  WHERE rn <= {_CTX_TOPICS}
), kv_facts AS (
  -- simple_rag over the KV corpus (odd doc ids), memory.py:136-141
  SELECT 'kv' AS section, CAST(doc_id AS VARCHAR) AS k,
         score AS n, CAST(NULL AS DOUBLE) AS v
  FROM (SELECT *, row_number() OVER (ORDER BY score DESC,
                                     doc_id ASC) AS rn
        FROM scored WHERE corpus = 1)
  WHERE rn <= {_CTX_KV}
), tool_catalog AS (
  -- federated tool list with last-wins collisions, client.py:171-179
  -- over manager.py:216-250
  SELECT 'tool' AS section, tool_name AS k, server_order AS n,
         CAST(p_partkey AS DOUBLE) AS v
  FROM (
    SELECT p_brand AS tool_name, p_partkey % 10 AS server_order,
           p_partkey,
           row_number() OVER (PARTITION BY p_brand
                              ORDER BY p_partkey % 10 DESC,
                                       p_partkey DESC) AS rn
    FROM part
  ) WHERE rn = 1
)
SELECT * FROM summary_latest
UNION ALL SELECT * FROM records_tail
UNION ALL SELECT * FROM topics
UNION ALL SELECT * FROM kv_facts
UNION ALL SELECT * FROM tool_catalog
"""


@declare("context_assembly_snapshot", oracle=_CTX_ORACLE)
def q_context_assembly_snapshot(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The per-turn retrieval context as ONE plan (client.py:107-186 +
    memory.py:117-144): latest summary (argmax over batch rollup),
    records tail (keep-last-10), ``simple_rag`` top-3 topics and top-3
    KV facts (two disjoint halves of ``documents`` playing the topic
    catalog and the KV store), and the last-wins tool catalog — all
    tagged into (section, k, n, v). Five branches over three scans;
    the unions are shuffle-free, so the stages run in parallel."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts_us", "event_type", "value")
    summary_latest = (
        ev.groupBy(F.expr(f"event_id div {_SUMMARY_BATCH}")
                   .alias("batch_id"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)"))
             .cast("double").alias("batch_value"))
        .withColumn("rn",
                    F.row_number().over(Window.orderBy(F.desc("batch_id"))))
        .filter(F.col("rn") == 1)
        .select(F.lit("summary").alias("section"),
                F.col("batch_id").cast("string").alias("k"),
                F.col("n_events").alias("n"),
                F.col("batch_value").alias("v"))
    )
    records_tail = keep_last_n(
        ev, [], [F.desc("ts_us"), F.desc("event_id")], _CTX_RECORDS,
    ).select(F.lit("record").alias("section"),
             F.col("event_id").cast("string").alias("k"),
             F.col("user_id").alias("n"),
             F.col("value").alias("v"))
    docs = load_table(spark, sf_dir, "documents")
    topics = simple_rag(
        docs.filter(F.col("doc_id") % 2 == 0), FLAGSHIP_QUERY,
        top_k=_CTX_TOPICS,
    ).select(F.lit("topic").alias("section"),
             F.col("doc_id").cast("string").alias("k"),
             F.col("score").cast("bigint").alias("n"),
             F.lit(None).cast("double").alias("v"))
    kv_facts = simple_rag(
        docs.filter(F.col("doc_id") % 2 == 1), FLAGSHIP_QUERY,
        top_k=_CTX_KV,
    ).select(F.lit("kv").alias("section"),
             F.col("doc_id").cast("string").alias("k"),
             F.col("score").cast("bigint").alias("n"),
             F.lit(None).cast("double").alias("v"))
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_brand").alias("tool_name"),
        (F.col("p_partkey") % 10).alias("server_order"),
        "p_partkey")
    tool_catalog = last_wins_dedup(
        part, ["tool_name"],
        [F.desc("server_order"), F.desc("p_partkey")],
    ).select(F.lit("tool").alias("section"),
             F.col("tool_name").alias("k"),
             F.col("server_order").alias("n"),
             F.col("p_partkey").cast("double").alias("v"))
    return (summary_latest.unionByName(records_tail)
            .unionByName(topics).unionByName(kv_facts)
            .unionByName(tool_catalog))


_TASK_ORACLE = rf"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
  FROM events
), log_tail AS (
  -- keep-last-50 log retention per task, task.py:617-623
  SELECT 'log' AS section, CAST(event_id AS VARCHAR) AS k,
         user_id AS n, event_type AS v
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts_us DESC,
                                              event_id DESC) AS rn
        FROM ev)
  WHERE rn <= {_MAX_LOGS}
), summaries AS (
  -- response_summary truncation, task.py:505-509
  SELECT 'summary' AS section, CAST(doc_id AS VARCHAR) AS k,
         length(text) AS n,
         CASE WHEN length(text) > 200 THEN substr(text, 1, 200) || '...'
              ELSE text END AS v
  FROM documents
), spans AS (
  SELECT doc_id,
         substr(text, strpos(text, '{_MARK_S}')) AS aft
  FROM documents
  WHERE strpos(text, '{_MARK_S}') > 0
), files_census AS (
  -- extracted-file census, task.py:512-522 over the extractor's two
  -- outcomes (end marker found vs 20-line fallback, task.py:263-285)
  SELECT 'files' AS section,
         CASE WHEN strpos(substr(aft, {len(_MARK_S) + 1}),
                          '{_MARK_E}') > 0
              THEN 'complete' ELSE 'fallback' END AS k,
         count(*) AS n, CAST(NULL AS VARCHAR) AS v
  FROM spans
  GROUP BY 2
), titles AS (
  -- title derivation capped at 60, task.py:350-370,588
  SELECT 'title' AS section, CAST(doc_id AS VARCHAR) AS k,
         length(title) AS n, title AS v
  FROM (
    SELECT doc_id,
           substr({_DUCK_INITCAP.format(expr=_TITLE_BASE)}, 1, 60)
             AS title
    FROM documents
    ORDER BY doc_id ASC LIMIT {_TITLE_SAMPLE}
  )
)
SELECT * FROM log_tail
UNION ALL SELECT * FROM summaries
UNION ALL SELECT * FROM files_census
UNION ALL SELECT * FROM titles
"""


@declare("task_update_snapshot", oracle=_TASK_ORACLE)
def q_task_update_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-turn task update as ONE plan (task.py:491-627):
    response-summary truncation (505-509), marker-based extraction
    census over the extractor's complete/fallback outcomes (263-285,
    512-522), title derivation capped at 60 (350-370, 588), and the
    keep-last-50 log retention (617-623) — tagged into
    (section, k, n, v). ``documents`` plays the response texts;
    ``events`` plays the per-task log stream keyed by user_id."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts_us", "event_type")
    log_tail = keep_last_n(
        ev, ["user_id"], [F.desc("ts_us"), F.desc("event_id")],
        _MAX_LOGS,
    ).select(F.lit("log").alias("section"),
             F.col("event_id").cast("string").alias("k"),
             F.col("user_id").alias("n"),
             F.col("event_type").alias("v"))
    docs = load_table(spark, sf_dir, "documents")
    summaries = docs.select(
        F.lit("summary").alias("section"),
        F.col("doc_id").cast("string").alias("k"),
        F.length("text").cast("bigint").alias("n"),
        truncate_display("text", 200).alias("v"))
    extracted = docs.select(
        "doc_id",
        extract_between_markers("text", _MARK_S, _MARK_E)
        .alias("extracted"),
        F.col("text"),
    ).filter(F.col("extracted").isNotNull())
    files_census = (
        extracted.select(
            F.when(F.col("extracted").endswith(_MARK_E), "complete")
            .otherwise("fallback").alias("outcome"))
        .groupBy("outcome")
        .agg(F.count("*").alias("n"))
        .select(F.lit("files").alias("section"),
                F.col("outcome").alias("k"), "n",
                F.lit(None).cast("string").alias("v"))
    )
    titles = (
        docs.orderBy(F.asc("doc_id")).limit(_TITLE_SAMPLE)
        .select(F.lit("title").alias("section"),
                F.col("doc_id").cast("string").alias("k"),
                F.length(extract_title("text")).cast("bigint").alias("n"),
                extract_title("text").alias("v"))
    )
    return (log_tail.unionByName(summaries)
            .unionByName(files_census).unionByName(titles))


# --- react-loop smoke composition (VERDICT r9 order #4) ---------------------

from pulsar_project_spark.functions.providers import (  # noqa: E402
    RESPONSE_SCHEMA,
    response_expr,
)

_REACT_ITERS = 3          # max_iters guard, client.py:221 (default 5)
_REACT_SEED = "r10"


def _react_turn(state: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One unrolled iteration of the react loop (client.py:216-333) as
    a PURE PROJECTION over the per-session state relation — zero
    shuffles per turn: the state carries the context digest, the
    running conversation history, and the next seq base, so the prompt
    assembles map-side (client.py:181-186 formats 'ROLE: content'),
    the deterministic provider is a column, the fenced JSON parses
    with from_json (client.py:122-136, 194-214), and the dispatch
    messages emit in the client's processing order — text, think,
    mem_op, tool (client.py:233-318). A tool call forces another
    iteration regardless of ``finished`` (client.py:289). Returns
    (this turn's message rows, the advanced state)."""
    parsed = (
        state.filter(~F.col("done"))
        .withColumn(
            "resp",
            response_expr(
                F.concat(F.lit("## Context:\n"), F.col("ctx_text"),
                         F.lit("\n## Conversation History:\n"),
                         F.col("history")),
                seed=_REACT_SEED))
        .withColumn(
            "r",
            F.from_json(
                F.regexp_extract("resp", r"```\n(.*)\n```", 1),
                RESPONSE_SCHEMA))
        .withColumn(
            "out",
            F.array_compact(F.array(
                F.struct(F.lit(1).alias("off"),
                         F.col("r.text").alias("content")),
                F.struct(F.lit(2).alias("off"),
                         F.concat(F.lit("[Think] "), F.col("r.think"))
                         .alias("content")),
                F.when(F.col("r.mem_op").isNotNull(), F.struct(
                    F.lit(3).alias("off"),
                    F.concat(F.lit("[Memory Operation Called] name: "),
                             F.col("r.mem_op.name"),
                             F.lit(", result: stored "),
                             F.col("r.mem_op.args")["content"])
                    .alias("content"))),
                F.when(F.col("r.tool").isNotNull(), F.struct(
                    F.lit(4).alias("off"),
                    F.concat(F.lit("[Tool Called] name: "),
                             F.col("r.tool.name"),
                             F.lit(", result: ok "),
                             F.col("r.tool.args")["q"])
                    .alias("content"))),
            )))
    )
    rows = parsed.select(
        "session", "b", F.explode("out").alias("o"),
    ).select(
        "session",
        (F.col("b") + F.col("o.off")).cast("int").alias("seq"),
        F.lit("assistant").alias("role"),
        F.col("o.content").alias("content"),
    )
    advanced = parsed.select(
        "session", "ctx_text",
        (F.coalesce(F.col("r.finished"), F.lit(False))
         & F.col("r.tool").isNull()).alias("done"),
        (F.col("b") + 4).alias("b"),
        F.concat(
            "history",
            F.aggregate(
                "out", F.lit(""),
                lambda acc, o: F.concat(acc, F.lit("\nASSISTANT: "),
                                        o["content"])),
        ).alias("history"),
    )
    # sessions that were already done carry their state forward
    return rows, advanced.unionByName(state.filter(F.col("done")))


@declare("react_loop_trace")  # rows-only: iterative dispatch, SURVEY §2.10
def q_react_loop_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's execution engine — the iterative react loop
    (client.py:216-333: context assembly → LLM call → structured
    parse → mem_op/tool dispatch → message append, repeated to
    max_iters) — smoke-composed END TO END against the deterministic
    provider stub (functions/providers.py), with the loop UNROLLED as
    one DataFrame plan: the provider is a column expression, so every
    session advances through every turn in the same vectorized stages.
    One session per user_id; the context digest is that user's event
    count (the capstone context assembly is certified separately).
    Rows-only by design (driver checks row stability; the per-branch
    semantics are each oracle-certified elsewhere): iterative
    dispatch with a data-dependent stop flag is the one shape the
    single-statement oracle can't express."""
    ev = load_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    # the ONE shuffle in the whole composition: the per-session context
    # digest. Every turn after it is a map-side projection — the state
    # relation carries the running history and seq base, so no history
    # re-aggregation ever happens (a groupBy-per-turn formulation cost
    # 3 shuffles and re-scanned events; audited and replaced).
    # localCheckpoint per turn truncates the unrolled lineage (the
    # kmeans/pq iteration pattern — without it the plan tree doubles
    # per turn).
    ctx = ev.groupBy(F.col("user_id").alias("session")).agg(
        F.concat(F.lit("events="), F.count("*").cast("string"),
                 F.lit(" latest="), F.max("event_type"))
        .alias("ctx_text")).localCheckpoint(eager=True)
    msgs = ctx.select(
        "session", F.lit(0).alias("seq"), F.lit("user").alias("role"),
        F.concat(F.lit("summarize my activity: "), "ctx_text")
        .alias("content"))
    state = ctx.select(
        "session", "ctx_text", F.lit(False).alias("done"),
        F.lit(0).alias("b"),
        F.concat(F.lit("USER: summarize my activity: "), "ctx_text")
        .alias("history"))
    for _ in range(_REACT_ITERS):
        rows, state = _react_turn(state)
        msgs = msgs.unionByName(rows)
        state = state.localCheckpoint(eager=True)
    return msgs.select("session", "seq", "role", "content")
