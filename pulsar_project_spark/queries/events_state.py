"""Declared queries: retention / eviction / argmax over the events stream
(SURVEY.md §2.4, §2.5, §2.9 batch forms).

``events`` plays the reference's message/record stream; ``user_id`` is the
session key. Canonical event time is ``ts_us`` (BIGINT epoch micros, see
sources.tables.load_events for why not nanos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_project_spark.operators.retention import (
    evict_candidates,
    keep_last_n,
    latest_per_group,
)
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events

KEEP_LAST = 10  # web memory view tail, app.py:341,388


@declare(
    "keep_last_n_per_user",
    oracle=f"""
SELECT user_id, event_id, ts_us, event_type
FROM (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn <= {KEEP_LAST}
""",
)
def q_keep_last_n_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """records[-N:] per session (memory.py:125; task.py:620-623)."""
    ev = load_events(spark, sf_dir)
    return keep_last_n(
        ev.select("user_id", "event_id", "ts_us", "event_type"),
        ["user_id"],
        [F.desc("ts_us"), F.desc("event_id")],
        KEEP_LAST,
    )


@declare(
    "latest_event_per_user",
    oracle="""
SELECT user_id, event_id, ts_us, event_type, value
FROM (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax over sortable time label (latest summary, memory.py:119-121)."""
    ev = load_events(spark, sf_dir)
    return latest_per_group(
        ev.select("user_id", "event_id", "ts_us", "event_type", "value"),
        ["user_id"],
        [F.desc("ts_us"), F.desc("event_id")],
    )


@declare(
    "evict_min_per_type",
    oracle="""
SELECT event_type, event_id, user_id, value
FROM (
  SELECT event_type, event_id, user_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC NULLS LAST,
                                     epoch_us(ts) ASC, event_id ASC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def q_evict_min_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin by composite key = eviction pick (memory.py:326-335: ascending
    (frequency, last_updated), delete head). NULL ordering is PINNED
    (NULLS LAST both sides): Spark's ASC default is NULLS FIRST,
    DuckDB's is NULLS LAST, so an unpinned order silently evicts a
    different row the moment a NULL value appears — found by the NULL
    sweep. Semantics: an unknown value is never the eviction pick."""
    ev = load_events(spark, sf_dir)
    return evict_candidates(
        ev.select("event_type", "event_id", "user_id", "value", "ts_us"),
        ["event_type"],
        [F.asc_nulls_last("value"), F.asc("ts_us"), F.asc("event_id")],
    ).drop("ts_us")


@declare(
    "microbatch_rollup",
    oracle="""
SELECT event_id // 5 AS batch_id,
       count(*) AS n_events,
       min(event_id) AS first_event,
       max(event_id) AS last_event,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS batch_value
FROM events
GROUP BY event_id // 5
""",
)
def q_microbatch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's update-batch grouping (memory.py:272: last
    update_batch_size=5 records per maintenance pass) as a batch rollup:
    one row per batch of 5 by arrival order. Sum in DECIMAL then cast —
    float summation order (Spark partial aggs vs DuckDB) must not leak
    into the hash."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.expr("event_id div 5").alias("batch_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("batch_value"),
        )
    )


_SNAP_RECORDS = 10  # latest_record_num default, memory.py:125
_SNAP_SUMMARIES = 3  # saved_summary_num, memory.py:310


@declare(
    "memory_state_snapshot",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
), records_tail AS (
  SELECT 'record' AS section, CAST(event_id AS VARCHAR) AS k,
         user_id AS n, value AS v
  FROM (SELECT *, row_number() OVER (ORDER BY ts_us DESC, event_id DESC) AS rn
        FROM ev)
  WHERE rn <= {_SNAP_RECORDS}
), summaries_tail AS (
  SELECT 'summary' AS section, CAST(batch_id AS VARCHAR) AS k,
         n_events AS n, batch_value AS v
  FROM (
    SELECT batch_id, n_events, batch_value,
           row_number() OVER (ORDER BY batch_id DESC) AS rn
    FROM (SELECT event_id // 5 AS batch_id, count(*) AS n_events,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS batch_value
          FROM ev GROUP BY event_id // 5)
  ) WHERE rn <= {_SNAP_SUMMARIES}
), topics AS (
  SELECT 'topic' AS section, event_type AS k,
         count(*) AS n, CAST(max(ts_us) AS DOUBLE) AS v
  FROM ev GROUP BY event_type
)
SELECT * FROM records_tail
UNION ALL SELECT * FROM summaries_tail
UNION ALL SELECT * FROM topics
""",
)
def q_memory_state_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole memory state (SURVEY.md §3.3: records tail
    + rolling summaries keep-last-3 + topic catalog with frequencies,
    memory.py:119-142,305-344) as ONE composed plan — the §3.3 lifecycle
    is three branches over one scan, unioned into a tagged relation.
    Spark computes the three branches in parallel stages; at scale each
    branch is the same retention/argmax shape proven above."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts_us", "event_type", "value"
    )
    records_tail = keep_last_n(
        ev, [], [F.desc("ts_us"), F.desc("event_id")], _SNAP_RECORDS
    ).select(
        F.lit("record").alias("section"),
        F.col("event_id").cast("string").alias("k"),
        F.col("user_id").alias("n"),
        F.col("value").alias("v"),
    )
    summaries_tail = (
        ev.groupBy(F.expr("event_id div 5").alias("batch_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("batch_value"),
        )
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("batch_id"))))
        .filter(F.col("rn") <= _SNAP_SUMMARIES)
        .select(
            F.lit("summary").alias("section"),
            F.col("batch_id").cast("string").alias("k"),
            F.col("n_events").alias("n"),
            F.col("batch_value").alias("v"),
        )
    )
    topics = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.max("ts_us").cast("double").alias("v")
    ).select(
        F.lit("topic").alias("section"),
        F.col("event_type").alias("k"), "n", "v",
    )
    return records_tail.unionByName(summaries_tail).unionByName(topics)


@declare(
    "json_props_extract",
    oracle="""
SELECT event_id,
       CASE WHEN json_valid(props)
            THEN TRY_CAST(json_extract_string(props, '$.k') AS INT)
       END AS k_val
FROM events
""",
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy JSON payload parse (the reference parses JSON payloads on
    demand, utils.py:134-163) — ``get_json_object`` stays JVM-side.
    try_cast, not cast: valid JSON with a non-numeric ``k`` (e.g.
    ``{"k": "abc"}``) must yield NULL, not fail the whole query under
    ANSI mode (DuckDB's plain CAST errors the same way)."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_val"),
    )


@declare(
    "latest_event_argmax",
    oracle="""
SELECT user_id, event_id, ts_us, event_type, value
FROM (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
)
WHERE rn = 1
""",
)
def q_latest_event_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as ``latest_event_per_user`` (argmax by (ts, id)
    per user), DIFFERENT physical strategy: ONE grouped ``max`` over a
    sortable struct instead of a window ``row_number``. The window form
    must full-sort every user partition; the struct-max form is a plain
    aggregate — map-side partial combine shrinks the shuffle to one row
    per (input partition, user) and nothing ever sorts. At 100 TB this
    is the shape to prefer whenever only the argmax row (not a rank) is
    needed. Declared separately so both strategies stay oracle-pinned.
    Unknown-time/-id rows are excluded up front: a NULL can't be
    "latest", and the filter keeps struct comparison NULL-free."""
    ev = load_events(spark, sf_dir).filter(
        F.col("ts_us").isNotNull() & F.col("event_id").isNotNull()
    )
    m = ev.groupBy("user_id").agg(
        F.max(F.struct("ts_us", "event_id", "event_type", "value")).alias("m")
    )
    return m.select(
        "user_id", F.col("m.event_id").alias("event_id"),
        F.col("m.ts_us").alias("ts_us"),
        F.col("m.event_type").alias("event_type"),
        F.col("m.value").alias("value"),
    )
