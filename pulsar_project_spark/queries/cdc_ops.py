"""Declared queries: CDC apply + SCD2 history (the warehouse data-plane
twins of the reference's in-memory upsert/delete state machine,
``manager.py`` task/topic mutation — SURVEY.md §2.2/§2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.operators.cdc import cdc_net_state, scd2_from_changes
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events

# Deterministic op assignment turning the event stream into a change
# log: every 11th change is a DELETE, every remaining 3rd an INSERT,
# the rest UPDATEs.
_OP_SQL = ("CASE WHEN event_id % 11 = 0 THEN 'D' "
           "WHEN event_id % 3 = 0 THEN 'I' ELSE 'U' END")


@declare(
    "cdc_apply_net_state",
    oracle=f"""
WITH log AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, {_OP_SQL} AS op,
         value, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_us DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes
  FROM log
)
SELECT user_id, value, event_type, op AS last_op,
       CAST(n_changes AS BIGINT) AS n_changes
FROM ranked WHERE rn = 1 AND op != 'D'
""",
)
def q_cdc_apply_net_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: reduce an insert/update/delete change log to the
    final table state — per key the highest-(seq, tiebreak) change
    wins, and a winning DELETE erases the key (users whose last change
    is a delete are absent from the result; the reference's dict after
    replay, as a relation). One hash shuffle with map-side ``max_by``
    partials — no window sort (operators/cdc.py)."""
    ev = load_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts_us").isNotNull()
        & F.col("event_id").isNotNull()
    )
    log = ev.select(
        "user_id", "ts_us", "event_id", "value", "event_type",
        F.expr(_OP_SQL).alias("op"),
    )
    return cdc_net_state(
        log, key="user_id", seq="ts_us", tiebreak="event_id",
        op="op", payload=["value", "event_type"],
    )


@declare(
    "scd2_user_type_history",
    oracle="""
WITH log AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), marked AS (
  SELECT *,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_us ASC, event_id ASC) AS prev
  FROM log
), eps AS (
  SELECT user_id, event_type, ts_us, event_id
  FROM marked WHERE prev IS NULL OR event_type != prev
)
SELECT user_id, event_type,
       ts_us AS valid_from,
       lead(ts_us) OVER (PARTITION BY user_id
                         ORDER BY ts_us ASC, event_id ASC) AS valid_to,
       CASE WHEN lead(ts_us) OVER (PARTITION BY user_id
                                   ORDER BY ts_us ASC, event_id ASC)
                 IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM eps
""",
)
def q_scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history: each user's event_type change stream becomes
    validity intervals — no-op (same-value) changes collapse, every
    episode carries (valid_from, valid_to, is_current). The historian
    twin of ``cdc_apply_net_state``: one keeps the final dict, this
    keeps every version with its lifetime. Both window passes share a
    single (key, seq, tiebreak) Exchange+Sort (operators/cdc.py)."""
    ev = load_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts_us").isNotNull()
        & F.col("event_id").isNotNull() & F.col("event_type").isNotNull()
    )
    log = ev.select("user_id", "ts_us", "event_id", "event_type")
    return scd2_from_changes(
        log, key="user_id", seq="ts_us", tiebreak="event_id",
        value="event_type",
    )
