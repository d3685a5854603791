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


_CDC_NET_SQL = f"""
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
"""


@declare("cdc_apply_net_state", oracle=_CDC_NET_SQL)
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


# Time-travel cut: median event time of the corpus window — a fixed
# fraction of the log replayed, so the snapshot differs from the net
# state and both I/U/D winners occur on either side of the cut.
# floor() BEFORE the BIGINT cast on BOTH sides: a .5-valued median is
# possible (even count, odd middle-pair sum), and CAST(double AS
# BIGINT) truncates in Spark but ROUNDS in DuckDB — an event sitting
# exactly at the rounded-up boundary would diverge the snapshot.
_SNAPSHOT_CUT_SQL = ("(SELECT CAST(floor(median(epoch_us(ts))) AS BIGINT) "
                     "FROM events)")


@declare(
    "cdc_snapshot_at_time",
    oracle=f"""
WITH cut AS (SELECT {_SNAPSHOT_CUT_SQL} AS cut_us),
log AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, {_OP_SQL} AS op,
         value, event_type
  FROM events, cut
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
    AND epoch_us(ts) <= cut.cut_us
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
def q_cdc_snapshot_at_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the change log: the table state as of an
    arbitrary past instant (here the corpus's median event time, so
    the cut always bisects the log) — filter the log to seq ≤ cut,
    then the same one-shuffle ``max_by`` reduce as ``cdc_apply_net_
    state``. This is the Delta/Iceberg ``VERSION AS OF`` semantics
    built from the log relation itself: no snapshot files needed,
    any instant reconstructible, and the filter prunes at the scan.
    The cut is computed as a 1-row broadcast, never collected."""
    ev = load_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts_us").isNotNull()
        & F.col("event_id").isNotNull()
    )
    cut = load_events(spark, sf_dir).agg(
        F.floor(F.percentile(F.col("ts_us"), F.lit(0.5))).cast("bigint")
        .alias("cut_us")
    )
    log = (
        ev.crossJoin(F.broadcast(cut))
        .filter(F.col("ts_us") <= F.col("cut_us"))
        .select(
            "user_id", "ts_us", "event_id", "value", "event_type",
            F.expr(_OP_SQL).alias("op"),
        )
    )
    return cdc_net_state(
        log, key="user_id", seq="ts_us", tiebreak="event_id",
        op="op", payload=["value", "event_type"],
    )
