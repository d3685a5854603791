"""Change-data-capture operators: net-state apply and SCD2 derivation.

The reference's state plane is "apply every mutation in arrival order
to an in-memory dict" (``manager.py`` task/topic upserts — SURVEY.md
§2.2/§2.9). At 100 TB the same semantics arrive as a CHANGE LOG
(insert/update/delete rows with a sequence) and must be reduced
relationally:

* ``cdc_net_state`` — the dict's final contents: per key, the
  highest-sequence change wins; a delete erases the key. ONE grouped
  ``max_by`` over a sortable struct (no window, no full sort — the
  same shuffle-light argmax shape as ``latest_event_argmax``).
* ``scd2_from_changes`` — the warehouse-historian twin: instead of
  the final dict, every value's VALIDITY INTERVAL (valid_from,
  valid_to, is_current), consecutive same-value changes collapsed.
  Two window passes over one (key, seq) sort: lag to drop no-op
  changes, lead to close intervals.

Determinism: sequence ties resolve by a caller-named tiebreak column,
and both operators state their plans in ANSI SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cdc_net_state(changes: DataFrame, key: str, seq: str, tiebreak: str,
                  op: str, payload: list[str]) -> DataFrame:
    """Final state after applying the whole change log: per ``key`` the
    (seq, tiebreak)-max row wins; keys whose winning op is a delete
    vanish. Emits (key, payload..., last_op, n_changes).

    Scale: ONE exchange on the key; struct-max rules out Tungsten hash
    aggregation (Spark plans SortAggregate) but partial aggregation
    still runs map-side, so the shuffle carries one row per (partition,
    key) — unlike the window form, which ships every change row
    through a full partition sort."""
    winner = F.max(
        F.struct(F.col(seq), F.col(tiebreak), F.col(op).alias("__op"),
                 *[F.col(c).alias(f"__p_{c}") for c in payload])
    ).alias("w")
    agg = changes.groupBy(key).agg(winner, F.count("*").alias("n_changes"))
    return (
        agg.filter(F.col("w.__op") != "D")
        .select(
            key,
            *[F.col(f"w.__p_{c}").alias(c) for c in payload],
            F.col("w.__op").alias("last_op"),
            "n_changes",
        )
    )


def scd2_from_changes(changes: DataFrame, key: str, seq: str,
                      tiebreak: str, value: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream:
    one row per (key, value episode) with ``valid_from`` = the episode's
    first change sequence, ``valid_to`` = the next episode's start (NULL
    while current), ``is_current`` flag. Consecutive changes carrying
    the SAME value collapse into one episode (the warehouse-standard
    no-op suppression).

    Scale: a single (key, seq, tiebreak) sort feeds both window
    passes — Catalyst reuses one Exchange+Sort for lag and lead."""
    w = Window.partitionBy(key).orderBy(F.col(seq).asc(), F.col(tiebreak).asc())
    marked = changes.select(
        key, seq, tiebreak, value,
        F.lag(value).over(w).alias("__prev"),
    ).filter(
        F.col("__prev").isNull() | (F.col(value) != F.col("__prev"))
    )
    w2 = Window.partitionBy(key).orderBy(F.col(seq).asc(), F.col(tiebreak).asc())
    return marked.select(
        key,
        F.col(value),
        F.col(seq).alias("valid_from"),
        F.lead(seq).over(w2).alias("valid_to"),
        F.when(F.lead(seq).over(w2).isNull(), 1).otherwise(0)
         .alias("is_current"),
    )
