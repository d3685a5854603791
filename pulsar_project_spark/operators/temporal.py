"""Temporal join operators: as-of and range/attribution joins.

The reference has no general join operator at all (SURVEY.md §2.3 —
every lookup is a dict probe), but its data model is event-ordered
(messages, logs, records), and the canonical event-stream questions —
"state as of this moment", "activity within this window" — need the
two join shapes Spark lacks as built-ins:

* **as-of join** — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as the UNION + WINDOW
  sort-merge: tag sides, union, one window pass per key ordered by
  (ts, side, tiebreak) carrying ``last(right_payload, ignorenulls)``
  forward, keep left rows. ONE shuffle+sort on (key, ts) — no join
  node, no per-row probe, scales as a sort. (A broadcast-range or
  bucketed implementation only wins when one side is tiny; this form
  is the 100 TB default.)
* **range join** — left rows matched to right rows within a time
  interval, equi-keyed: expressed as an equi-join on the key with the
  range as a residual condition — Catalyst executes the equi hash/sort
  join and applies the band filter on matches; skew on hot keys is
  AQE's problem (skewJoin enabled in our session factory).

Determinism: ties at equal ts resolve by a caller-named tiebreak
column on the right side (max wins), matching the deduped-right ASOF
semantics the DuckDB oracle replays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              payload: list[str], tiebreak: str) -> DataFrame:
    """Left as-of join: latest right row (by ``ts``, ties → max
    ``tiebreak``) at-or-before each left row's ``ts``, per ``key``.

    Ties (several right rows at one (key, ts)) resolve to max
    ``tiebreak`` WITHOUT a pre-dedup pass: the merge window orders by
    (ts, side, tiebreak), so among equal-ts right rows the max-tiebreak
    one sorts last and ``last(...)`` carries it — equivalent to the
    oracle's ASOF JOIN against a max-tiebreak-deduped right side, in
    ONE shuffle+sort instead of two."""
    l_tagged = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("__side"),
        F.col(tiebreak).alias("__tb") if tiebreak in left.columns
        else F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
    )
    r_tagged = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType
        ).alias("__l"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    merged = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts → "<=" semantics;
    # tiebreak asc → max tiebreak is the carried (last) right row
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "__side", "__l",
        *[F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__p_{c}") for c in payload],
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    return carried.filter(F.col("__side") == 1).select(
        *out_cols, *[F.col(f"__p_{c}").alias(f"asof_{c}") for c in payload]
    )


def interval_join_bucketed(intervals: DataFrame, points: DataFrame,
                           start: str, end: str, ts: str,
                           bucket_us: int) -> DataFrame:
    """KEYLESS interval containment join — match every point row whose
    ``ts`` falls in ``[start, end]`` of every interval row — rewritten
    as a hash equi-join on a coarse time bucket.

    The naive form (``ON p.ts BETWEEN i.start AND i.end`` with no
    equality conjunct) gives Catalyst nothing to hash on, so it plans a
    BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons,
    the plan-audit-banned shape that dies first at 100 TB. Instead:

    * each interval EXPLODES to the buckets it overlaps
      (``sequence(start div B, end div B)`` — ``ceil(len/B)+1`` rows,
      a constant ≤ 2 when ``B >= end - start``);
    * each point lands in exactly ONE bucket (``ts div B``), so no
      match can duplicate and no post-join dedup is needed;
    * the join is a plain equi hash join on the BIGINT bucket with the
      containment predicate as a residual filter — broadcastable when
      the interval side is small, shuffle-partitionable when it isn't,
      and AQE-skewable either way.

    Row semantics are EXACT, not aggregate-only: the match runs as an
    INNER equi join (so an interval exploded over several buckets never
    emits phantom NULL rows from its empty buckets), and intervals with
    no point anywhere are re-added with NULL point columns via a
    null-safe left_anti against the distinct matched interval rows —
    one extra exchange on the (small) interval side, bought for
    ``count(*)``/row-level consumers being correct, not just
    ``count(col)``. Caller contract: ``start``/``end``/``ts`` are
    non-negative BIGINTs (epoch micros) — ``div`` truncation equals
    floor there, matching the oracle's ``//``."""
    iv = intervals.withColumn(
        "__bucket",
        # greatest(start, 0): a window reaching left of the epoch keeps
        # its true (negative) start for the residual predicate, but the
        # bucket walk starts at 0 — no point can sit in a negative
        # bucket, and clamping keeps `div` truncation == floor.
        F.explode(F.sequence(F.expr(f"greatest({start}, 0) div {bucket_us}"),
                             F.expr(f"{end} div {bucket_us}"))),
    )
    pt = points.withColumn("__bucket", F.expr(f"{ts} div {bucket_us}"))
    matched = iv.alias("i").join(
        pt.alias("p"),
        (F.col("i.__bucket") == F.col("p.__bucket"))
        & (F.col(f"p.{ts}") >= F.col(f"i.{start}"))
        & (F.col(f"p.{ts}") <= F.col(f"i.{end}")),
        "inner",
    ).select(
        *[F.col(f"i.{c}").alias(c) for c in intervals.columns],
        *[F.col(f"p.{c}").alias(f"p_{c}") for c in points.columns],
    )
    # re-add intervals that matched NOWHERE (null-safe equality so an
    # interval row carrying NULL attributes still anti-joins correctly;
    # Catalyst plans <=> as an equi hash-join key, no BNLJ)
    hit = matched.select(*intervals.columns).distinct()
    anti_cond = None
    for c in intervals.columns:
        e = F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        anti_cond = e if anti_cond is None else (anti_cond & e)
    missed = intervals.alias("a").join(hit.alias("b"), anti_cond, "left_anti").select(
        *[F.col(f"a.{c}").alias(c) for c in intervals.columns],
        *[F.lit(None).cast(points.schema[c].dataType).alias(f"p_{c}")
          for c in points.columns],
    )
    return matched.unionByName(missed)


def range_attribution(left: DataFrame, right: DataFrame, key: str, ts: str,
                      lookback: int, agg_cols: list[Column]) -> DataFrame:
    """Per left row, aggregate right rows with
    ``left.ts - lookback <= right.ts <= left.ts`` on the same key
    (e.g., clicks attributed to a purchase within the window). Left
    rows with no matches survive with zero/null aggregates."""
    lt, rt = F.col(f"l.{ts}"), F.col(f"r.{ts}")
    joined = left.alias("l").join(
        right.alias("r"),
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt >= lt - lookback) & (rt <= lt),
        "left",
    )
    return joined.groupBy(*[F.col(f"l.{c}").alias(c) for c in left.columns]).agg(*agg_cols)
