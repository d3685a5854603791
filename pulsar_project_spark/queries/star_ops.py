"""Declared queries: star-schema and incremental-maintenance shapes.

The multi-dimension star join is THE 100 TB warehouse query shape (one
fact scan, every dimension broadcast); the mergeable-state query proves
the partial-aggregate algebra that incremental view maintenance and
multi-stage reduction both rely on (merge(agg(A), agg(B)) == agg(A∪B)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table

_STAR_SQL = """
SELECT r_name AS region,
       c_mktsegment AS segment,
       strftime(o_orderdate, '%Y-%m') AS order_month,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, c_mktsegment, strftime(o_orderdate, '%Y-%m')
"""


@declare("star_revenue_region_segment_month", oracle=_STAR_SQL)
def q_star_revenue_region_segment_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-dimension star rollup: revenue by region × market segment
    × order month. Revenue sums in exact integer cents (the proven
    round(x*100)-to-BIGINT pattern from orders_above_priority_mean —
    reduction-order-independent, HUGEINT-immune via the outer CAST).

    Scale shape: ONE pass over the fact table; customer/nation/region
    all broadcast (declared in BROADCAST_TABLES), so the only shuffle
    is the final low-cardinality (5×5×~24 cells) aggregate with
    map-side partials. This is the plan a 100 TB fact table wants — no
    fact-side join shuffle at all."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("segment"),
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).alias("revenue_cents"),
        )
    )


# --- Mergeable partial aggregates (incremental view maintenance) --------------
#
# Split the fact stream into two halves (old state / new delta),
# aggregate each independently, then MERGE the partials — count adds,
# sum adds, min/max fold. The oracle aggregates the union directly:
# equality proves the merge algebra, the property that makes
# incremental maintenance (and Spark's own two-phase aggregation)
# correct.

_MERGE_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


@declare("mergeable_state_rollup", oracle=_MERGE_SQL)
def q_mergeable_state_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-maintenance algebra, end to end: events are split
    into two disjoint batches (even/odd event_id — standing in for
    "yesterday's materialized state" and "today's delta"), each batch
    is aggregated independently, and the two partial states are merged
    (counts add, min/max fold, distinct-user sets union via a re-count
    over the union of per-batch distinct pairs). The oracle aggregates
    the unsplit input — equality IS the merge-correctness proof.

    COUNT DISTINCT is the one non-trivially-mergeable aggregate: the
    partial state must be the distinct (type, user) pairs, not a
    number. The exact pair-set here is what HLL sketches replace at
    100 TB (approx_distinct_users covers that); both mergeable, one
    exact and one bounded-memory.

    Scale shape: two grouped aggregates + a pair-set union re-count —
    all map-side-partial shuffles on low-cardinality keys."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "event_type", "user_id", "ts_us"
    )
    halves = []
    pair_halves = []
    for parity in (0, 1):
        part = ev.filter(F.pmod(F.col("event_id"), F.lit(2)) == parity)
        halves.append(
            part.groupBy("event_type").agg(
                F.count("*").alias("n_events"),
                F.min("ts_us").alias("first_us"),
                F.max("ts_us").alias("last_us"),
            )
        )
        pair_halves.append(part.select("event_type", "user_id").distinct())
    merged = (
        halves[0].unionByName(halves[1])
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
        )
    )
    users = (
        pair_halves[0].unionByName(pair_halves[1])
        .distinct()
        .groupBy("event_type")
        # count the COLUMN, not the rows: a (type, NULL-user) pair
        # survives the distinct, but COUNT DISTINCT user_id ignores
        # NULLs in both engines — found by the NULL sweep
        .agg(F.count("user_id").alias("n_users"))
    )
    # null-safe equality: a NULL event_type is a legitimate group key
    # (GROUP BY keeps it in both engines), but a plain join on the key
    # drops it (NULL <> NULL) — the merge must preserve every group
    merged_u = users.withColumnRenamed("event_type", "event_type_u")
    return (
        merged.join(
            merged_u,
            merged["event_type"].eqNullSafe(merged_u["event_type_u"]),
        )
        .select("event_type", "n_events", "first_us", "last_us", "n_users")
    )


# --- Cumulative user acquisition ---------------------------------------------

_CUMUSERS_SQL = """
WITH firsts AS (
  SELECT user_id, CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT first_day AS day, count(*) AS new_users FROM firsts GROUP BY first_day
)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily
"""


@declare("cumulative_new_users_by_day", oracle=_CUMUSERS_SQL)
def q_cumulative_new_users_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count by day — the growth-curve query.
    Naive cumulative COUNT DISTINCT re-scans history per day; this is
    the scalable rewrite: min(first-seen day) per user (one shuffle),
    daily new-user counts, then a running sum over the ~30-row daily
    series. Day buckets are integer micros DIV 86400e6 — no timezone,
    no float.

    Scale shape: the only data-sized shuffle is the per-user min; the
    window runs over the tiny daily aggregate (single partition is fine
    at any corpus size — it's one row per day)."""
    ev = load_events(spark, sf_dir)
    from pyspark.sql.window import Window

    firsts = (
        ev.select("user_id", F.expr("ts_us div 86400000000").alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


# --- Snapshot diff (CDC-shaped full-outer compare) ---------------------------

_DIFF_SQL = """
WITH s1 AS (
  SELECT user_id, count(*) AS n FROM events
  WHERE epoch_us(ts) // 86400000000 - 19723 < 15
  GROUP BY user_id
),
s2 AS (
  SELECT user_id, count(*) AS n FROM events
  WHERE epoch_us(ts) // 86400000000 - 19723 >= 15
  GROUP BY user_id
)
SELECT CASE WHEN s1.user_id IS NULL THEN 'added'
            WHEN s2.user_id IS NULL THEN 'removed'
            WHEN s1.n = s2.n THEN 'same'
            ELSE 'changed' END AS status,
       count(*) AS n_keys
FROM s1 FULL JOIN s2 ON s1.user_id = s2.user_id
GROUP BY 1
"""


@declare("snapshot_diff_counts", oracle=_DIFF_SQL)
def q_snapshot_diff_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-shaped snapshot diff: per-user event counts in the first 15
    days vs the rest of the corpus, FULL OUTER joined on the key and
    classified added / removed / changed / same — the audit every
    incremental ingestion pipeline runs between yesterday's and today's
    materialized state. (Day 19723 = 2024-01-01 in epoch-days; the
    corpus starts there.)

    Scale shape: both snapshot aggregates and the full-outer join
    share the user_id shuffle; the classification rollup is 4 rows.
    FULL OUTER can't broadcast (both sides must surface unmatched
    rows) — the shuffle join IS the right plan, and this query is the
    engine's coverage proof for it."""
    ev = load_events(spark, sf_dir)
    day = F.expr("ts_us div 86400000000") - 19723
    base = ev.select("user_id", day.alias("day"))
    s1 = base.filter(F.col("day") < 15).groupBy("user_id").agg(
        F.count("*").alias("n1"))
    s2 = base.filter(F.col("day") >= 15).groupBy("user_id").agg(
        F.count("*").alias("n2"))
    joined = s1.withColumnRenamed("user_id", "u1").join(
        s2.withColumnRenamed("user_id", "u2"),
        F.col("u1") == F.col("u2"), "full_outer",
    )
    status = (
        F.when(F.col("u1").isNull(), "added")
        .when(F.col("u2").isNull(), "removed")
        .when(F.col("n1") == F.col("n2"), "same")
        .otherwise("changed")
    )
    return joined.groupBy(status.alias("status")).agg(
        F.count("*").alias("n_keys"))


_IVM_JOIN_SQL = """
SELECT n.n_name,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


@declare("join_view_incremental_maintenance", oracle=_IVM_JOIN_SQL)
def q_join_view_incremental_maintenance(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized JOIN view — the
    algebra `mergeable_state_rollup` proves for single-table
    aggregates, extended to the join case: with orders split into a
    base A and a delta ΔA, and customers into B and ΔB (md5-hash
    splits standing in for "the materialized state" and "today's
    ingest"), the refreshed view is

        (A⋈B) ∪ (ΔA⋈B) ∪ (A⋈ΔB) ∪ (ΔA⋈ΔB)

    — the three delta terms are what an IVM engine computes INSTEAD of
    rescanning A⋈B. The oracle is the direct full recompute over the
    unsplit tables, so hash equality proves the delta-propagation
    identity exactly (a missed cross term, a double-counted pair, or a
    delta joined against the wrong generation all break it). Sums are
    exact integer cents, so the four partial aggregates merge
    reduction-order-independently.

    Scale shape: each of the four terms is an equi-join on custkey
    sharing one partitioning; the per-term partial aggregates merge in
    a final low-cardinality (25-nation) rollup — at 100 TB only the
    delta terms are actually recomputed, and their cost scales with
    ǀΔǀ, not ǀAǀ."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # md5-hex split (the repo-wide membership rule: never a seeded RNG)
    o_delta = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)\
        .isin(*"0123")
    c_delta = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1)\
        .isin(*"01")
    a, da = orders.filter(~o_delta), orders.filter(o_delta)
    b, db = cust.filter(~c_delta), cust.filter(c_delta)

    def term(o_side, c_side):
        return (
            o_side.join(c_side, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(nation),
                  F.col("n_nationkey") == F.col("c_nationkey"))
            .groupBy("n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                 .alias("revenue_cents"))
        )

    terms = (term(a, b).unionByName(term(da, b))
             .unionByName(term(a, db)).unionByName(term(da, db)))
    return (
        terms.groupBy("n_name")
        .agg(F.sum("n_orders").alias("n_orders"),
             F.sum("revenue_cents").alias("revenue_cents"))
    )


_RETRACT_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(coalesce(CAST(round(value * 100) AS BIGINT), 0))
            AS BIGINT) AS sum_cents
FROM events
WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
      NOT IN ('0', '1', '2', '3')
GROUP BY user_id
"""


@declare("retractable_agg_view_census", oracle=_RETRACT_SQL)
def q_retractable_agg_view_census(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Retraction-capable aggregate view — the DBSP / Z-set weighted
    changelog, the piece `mergeable_state_rollup` (insert-only merges)
    and `join_view_incremental_maintenance` (insert-only deltas) leave
    open: DELETES. Every event enters the changelog with weight +1;
    the md5-designated quarter is later retracted with weight −1 (each
    input row EXPLODES to its weighted entries — one scan, no separate
    delete-stream rescan). The view is Σw and Σ(w·cents) per user, and
    a group whose net weight reaches 0 VANISHES (the `HAVING Σw > 0`
    that linear-aggregate IVM engines apply). The oracle recomputes
    directly over the surviving rows, so hash equality proves the
    retraction algebra: a missed cancellation, a NULL-asymmetric
    measure, or a lingering all-retracted group all break it. The
    measure is coalesce(cents, 0) on BOTH sides — a NULL measure would
    cancel asymmetrically (sum ignores the NULL insert but the paired
    retraction would still subtract 0 ≠ NULL semantics across engines).

    Scale shape: one narrow scan, a ≤2-element array explode (never a
    blow-up), one groupBy shuffle with map-side partials — retraction
    costs exactly one extra weighted row per delete, |Δ| not |base|."""
    ev = load_table(spark, sf_dir, "events")
    retracted = F.substring(
        F.md5(F.col("event_id").cast("string")), 1, 1).isin(*"0123")
    cents = F.coalesce(
        F.round(F.col("value") * 100).cast("bigint"), F.lit(0))
    log = ev.select(
        "user_id", cents.alias("c"),
        F.explode(
            F.when(retracted, F.array(F.lit(1), F.lit(-1)))
            .otherwise(F.array(F.lit(1)))
        ).alias("w"),
    )
    return (
        log.groupBy("user_id")
        .agg(F.sum("w").alias("n_events"),
             F.sum(F.col("w") * F.col("c")).alias("sum_cents"))
        .filter(F.col("n_events") > 0)
    )
