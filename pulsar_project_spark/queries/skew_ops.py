"""Declared queries: explicit skew-mitigation and corpus-balancing ops.

``operators/skew.py salted_join`` was previously exercised only by unit
tests; `salted_segment_event_counts` makes it a driver-verified query —
the oracle is the PLAIN join's SQL, so the check proves the salted
rewrite is semantics-preserving end to end (the whole point of the
operator: same result, skew-proof shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_project_spark.operators.skew import salted_join
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table

_SALTED_SQL = """
SELECT c_mktsegment AS segment,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


@declare("salted_segment_event_counts", oracle=_SALTED_SQL)
def q_salted_segment_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts per customer market segment, computed through
    ``salted_join`` (events scattered across 16 deterministic sub-keys,
    the customer dim replicated ×16) and verified against the plain
    join's oracle — the salted rewrite must be invisible in the result.

    The test corpus isn't skewed; the operator is for the production
    case where one user_id holds a double-digit percent of events and
    AQE's split sizes can't save a single monster reducer. Outputs are
    integer-only (counts), so no float-order concern survives the
    regrouping.

    Scale shape: the big side shuffles on (user_id, salt) — hot keys
    spread over 16 reducers; the ×16 replicated dim is still tiny. The
    segment rollup is a low-cardinality second aggregate."""
    ev = load_events(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, dim, key="user_id", salt_col="event_id", n_salts=16)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


# --- Temperature-balanced sampling weights ------------------------------------
#
# Multilingual pre-training corpora resample low-resource languages up
# via p_lang ∝ n_lang^α (α=0.5 here). sqrt and a single division are
# both correctly-rounded IEEE ops, so the doubles are bit-identical
# across engines — no quantization needed.

_TEMP_SQL = """
WITH counts AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
)
SELECT lang, n_docs,
       sqrt(CAST(n_docs AS DOUBLE)) AS weight,
       sqrt(CAST(max(n_docs) OVER () AS DOUBLE) / n_docs) AS upsample_factor
FROM counts
"""


@declare("lang_sampling_weights", oracle=_TEMP_SQL)
def q_lang_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced (α=0.5) language sampling weights: each
    language's unnormalized weight √n and the upsampling factor
    √(n_max/n) that equalizes it with the largest language.

    Scale shape: one grouped count (5 groups, map-side partials), then
    a window max over the 5-row aggregate — free. Normalization into
    probabilities is left to the (driver-side, 5-row) consumer because
    a cross-engine float SUM is reduction-order-dependent; everything
    emitted here is a single correctly-rounded sqrt/div of exact
    integers."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()
    return counts.select(
        "lang",
        "n_docs",
        F.sqrt(F.col("n_docs").cast("double")).alias("weight"),
        F.sqrt(
            F.max("n_docs").over(w).cast("double") / F.col("n_docs")
        ).alias("upsample_factor"),
    )


_SKEW_CENSUS_SQL = """
WITH per_key AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM per_key)
SELECT user_id, n,
       CAST(n AS DOUBLE) / total AS share,
       CAST(n * n_keys AS BIGINT) AS n_times_keys,
       total
FROM per_key, tot
ORDER BY n DESC, user_id ASC
LIMIT 10
"""


@declare("skew_key_census", oracle=_SKEW_CENSUS_SQL)
def q_skew_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis: the 10 heaviest join keys with their share of
    total rows and n·|keys| (the uniform-multiple — a key is "hot" when
    this far exceeds the total). This census is the decision input for
    the salted_join lever: salt when the top key's share makes one
    reducer the critical path. share = one BIGINT/BIGINT double
    division; everything else integer.

    Scale shape: one grouped count, a 1-row total broadcast onto the
    tiny per-key aggregate, TakeOrdered top-10."""
    ev = load_events(spark, sf_dir)
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    tot = per_key.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count("*").alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id", "n",
            (F.col("n").cast("double") / F.col("total")).alias("share"),
            (F.col("n") * F.col("n_keys")).cast("bigint").alias("n_times_keys"),
            "total",
        )
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
    )


@declare(
    "join_cardinality_forecast",
    oracle="""
WITH a AS (SELECT o_custkey AS k, count(*) AS c FROM orders
           WHERE o_custkey IS NOT NULL GROUP BY 1),
b AS (SELECT c_custkey AS k, count(*) AS c FROM customer
      WHERE c_custkey IS NOT NULL GROUP BY 1)
SELECT CAST(sum(a.c * b.c) AS BIGINT) AS join_rows,
       count(*) AS n_common_keys,
       CAST(max(a.c * b.c) AS BIGINT) AS max_key_rows
FROM a JOIN b ON a.k = b.k
""",
)
def q_join_cardinality_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle join-size forecast: |A ⋈ B| = Σ_k cA(k)·cB(k) over
    the per-key histograms, plus the hottest key's output share — the
    exact numbers a planner needs to size shuffle partitions or decide
    salting BEFORE paying for the join (the skew_key_census companion,
    applied to the two-sided case). Histograms are mergeable count
    aggregates (map-side partials), so the forecast costs two skinny
    aggregates and a histogram-sized equi-join — never the join
    itself."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull())
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey").isNotNull())
    a = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("ca"))
    b = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count("*").alias("cb"))
    return a.join(b, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("join_rows"),
        F.count("*").alias("n_common_keys"),
        F.max(F.col("ca") * F.col("cb")).cast("bigint").alias("max_key_rows"),
    )


_BUCKETED_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@declare("bucketed_cojoin_rollup", oracle=_BUCKETED_SQL)
def q_bucketed_cojoin_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time pre-shuffle, executed end to end as a declared query:
    both join sides land as BUCKETED tables on the join key
    (``operators/skew.py write_bucketed`` — bucketBy(8, orderkey) +
    sortBy), then the fact-fact join runs on the bucketed storage with
    a merge hint and NO Exchange on either side (the property
    `tests/test_skew_and_bucketing.py` pins on the plan; this query
    makes the full write → catalog read → co-located join → rollup
    path driver-hash-verified against the plain-join oracle). The
    merge hint — not a session-conf flip — keeps the tiny test corpus
    from taking the broadcast path that would bypass the bucketed
    join entirely; the driver's session is never mutated.

    Scale shape: THE pattern for a fact-fact join both of whose sides
    are too big to broadcast and which runs repeatedly (daily rollups
    over the same keys): pay the shuffle ONCE at write time, then every
    subsequent join/agg on orderkey is exchange-free — at 100 TB the
    recurring saving is the entire fact-fact shuffle, per run."""
    import os
    import tempfile

    from pulsar_project_spark.operators.skew import write_bucketed

    base = os.path.join(tempfile.gettempdir(),
                        f"spark_graft_bucketed_{os.getpid()}")
    li_tbl, od_tbl = f"bjoin_li_{os.getpid()}", f"bjoin_od_{os.getpid()}"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("cents"))
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    write_bucketed(li, li_tbl, "l_orderkey", 8, sort_col="l_orderkey",
                   path=os.path.join(base, "li"))
    write_bucketed(od, od_tbl, "l_orderkey", 8, sort_col="l_orderkey",
                   path=os.path.join(base, "od"))
    return (
        spark.table(li_tbl)
        .join(spark.table(od_tbl).hint("merge"), "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"),
             F.sum("cents").alias("revenue_cents"))
    )
