"""Declared queries: relational-surface breadth — PIVOT, set operations
(INTERSECT/EXCEPT), and blocked edit-distance fuzzy matching.

SURVEY.md §2.6 notes the reference only ever needs union+last-wins and
a stopword difference; a complete engine exposes the full set-op family.
The fuzzy matcher is the edit-distance cousin of the dedup family
(§2.11): candidate pairs from a cheap blocking key, exact Levenshtein
confirm — never O(n²) across the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_COLS_SQL = ", ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in _EVENT_TYPES
)


@declare(
    "pivot_event_type_by_day",
    oracle=f"""
SELECT strftime(ts, '%Y-%m-%d') AS day, {_PIVOT_COLS_SQL}
FROM events GROUP BY day
""",
)
def q_pivot_event_type_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (never inferred — inference
    needs an extra pass over the data AND makes the output schema
    data-dependent, both wrong at 100 TB). One shuffle on the day key;
    missing cells coalesce to 0 to match COUNT FILTER semantics."""
    ev = load_events(spark, sf_dir)
    pv = (
        ev.withColumn(
            "day", F.date_format(F.timestamp_micros(F.col("ts_us")), "yyyy-MM-dd")
        )
        .groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    return pv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES]
    )


def _user_days(ev: DataFrame, etype: str) -> DataFrame:
    return ev.filter(F.col("event_type") == etype).select(
        "user_id",
        F.date_format(F.timestamp_micros(F.col("ts_us")), "yyyy-MM-dd").alias("day"),
    )


@declare(
    "except_click_days_no_purchase",
    oracle="""
SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'purchase'
""",
)
def q_except_click_days_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) on a composite key: (user, day) pairs that
    clicked but never purchased that day. Both branch filters push to
    the scan; Spark plans an aggregate + anti-join on the pair key."""
    ev = load_events(spark, sf_dir)
    return _user_days(ev, "click").subtract(_user_days(ev, "purchase"))


@declare(
    "intersect_click_and_purchase_days",
    oracle="""
SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'purchase'
""",
)
def q_intersect_click_and_purchase_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): (user, day) pairs that both clicked and
    purchased — semi-join shape."""
    ev = load_events(spark, sf_dir)
    return _user_days(ev, "click").intersect(_user_days(ev, "purchase"))


_FUZZY_MAX_DIST = 12
_FUZZY_MAX_BLOCK = 10000  # mega-block guard, same cap as the LSH buckets


@declare(
    "fuzzy_part_name_pairs",
    oracle=f"""
WITH qual AS (
  SELECT p_brand, p_size FROM part
  GROUP BY p_brand, p_size HAVING count(*) <= {_FUZZY_MAX_BLOCK}
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
JOIN qual q ON a.p_brand = q.p_brand AND a.p_size = q.p_size
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
""",
)
def q_fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: (brand, size) is the blocking key —
    pairs only form inside a block, so the Levenshtein DP (the expensive
    kernel) runs on block-local candidates, not n². Classic record-
    linkage shape. Blocks over {_FUZZY_MAX_BLOCK} rows are dropped
    before the self-join (the same mega-bucket guard as the LSH
    candidate join, mirrored in the oracle) so one degenerate blocking
    key can't go quadratic at scale; a production pipeline would route
    dropped mega-blocks through a secondary blocking key instead.
    Levenshtein is integer DP — identical across engines."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_name"
    )
    qual = (
        part.groupBy("p_brand", "p_size")
        .agg(F.count("*").alias("__bn"))
        .filter(F.col("__bn") <= _FUZZY_MAX_BLOCK)
        .drop("__bn")
    )
    blocked = part.join(qual, ["p_brand", "p_size"])
    a = blocked.select(
        F.col("p_brand"), F.col("p_size"),
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"),
    )
    b = blocked.select(
        F.col("p_brand"), F.col("p_size"),
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"),
    )
    return (
        a.join(b, ["p_brand", "p_size"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a", "key_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .filter(F.col("dist") <= _FUZZY_MAX_DIST)
    )


_BIN_W = 10.0  # histogram bin width over event value


@declare(
    "value_histogram_by_type",
    oracle=f"""
SELECT event_type, CAST(floor(value / {_BIN_W}) AS BIGINT) AS bin,
       count(*) AS n
FROM events GROUP BY event_type, bin
""",
)
def q_value_histogram_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bin id = floor(v/w) — integer, exact, one
    shuffle on (type, bin). The distribution-sketch pass a pipeline runs
    per feature column (the approx twin is value_percentiles_sketch)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / _BIN_W).cast("bigint").alias("bin"),
        )
        .agg(F.count("*").alias("n"))
    )


@declare(
    "parts_no_bulk_order",
    oracle="""
SELECT p.p_partkey, p.p_brand
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45
)
""",
)
def q_parts_no_bulk_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join: parts never ordered in bulk.
    The quantity predicate pushes into the lineitem scan BEFORE the
    anti-join, so the probe side shrinks 10× at the scan."""
    part = load_table(spark, sf_dir, "part")
    bulk = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 45
    ).select("l_partkey")
    return part.join(
        bulk, part["p_partkey"] == bulk["l_partkey"], "left_anti"
    ).select("p_partkey", "p_brand")


@declare(
    "orders_above_priority_mean",
    oracle="""
WITH m AS (
  SELECT o_orderpriority, count(*) AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice
FROM orders o JOIN m ON o.o_orderpriority = m.o_orderpriority
WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * m.n > m.s
""",
)
def q_orders_above_priority_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Above the group mean' WITHOUT a float mean: compare
    cents·n > Σcents in exact integers (a float avg is reduction-order-
    dependent — the same discipline as user_value_trend). Plans as one
    agg + one broadcast join of the 5-row group table."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    m = o.select("o_orderpriority", cents.alias("c")).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("c").alias("s")
    )
    return (
        o.join(F.broadcast(m), "o_orderpriority")
        .filter(cents * F.col("n") > F.col("s"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )


# --- Semi-join / HAVING breadth (TPC-H Q4/Q18 analogs) ----------------------

_LATE_SHIP_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


@declare("late_shipment_priority_counts", oracle=_LATE_SHIP_SQL)
def q_late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (no commitdate column in this schema, so "late"
    = any lineitem shipped >60 days after the order date): order counts
    per priority where at least one late line EXISTS. The EXISTS
    decorrelates to a LEFT SEMI join — each order emitted at most once
    no matter how many late lines it has.

    Scale shape: semi join shuffles both sides on orderkey once; the
    aggregate that follows is low-cardinality (5 priorities) with
    map-side partials."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


_BIG_ORDER_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 180
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@declare("big_order_customers", oracle=_BIG_ORDER_SQL)
def q_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: customers holding an order whose total quantity
    exceeds 180 units. Quantities are integral doubles, so the sum is
    taken over BIGINT — exact, reduction-order-independent, and immune
    to the HUGEINT oracle pitfall (outer CAST).

    Scale shape: the HAVING aggregate reduces lineitem to the rare big
    orders BEFORE any join; those few rows then join orders on the
    aggregation key (no re-shuffle under AQE) and the customer dim
    broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


_ORDER_DIST_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS n_customers
FROM per_cust GROUP BY c_count
"""


@declare("customer_order_count_distribution", oracle=_ORDER_DIST_SQL)
def q_customer_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: the distribution of orders-per-customer,
    including zero-order customers (LEFT join + count of the nullable
    key counts only matched rows). Both counts are engine-native BIGINT
    — no HUGEINT exposure.

    Scale shape: the join and the per-customer count share the custkey
    shuffle; the distribution rollup is a tiny second aggregate with
    map-side partials."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_customers"))


_ABOVE_CUST_AVG_SQL = """
WITH stats AS (
  SELECT o_custkey AS k, count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
  FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o JOIN stats ON o.o_custkey = stats.k
WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * stats.n > stats.s
"""


@declare("orders_above_customer_avg", oracle=_ABOVE_CUST_AVG_SQL)
def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery shape — "orders above their OWN
    customer's average" — decorrelated the way Catalyst does it: the
    per-customer aggregate joins back on the correlation key. The
    comparison is exact integer cross-multiplication (cents·n > Σcents),
    never a float average.

    Scale shape: aggregate and join share the custkey shuffle (no
    re-exchange under AQE); output is filter-pruned before projection."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    stats = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("n"), F.sum(cents).alias("s")
    )
    return (
        orders.join(stats, orders.o_custkey == stats.k)
        .filter(cents * F.col("n") > F.col("s"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_EXCEPT_ALL_SQL = """
SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
FROM events WHERE event_type = 'click'
EXCEPT ALL
SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
FROM events WHERE event_type = 'purchase'
"""


@declare("except_all_click_days", oracle=_EXCEPT_ALL_SQL)
def q_except_all_click_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference with multiplicity (a (user, day) with
    3 clicks and 1 purchase survives twice), the multiset cousin of the
    distinct EXCEPT already covered. Exercises Spark's exceptAll
    rewrite (count-tagged aggregate + generate).

    Scale shape: one shuffle on the pair key with counted partials —
    no row-by-row anti join."""
    ev = load_events(spark, sf_dir)
    day = F.expr("ts_us div 86400000000").alias("day")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", day)
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.exceptAll(buys)


_FACT_FACT_SQL = """
SELECT o.o_orderpriority,
       count(*) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS line_revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@declare("fact_fact_smj_rollup", oracle=_FACT_FACT_SQL)
def q_fact_fact_smj_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-to-fact join (lineitem ⨝ orders — at 100 TB, THE
    shuffle) executed deliberately as a sort-merge join via the merge
    hint: neither side of a fact-fact join broadcasts, so SMJ with
    co-partitioned shuffles is the correct plan, and pre-bucketing both
    tables on orderkey (operators/skew.py write_bucketed) amortizes
    this exchange across every downstream query.

    Scale shape: both sides shuffle once on the join key; the rollup's
    5-priority aggregate reuses nothing data-sized. Revenue in exact
    integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        li.hint("merge")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(cents).alias("line_revenue_cents"),
        )
    )


_RI_RELATIONS = (
    # (name, fact, fk, dim, pk)
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)

_RI_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS relation,
       (SELECT count(*) FROM {fact}) AS n_rows,
       (SELECT count(*) FROM {fact} f
        WHERE NOT EXISTS (SELECT 1 FROM {dim} d
                          WHERE d.{pk} = f.{fk})) AS n_orphans"""
    for name, fact, fk, dim, pk in _RI_RELATIONS
)


@declare("referential_integrity_census", oracle=_RI_SQL)
def q_referential_integrity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity sweep across the whole star schema — the
    profiling pass every ingest should run before anything joins:
    per relation, total rows and orphan rows (FK with no matching PK;
    NULL keys count as orphans, matching SQL NOT EXISTS semantics —
    a NULL never matches). Each relation is one left-anti join with
    the dimension side broadcast where small; fact-fact (lineitem→
    orders) shuffles on the join key like any fact join would. The
    relations run as a union of independent branches, so Spark
    schedules them concurrently."""
    out = None
    for name, fact, fk, dim, pk in _RI_RELATIONS:
        f = load_table(spark, sf_dir, fact)
        d = load_table(spark, sf_dir, dim).select(pk)
        orphans = f.join(d, f[fk] == d[pk], "left_anti")
        branch = (
            f.agg(F.count("*").alias("n_rows"))
            .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
            .select(F.lit(name).alias("relation"), "n_rows", "n_orphans")
        )
        out = branch if out is None else out.unionByName(branch)
    return out


_FD_CANDIDATES = (
    # (name, table, determinant, dependent) — candidate functional
    # dependencies; the census REPORTS violation counts, it does not
    # assume they hold (profiling, not assertion)
    ("nation_name<-key", "nation", "n_nationkey", "n_name"),
    ("region_name<-key", "region", "r_regionkey", "r_name"),
    ("cust_nation<-custkey", "customer", "c_custkey", "c_nationkey"),
    ("order_cust<-orderkey", "orders", "o_orderkey", "o_custkey"),
    ("order_priority<-custkey", "orders", "o_custkey", "o_orderpriority"),
    ("part_brand<-partkey", "part", "p_partkey", "p_brand"),
)

_FD_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS dependency,
       count(*) AS n_determinants,
       CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       CAST(max(n_dep) AS BIGINT) AS max_dependents
FROM (
  SELECT {det}, count(DISTINCT {dep}) AS n_dep
  FROM {table} WHERE {det} IS NOT NULL
  GROUP BY {det}
)"""
    for name, table, det, dep in _FD_CANDIDATES
)


@declare("functional_dependency_census", oracle=_FD_SQL)
def q_functional_dependency_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency PROFILING across the schema: for each
    candidate A→B, how many determinant values exist, how many map to
    more than one dependent (violations), and the worst fan-out. A key
    dependency reporting zero violations is evidence for uniqueness
    constraints downstream engines could exploit; a violated one
    (order priority per customer) quantifies how
    far the column is from derivable. Each branch is one two-level
    aggregate — countDistinct per determinant then a tiny rollup —
    with map-side partials; branches schedule concurrently (the
    referential_integrity_census companion, completing the profiling
    family: orphans, outliers, spread, dependencies)."""
    out = None
    for name, table, det, dep in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, table).filter(F.col(det).isNotNull())
        per_det = t.groupBy(det).agg(F.countDistinct(dep).alias("n_dep"))
        branch = per_det.agg(
            F.count("*").alias("n_determinants"),
            F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
            .cast("bigint").alias("n_violating"),
            F.max("n_dep").cast("bigint").alias("max_dependents"),
        ).select(F.lit(name).alias("dependency"), "n_determinants",
                 "n_violating", "max_dependents")
        out = branch if out is None else out.unionByName(branch)
    return out


# --- TPC-H Q21/Q22 shapes (multi-EXISTS decorrelation, anti-join + exact
# scalar mean) — completing the classic correlated-subquery family ----------

_SOLE_LATE_SQL = """
WITH l1 AS (
  SELECT l_suppkey, l_orderkey,
         l_shipdate > o_orderdate + INTERVAL 365 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), ps AS (
  SELECT l_orderkey, l_suppkey, max(late) AS any_late
  FROM l1 GROUP BY l_orderkey, l_suppkey
)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
FROM ps a JOIN supplier s ON s.s_suppkey = a.l_suppkey
WHERE a.any_late
  AND EXISTS (SELECT 1 FROM ps b
              WHERE b.l_orderkey = a.l_orderkey
                AND b.l_suppkey <> a.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM ps c
                  WHERE c.l_orderkey = a.l_orderkey
                    AND c.l_suppkey <> a.l_suppkey AND c.any_late)
GROUP BY s.s_suppkey, s.s_name
"""


@declare("sole_late_supplier_waits", oracle=_SOLE_LATE_SQL)
def q_sole_late_supplier_waits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (no commitdate column, so "late" = shipped more
    than a year after the order date): per supplier, the number of
    finished multi-supplier orders where THEY were the only late
    supplier — the classic double correlated subquery (EXISTS another
    supplier / NOT EXISTS another LATE supplier). The oracle keeps the
    textbook EXISTS/NOT-EXISTS text; the Spark side runs the
    decorrelation explicitly: per-(order, supplier) late flags, then
    ONE grouped aggregate per order (supplier count + late-supplier
    count) joined back — `n_supp > 1 AND n_late = 1 AND any_late`
    is exactly the two EXISTS conditions, with no correlated
    re-execution and no second pass over the fact.

    Scale shape: lineitem shuffles once on orderkey for the
    order-supplier flags; the per-order rollup reuses that
    partitioning (no re-shuffle under AQE); the supplier dim
    broadcasts. Window-free, so no global sort anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    flags = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
             .alias("any_late"))
    )
    per_order = flags.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.when(F.col("any_late"), 1).otherwise(0)).alias("n_late"),
    )
    return (
        flags.join(per_order, "l_orderkey")
        .filter(F.col("any_late") & (F.col("n_supp") > 1)
                & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


_DORMANT_RICH_SQL = """
WITH pos AS (
  SELECT count(*) AS n,
         sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s
  FROM customer WHERE c_acctbal > 0
), rich AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer c, pos
  WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.s
)
SELECT n.n_name,
       count(*) AS n_dormant,
       CAST(sum(r.bal_cents) AS BIGINT) AS total_balance_cents
FROM rich r JOIN nation n ON n.n_nationkey = r.c_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = r.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01'
)
GROUP BY n.n_name
"""


@declare("dormant_rich_customers", oracle=_DORMANT_RICH_SQL)
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: per nation, customers whose balance beats the
    positive-balance mean but who placed no order since 2000 — the
    global-scalar-subquery + anti-join shape. The mean comparison is
    exact integer cross-multiplication (cents·n > Σcents; a float avg
    is reduction-order-dependent across engines — the
    orders_above_priority_mean discipline), and the NOT EXISTS
    decorrelates to a LEFT ANTI join against only the post-cutoff
    order slice.

    Scale shape: the scalar (n, Σ) aggregate is one map-side-combined
    pass riding a 1-row broadcast; the anti join probes a
    date-pruned orders scan (predicate pushed to parquet) shuffled on
    custkey; the nation dim broadcasts into a 25-group rollup."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.count("*").alias("n"), F.sum(cents).alias("s"))
    rich = (
        cust.select("c_custkey", "c_nationkey", cents.alias("bal_cents"))
        .crossJoin(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("n") > F.col("s"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_dormant"),
             F.sum("bal_cents").alias("total_balance_cents"))
    )
