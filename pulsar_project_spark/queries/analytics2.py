"""Declared queries: additional star-schema analytics (TPC-H Q3-shaped
shipping priority, customer-LTV segmentation) — widening the analytic
surface with filter-pushdown-heavy multi-join plans."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_table

_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
_DISC = "(1 - CAST(l_discount AS DECIMAL(4,2)))"


def _rev():
    return (F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))


@declare(
    "shipping_priority_top10",
    oracle=f"""
SELECT l_orderkey,
       CAST(sum({_PRICE} * {_DISC}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'O' AND l_shipdate > o_orderdate
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: both scans carry pushed-down predicates
    (o_orderstatus to the orders scan; the ship-after-order band is a
    join residual), one agg, global top-10 with tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return (
        li.join(orders, (li.l_orderkey == orders.o_orderkey)
                & (li.l_shipdate > orders.o_orderdate))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@declare(
    "customer_ltv_segments",
    oracle="""
WITH ltv AS (
  SELECT c_custkey, c_name, n_name,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value,
         count(*) AS n_orders
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_name, n_name
)
SELECT c_custkey, c_name, n_name, lifetime_value, n_orders,
       CASE WHEN lifetime_value >= 1000000 THEN 'platinum'
            WHEN lifetime_value >= 500000 THEN 'gold'
            WHEN lifetime_value >= 100000 THEN 'silver'
            ELSE 'bronze' END AS segment
FROM ltv
""",
)
def q_customer_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime value + fixed-threshold segmentation: orders
    fact shuffles once on custkey; customer/nation broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    ltv = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
             .alias("lifetime_value"),
            F.count("*").alias("n_orders"),
        )
    )
    seg = (
        F.when(F.col("lifetime_value") >= 1_000_000, "platinum")
        .when(F.col("lifetime_value") >= 500_000, "gold")
        .when(F.col("lifetime_value") >= 100_000, "silver")
        .otherwise("bronze")
    )
    return ltv.select(
        "c_custkey", "c_name", "n_name", "lifetime_value", "n_orders",
        seg.alias("segment"),
    )


_SHARE_SQL = """
WITH nat AS (
  SELECT r_name AS region, n_name AS nation,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT region, nation, rev_cents,
       CASE WHEN sum(rev_cents) OVER (PARTITION BY region) = 0 THEN NULL
            ELSE CAST(rev_cents AS DOUBLE)
                 / CAST(sum(rev_cents) OVER (PARTITION BY region) AS BIGINT)
       END AS region_share
FROM nat
"""


@declare("nation_revenue_share", oracle=_SHARE_SQL)
def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue —
    the percent-of-total window pattern. Revenue folds to exact integer
    cents; the share is one BIGINT/BIGINT double division (the window
    sum is exact before any float appears).

    Scale shape: dims broadcast onto the fact scan, one aggregate
    shuffle to 25 nation rows, then the partition-total window runs
    over 5-row regions — free."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    nat = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("rev_cents"))
    )
    w = Window.partitionBy("region")
    # an all-zero-revenue region yields NULL shares, not a
    # DIVIDE_BY_ZERO under ANSI (guarded identically in the oracle —
    # found by the warehouse fuzz on zero-price orders)
    return nat.select(
        "region", "nation", "rev_cents",
        F.when(
            F.sum("rev_cents").over(w) != 0,
            F.col("rev_cents").cast("double")
            / F.sum("rev_cents").over(w).cast("bigint"),
        ).alias("region_share"),
    )


@declare(
    "product_type_profit",
    oracle=f"""
SELECT n_name AS nation,
       CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
       CAST(sum({_PRICE} * {_DISC}) AS DOUBLE) AS profit,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1, 2
""",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped (round 6): per-nation, per-year profit on a
    product-name slice — the widest join fan in the warehouse family
    (lineitem × part × supplier × nation × orders). Plan shape the
    optimizer must get right at 100 TB: the p_name LIKE filter pushes
    into the part scan BEFORE the join (the slice is ~5% of parts, so
    the part side broadcasts), supplier/nation broadcast, and the only
    wide exchange is lineitem↔orders on orderkey; the aggregate is
    25 nations × ~7 years with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg(
            F.sum(_rev()).cast("double").alias("profit"),
            F.count("*").alias("n_lines"),
        )
    )


@declare(
    "brand_quantity_revenue",
    oracle=f"""
SELECT p_brand,
       CAST(sum({_PRICE} * {_DISC}) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2'  AND l_quantity BETWEEN 1  AND 15 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#4'  AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#17' AND l_quantity BETWEEN 20 AND 35 AND p_size BETWEEN 1 AND 30)
GROUP BY p_brand
""",
)
def q_brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped (round 6): disjunctive multi-band predicates
    across BOTH join sides — the classic optimizer test for OR-clause
    handling. Per-side implications of the OR (p_brand IN (...) and
    p_size <= 30 on part; l_quantity BETWEEN 1 AND 35 on lineitem) are
    inferable and prunable; the residual disjunction evaluates on the
    joined row. The filtered part side broadcasts; no wide exchange at
    all."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#2") & q.between(1, 15) & sz.between(1, 10))
        | ((br == "Brand#4") & q.between(10, 25) & sz.between(1, 20))
        | ((br == "Brand#17") & q.between(20, 35) & sz.between(1, 30))
    )
    return (
        joined.filter(cond)
        .groupBy("p_brand")
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --- Distributed Pareto frontier (skyline) ----------------------------------

# Price-band width (cents) for the banded skyline. Bands are a
# CORRECTNESS-preserving partitioning: every part in band b-1 is strictly
# cheaper than every part in band b, so cross-band dominance reduces to a
# running max over the tiny per-band summary — the declared-constant
# precedent (MAX_BUCKET / TRIANGLE_DEGREE_CAP).
SKYLINE_BAND_CENTS = 1_000

_SKYLINE_SQL = """
SELECT p.p_brand, p.p_partkey, p.p_name, p.p_size,
       CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand AND (
        (q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
     OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size))
)
"""


@declare("pareto_frontier_parts", oracle=_SKYLINE_SQL)
def q_pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier (skyline): the parts for which no
    same-brand part is both cheaper-or-equal and bigger (with one
    strict) — the multi-objective shortlist every procurement /
    recommendation surface wants. The oracle states the QUADRATIC
    NOT-EXISTS semantics; the Spark side computes it in O(n log n)
    without a global sort via price bands:

    * local pass — window partitioned by (brand, band), ordered by
      integer price cents: `max(size) RANGE .. 1 PRECEDING` catches
      strictly-cheaper dominators, `RANGE .. CURRENT ROW` (minus self)
      catches equal-price-bigger ones;
    * cross-band pass — every part in a lower band is strictly cheaper
      by construction, so the per-(brand, band) max-size summary
      (bounded by brands x bands — metadata-sized at any corpus scale)
      carries dominance across bands through one exclusive running max,
      broadcast back onto the parts.

    Scale shape: one shuffle of parts on (brand, band) — partitions
    stay small because a band is a price decile, not the whole brand —
    plus a broadcast of the tiny summary. No quadratic pair blow-up,
    no single-partition window."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("bigint")
    p = part.select(
        "p_brand", "p_partkey", "p_name", "p_size",
        cents.alias("price_cents"),
        (cents / SKYLINE_BAND_CENTS).cast("bigint").alias("band"),
    )
    w_cheaper = (
        Window.partitionBy("p_brand", "band").orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_le = (
        Window.partitionBy("p_brand", "band").orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = p.select(
        "*",
        F.max("p_size").over(w_cheaper).alias("max_sz_cheaper"),
        F.max("p_size").over(w_le).alias("max_sz_le"),
    )
    band_summary = p.groupBy("p_brand", "band").agg(
        F.max("p_size").alias("band_max_sz"))
    w_prev_bands = (
        Window.partitionBy("p_brand").orderBy("band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = band_summary.select(
        "p_brand", "band",
        F.max("band_max_sz").over(w_prev_bands).alias("max_sz_prev_bands"),
    )
    return (
        local.join(F.broadcast(prev), ["p_brand", "band"])
        .filter(
            (F.col("max_sz_cheaper").isNull()
             | (F.col("max_sz_cheaper") < F.col("p_size")))
            & (F.col("max_sz_le") <= F.col("p_size"))
            & (F.col("max_sz_prev_bands").isNull()
               | (F.col("max_sz_prev_bands") < F.col("p_size")))
        )
        .select("p_brand", "p_partkey", "p_name", "p_size", "price_cents")
    )


# --- TPC-H Q10/Q15 shapes ---------------------------------------------------

@declare(
    "returned_item_top_customers",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum({_PRICE} * {_DISC}) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
)
def q_returned_item_top_customers(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the customers who returned the most revenue in
    a one-year window — the returns-desk triage list. Both defining
    predicates push to their scans (returnflag to lineitem, the date
    band to orders); the fact-fact join shuffles once on orderkey,
    then the customer/nation dims broadcast onto the aggregated
    per-customer rows. Decimal revenue arithmetic (the Q3 discipline)
    keeps the sum reduction-order-independent; global top-20 with a
    custkey tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"),
             F.count("*").alias("n_lines"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@declare(
    "top_supplier_by_quarter_revenue",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.revenue_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.revenue_cents = (SELECT max(revenue_cents) FROM rev)
""",
)
def q_top_supplier_by_quarter_revenue(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum shipped revenue
    in a quarter — the view-plus-scalar-max pattern, WITH the tie
    semantics the LIMIT 1 shortcut silently breaks (every supplier
    matching the max must appear). Revenue is exact integer cents, so
    the equality against the max is never a float comparison. The
    Spark side materializes the per-supplier aggregate once, reduces
    it to a 1-row max broadcast, and filters — no window, no second
    fact scan; the date band pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
             .alias("revenue_cents"))
    )
    mx = rev.agg(F.max("revenue_cents").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("revenue_cents") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "revenue_cents")
    )


# --- Benford first-digit census ---------------------------------------------

# floor(10^6 · log10(1 + 1/d)) for d = 1..9 — the Benford expected
# shares as frozen integer micros (computed once, a CONSTANT of the
# law, so no transcendental is evaluated in either engine).
BENFORD_MICROS = {1: 301029, 2: 176091, 3: 124938, 4: 96910,
                  5: 79181, 6: 66946, 7: 57991, 8: 51152, 9: 45757}

_BENFORD_CASE = ("CASE leading_digit " + " ".join(
    f"WHEN {d} THEN {m}" for d, m in BENFORD_MICROS.items()) + " END")

_BENFORD_SQL = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS leading_digit
  FROM orders WHERE o_totalprice > 0
), tot AS (SELECT count(*) AS n FROM digits),
obs AS (
  SELECT leading_digit, count(*) AS n_values FROM digits GROUP BY 1
)
SELECT o.leading_digit,
       CAST(o.n_values AS BIGINT) AS n_values,
       CAST((1000000 * o.n_values) // t.n AS BIGINT) AS observed_micros,
       CAST({_BENFORD_CASE} AS BIGINT) AS benford_micros,
       CAST(abs((1000000 * o.n_values) // t.n - {_BENFORD_CASE})
            AS BIGINT) AS deviation_micros
FROM obs o CROSS JOIN tot t
"""


@declare("benford_first_digit_census", oracle=_BENFORD_SQL)
def q_benford_first_digit_census(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Benford's-law first-digit census over order totals — the
    forensic data-quality screen (fabricated or synthetically capped
    monetary data deviates from the log distribution real multiplicative
    processes follow; this corpus's uniform price generator shows
    exactly that, loudly). Observed shares are integer micros
    ((10^6·n) div total); the expected shares are the law's CONSTANTS
    frozen as integers, so no log is evaluated anywhere — both engines
    compare pure integer arithmetic.

    Scale shape: one narrow projection (first digit of the cents
    string) → 9-group aggregate with map-side partials; the total
    rides a 1-row broadcast."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(F.round(F.col("o_totalprice") * 100).cast("bigint")
                    .cast("string"), 1, 1).cast("bigint")
        .alias("leading_digit"))
    tot = digits.agg(F.count("*").alias("n"))
    obs = digits.groupBy("leading_digit").agg(
        F.count("*").alias("n_values"))
    bexp = F.expr(_BENFORD_CASE)
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "leading_digit", "n_values",
            F.expr("(1000000 * n_values) div n").cast("bigint")
            .alias("observed_micros"),
            bexp.cast("bigint").alias("benford_micros"),
            F.abs(F.expr("(1000000 * n_values) div n") - bexp)
            .cast("bigint").alias("deviation_micros"),
        )
    )


# Binned exact Kolmogorov-Smirnov distance between two order-value
# distributions. 4096 equi-width bins over the GLOBAL observed bounds
# make the ECDF relation metadata-sized regardless of corpus scale (an
# unbinned exact KS needs a cumulative walk over every distinct value —
# a single-partition global sort at 100 TB); the statistic is the exact
# KS of the binned distributions, bin count declared in BOTH engines.
_KS_BINS = 4096

_KS_SQL = f"""
WITH c AS (
  SELECT o_orderstatus AS s,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus IN ('O', 'F')
),
bounds AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c),
binned AS (
  SELECT least({_KS_BINS - 1},
               ((cents - lo) * {_KS_BINS}) // (hi - lo + 1)) AS bin,
         CAST(sum(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS da,
         CAST(sum(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS db
  FROM c, bounds GROUP BY bin
),
cum AS (
  SELECT sum(da) OVER (ORDER BY bin
                       ROWS UNBOUNDED PRECEDING) AS ca,
         sum(db) OVER (ORDER BY bin
                       ROWS UNBOUNDED PRECEDING) AS cb
  FROM binned
),
tot AS (
  SELECT CAST(sum(da) AS BIGINT) AS n1, CAST(sum(db) AS BIGINT) AS n2
  FROM binned
)
SELECT CAST(max(abs(ca * n2 - cb * n1)) AS BIGINT) AS d_scaled,
       n1, n2,
       CASE WHEN n1 * n2 = 0 THEN NULL
            ELSE CAST(max(abs(ca * n2 - cb * n1)) AS DOUBLE)
                 / CAST(n1 * n2 AS DOUBLE) END AS ks_stat
FROM cum, tot
GROUP BY n1, n2
"""


@declare("ks_distance_order_values", oracle=_KS_SQL)
def q_ks_distance_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the
    order-value distributions of open ('O') vs fulfilled ('F') orders —
    the distribution-drift test a training pipeline runs between data
    generations. The float CDF never materializes: with cumulative bin
    counts ca, cb and population sizes n1, n2, the supremum
    |ca/n1 − cb/n2| cross-multiplies to max|ca·n2 − cb·n1| in exact
    BIGINTs (the orders_above_priority_mean discipline applied to
    ECDFs); the reported ks_stat is ONE double division of two exact
    integers. Binning at 4096 equi-width cells over broadcast global
    bounds keeps the cumulative window metadata-sized — an unbinned
    exact KS is a single-partition sort over every distinct value,
    which dies at 100 TB; the binned statistic is exact for the binned
    distributions and its resolution (1/4096 of the value range) is a
    declared constant of BOTH engines.

    Scale shape: one scan with pushed status filter, one min/max
    scalar broadcast, one ≤4096-group aggregate; the cumulative window
    and the max run over the tiny binned relation."""
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("O", "F")
    ).select(
        F.col("o_orderstatus").alias("s"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    bounds = c.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    binned = (
        c.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(_KS_BINS - 1),
                F.expr(f"((cents - lo) * {_KS_BINS}) div (hi - lo + 1)"),
            ).alias("bin"),
            F.when(F.col("s") == "O", 1).otherwise(0).alias("ia"),
            F.when(F.col("s") == "F", 1).otherwise(0).alias("ib"),
        )
        .groupBy("bin")
        .agg(F.sum("ia").alias("da"), F.sum("ib").alias("db"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    cum = binned.select(F.sum("da").over(w).alias("ca"),
                        F.sum("db").over(w).alias("cb"))
    tot = binned.agg(F.sum("da").cast("bigint").alias("n1"),
                     F.sum("db").cast("bigint").alias("n2"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(F.max(F.abs(F.col("ca") * F.col("n2")
                         - F.col("cb") * F.col("n1")))
             .cast("bigint").alias("d_scaled"))
        .select(
            "d_scaled", "n1", "n2",
            # a one-sided corpus (n1*n2 = 0) has no defined KS — NULL,
            # not a divide-by-zero (Spark 4 ANSI raises; caught by the
            # one-sided fuzz corpora)
            F.when(
                F.col("n1") * F.col("n2") != 0,
                F.col("d_scaled").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"),
            ).alias("ks_stat"),
        )
    )
