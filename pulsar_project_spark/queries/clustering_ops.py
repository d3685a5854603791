"""Declared queries: near-dup clustering (connected components over
MinHash-LSH candidate pairs — the "keep one per duplicate cluster"
step). Spark runs iterative min-label propagation; the oracle computes
the same components with a recursive CTE — an iterative DataFrame
algorithm that is still fully oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.operators.clustering import connected_components
from pulsar_project_spark.operators.dedup import minhash_candidates
from pulsar_project_spark.queries.dedup_ops import _bands_sql, _sig_sql
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_table


@declare(
    "neardup_components",
    oracle=f"""
WITH RECURSIVE {_sig_sql().strip()}, {_bands_sql()},
bqual AS (
  SELECT band_id, band_key FROM bands
  GROUP BY band_id, band_key HAVING count(*) <= 10000
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  JOIN bqual q ON a.band_id = q.band_id AND a.band_key = q.band_key
),
edges AS (
  SELECT doc_a AS n, doc_b AS m FROM cand
  UNION SELECT doc_b, doc_a FROM cand
),
walk AS (
  SELECT n, n AS reach FROM (SELECT DISTINCT n FROM edges)
  UNION
  SELECT w.n, e.m FROM walk w JOIN edges e ON w.reach = e.n
),
comp AS (SELECT n, min(reach) AS component FROM walk GROUP BY n)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS component,
       coalesce(c.component, d.doc_id) = d.doc_id AS is_keeper
FROM documents d LEFT JOIN comp c ON d.doc_id = c.n
""",
)
def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters from LSH candidates; keeper = min doc_id per
    component (matching exact_dedup's first-seen-wins). Iterative label
    propagation with localCheckpoint-truncated lineage."""
    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_candidates(docs).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    comp = connected_components(
        docs.select("doc_id"), edges, node_col="doc_id", src="a", dst="b"
    )
    return comp.select(
        "doc_id",
        F.col("component"),
        (F.col("component") == F.col("doc_id")).alias("is_keeper"),
    )


@declare(
    "cluster_best_representative",
    oracle=f"""
WITH RECURSIVE {_sig_sql().strip()}, {_bands_sql()},
bqual AS (
  SELECT band_id, band_key FROM bands
  GROUP BY band_id, band_key HAVING count(*) <= 10000
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  JOIN bqual q ON a.band_id = q.band_id AND a.band_key = q.band_key
),
edges AS (
  SELECT doc_a AS n, doc_b AS m FROM cand
  UNION SELECT doc_b, doc_a FROM cand
),
walk AS (
  SELECT n, n AS reach FROM (SELECT DISTINCT n FROM edges)
  UNION
  SELECT w.n, e.m FROM walk w JOIN edges e ON w.reach = e.n
),
comp AS (SELECT n, min(reach) AS component FROM walk GROUP BY n),
labeled AS (
  SELECT d.doc_id, d.n_chars, coalesce(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY component
                               ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM labeled
)
SELECT component,
       doc_id AS kept_doc_id,
       n_chars AS kept_n_chars,
       (SELECT count(*) FROM labeled l WHERE l.component = ranked.component)
         AS n_docs_in_cluster
FROM ranked WHERE rn = 1
""",
)
def q_cluster_best_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keeper POLICY on top of the clusters: keep the highest-
    quality member (longest text, doc_id tiebreak) of every near-dup
    cluster — "keep best", the production policy, vs neardup_components'
    "keep first". One row per cluster with the kept doc and cluster
    size; singletons keep themselves.

    Scale shape: the component labels come from the same checkpointed
    label propagation; the argmax is a row_number window partitioned by
    component (shuffle on component), and the cluster size rides the
    same partition — no extra join against the full corpus."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_candidates(docs).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    comp = connected_components(
        docs.select("doc_id"), edges, node_col="doc_id", src="a", dst="b"
    )
    labeled = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = labeled.select(
        "component", "doc_id", "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("component")).alias("n_docs_in_cluster"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "component",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("n_chars").alias("kept_n_chars"),
        "n_docs_in_cluster",
    )


@declare(
    "neardup_cluster_size_histogram",
    oracle=f"""
WITH RECURSIVE {_sig_sql().strip()}, {_bands_sql()},
bqual AS (
  SELECT band_id, band_key FROM bands
  GROUP BY band_id, band_key HAVING count(*) <= 10000
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  JOIN bqual q ON a.band_id = q.band_id AND a.band_key = q.band_key
),
edges AS (
  SELECT doc_a AS n, doc_b AS m FROM cand
  UNION SELECT doc_b, doc_a FROM cand
),
walk AS (
  SELECT n, n AS reach FROM (SELECT DISTINCT n FROM edges)
  UNION
  SELECT w.n, e.m FROM walk w JOIN edges e ON w.reach = e.n
),
comp AS (SELECT n, min(reach) AS component FROM walk GROUP BY n),
labeled AS (
  SELECT coalesce(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.n
),
sizes AS (
  SELECT component, count(*) AS cluster_size
  FROM labeled GROUP BY component
)
SELECT cluster_size,
       count(*) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_removable
FROM sizes GROUP BY cluster_size
""",
)
def q_neardup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE dedup executive report: how much duplication does the corpus
    carry? Cluster-size histogram over the near-dup components —
    n_clusters of each size, the docs they hold, and ``n_removable``
    (docs beyond each cluster's keeper — summed, the corpus's
    deduplicatable mass). Singletons appear as size 1 with
    n_removable 0, so the histogram totals reconcile with the corpus
    row count by construction. Derivation is two tiny aggregates on
    top of the already-checkpointed component labels; at 100 TB the
    histogram has at most |largest cluster| rows."""
    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_candidates(docs).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    comp = connected_components(
        docs.select("doc_id"), edges, node_col="doc_id", src="a", dst="b"
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.col("cluster_size") * F.count("*")).cast("bigint").alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count("*")).cast("bigint")
        .alias("n_removable"),
    )
