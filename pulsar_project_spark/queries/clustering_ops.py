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
