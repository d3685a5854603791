"""Declared queries: approximate sketches + sampling (SURVEY.md §2.4
"approx sketches: absent" in the reference; essential at 100 TB where
exact distinct/percentile would shuffle the world).

Sketch internals are engine-private (HLL++/KLL implementations differ
between Spark and DuckDB), so these are rows-only declared queries;
tests pin their accuracy against the EXACT oracle-checked twins
(group_count_by_type, per_user_activity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events


@declare("approx_distinct_users")
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event type (one map-side-combinable agg
    — the 100 TB replacement for count(distinct), which needs a full
    re-shuffle on the distinct key)."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@declare("value_percentiles_sketch")
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of event value per type (quantile sketch;
    single pass, bounded memory)."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("pcts"),
    ).select(
        "event_type",
        F.col("pcts")[0].alias("p50"),
        F.col("pcts")[1].alias("p90"),
        F.col("pcts")[2].alias("p99"),
    )


@declare("stratified_sample_by_type")
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sample (sampleBy): downsample noisy strata,
    keep rare ones whole — the training-data rebalancing pass. Seeded →
    deterministic per engine version, but RNG is engine-private →
    rows-only; the test pins per-stratum proportions."""
    ev = load_events(spark, sf_dir)
    fractions = {"view": 0.1, "click": 0.1, "error": 1.0,
                 "purchase": 1.0, "signup": 0.5}
    return ev.sampleBy("event_type", fractions, seed=42).select(
        "event_id", "user_id", "event_type", "value"
    )
