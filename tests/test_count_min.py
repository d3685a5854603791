"""Property pins for the relational count-min sketch.

The oracle proves counter-for-counter parity; these pin the sketch
THEOREMS on an adversarial corpus (a power-law key distribution with
forced collisions — far more skew than the fixed corpus):

* never-underestimate: estimate >= exact for EVERY key, not just the
  probed top-k;
* mergeability: building one sketch over the union equals adding two
  shard sketches counter-wise, and estimates agree exactly;
* bounded overestimate at the textbook load.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_project_spark.operators.sketches import (
    CMS_WIDTH,
    cms_build,
    cms_estimate,
)


def _powerlaw(spark, n=20_000, seed_mod=977):
    # key k appears ~ n/(k+1) times: heavy head, long tail
    return spark.range(n).select(
        (F.col("id") % seed_mod * F.col("id") % 613).alias("key")
    )


def test_never_underestimates_any_key(spark):
    df = _powerlaw(spark)
    cms = cms_build(df, "key")
    exact = df.groupBy("key").agg(F.count("*").alias("exact_n"))
    est = cms_estimate(exact, cms, "key")
    bad = est.filter(F.col("cms_estimate") < F.col("exact_n")).count()
    assert bad == 0


def test_sketches_merge_by_adding_counters(spark):
    base = spark.range(20_000).select(
        "id", (F.col("id") % 977 * F.col("id") % 613).alias("key")
    )
    left = base.filter(F.col("id") % 2 == 0).select("key")
    right = base.filter(F.col("id") % 2 == 1).select("key")
    merged = (
        cms_build(left, "key").unionByName(cms_build(right, "key"))
        .groupBy("depth", "pos").agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(base.select("key"), "key")
    # counter tables identical
    diff = (
        merged.alias("m").join(
            whole.alias("w"), ["depth", "pos"], "full"
        ).filter(
            F.coalesce(F.col("m.cnt"), F.lit(-1))
            != F.coalesce(F.col("w.cnt"), F.lit(-1))
        ).count()
    )
    assert diff == 0


def test_overestimate_bounded_at_design_load(spark):
    n = 20_000
    df = _powerlaw(spark, n)
    cms = cms_build(df, "key")
    exact = df.groupBy("key").agg(F.count("*").alias("exact_n"))
    est = cms_estimate(exact, cms, "key")
    # textbook: P[over > 2N/W] < (1/2)^D per key; check the 99th
    # percentile of overestimates sits under 2N/W (= ~10 here)
    bound = 2 * n / CMS_WIDTH
    over = est.select(
        (F.col("cms_estimate") - F.col("exact_n")).alias("over")
    )
    q99 = over.selectExpr("percentile(over, 0.99) AS q").collect()[0]["q"]
    assert q99 <= bound, f"99th-pct overestimate {q99} > bound {bound}"


def test_linear_counting_estimate_accuracy(spark):
    import math

    from pyspark.sql import functions as F

    from pulsar_project_spark.operators.sketches import (
        LC_M_BITS,
        lc_build,
        lc_set_bits,
    )

    # one group, ~2000 true distinct keys at m=8192 (load factor ~0.25)
    df = spark.range(40_000).select(
        F.lit("g").alias("g"), (F.col("id") % 2000).alias("key")
    )
    [row] = lc_set_bits(lc_build(df, "g", "key"), "g").collect()
    z = LC_M_BITS - row["n_set_bits"]
    est = -LC_M_BITS * math.log(z / LC_M_BITS)
    assert abs(est - 2000) / 2000 < 0.05

    # merge property: two shard bitmaps OR to the whole's bitmap
    left = df.filter(F.col("id") % 2 == 0)
    right = df.filter(F.col("id") % 2 == 1)
    merged = (
        lc_build(left, "g", "key").unionByName(lc_build(right, "g", "key"))
        .groupBy("g", "word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    whole = lc_build(df, "g", "key")
    diff = (
        merged.alias("m").join(whole.alias("w"), ["g", "word_idx"], "full")
        .filter(F.coalesce(F.col("m.bits"), F.lit(0))
                != F.coalesce(F.col("w.bits"), F.lit(0)))
        .count()
    )
    assert diff == 0
