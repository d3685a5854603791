"""Pins for the Bloom store-prefilter the oracle can't state directly.

The census proves the bit array matches DuckDB's replay; these pin the
two properties that make the filter USABLE as a dedup prefilter:

* NO FALSE NEGATIVES — every incoming doc whose fingerprint truly is
  in the store must probe ``bloom_maybe = 1``; a bloom_negative on a
  real duplicate would silently re-admit archived content. Checked on
  an adversarial corpus where half the batch IS the store.
* The false-positive rate at the design load is sane — on a store of
  5,000 fingerprints against 131,072 bits (k=3), the textbook rate is
  ~1.5e-3; assert the measured rate stays well under 1%.
"""

from __future__ import annotations

from pyspark.sql import functions as F
import pytest

from pulsar_project_spark.operators.dedup import (
    bloom_build,
    bloom_prefilter,
    fingerprint_md5,
)


@pytest.mark.gate  # full-overlap sweep certification
def test_no_false_negatives_on_full_overlap(spark):
    docs = spark.createDataFrame(
        [(i, f"shared text number {i // 2}") for i in range(256)],
        "doc_id long, text string",
    )
    store = docs.filter(F.col("doc_id") % 2 == 0).select("text")
    batch = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    # every batch doc's text also exists in the store (2k and 2k+1
    # share the text "shared text number k")
    out = bloom_prefilter(batch, bloom_build(store)).collect()
    assert len(out) == 128
    assert all(r["bloom_maybe"] == 1 for r in out)


def test_false_positive_rate_at_design_load(spark):
    n_store, n_probe = 5_000, 5_000
    store = spark.range(n_store).select(
        F.concat(F.lit("stored "), F.col("id")).alias("text")
    )
    probe = spark.range(n_probe).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("novel "), F.col("id")).alias("text"),
    )
    out = bloom_prefilter(probe, bloom_build(store))
    n_maybe = out.filter(F.col("bloom_maybe") == 1).count()
    # textbook (1 - e^{-kn/m})^k ~ 1.5e-3 here; 1% leaves slack for
    # md5-lane correlation while still catching a broken bit layout
    assert n_maybe <= n_probe * 0.01


def test_probe_against_empty_store(spark):
    batch = spark.createDataFrame([(1, "a"), (2, "b")],
                                  "doc_id long, text string")
    empty = spark.createDataFrame([], "text string")
    out = bloom_prefilter(batch, bloom_build(empty)).collect()
    assert sorted(r["bloom_maybe"] for r in out) == [0, 0]
