"""Sketch/sampling accuracy vs the exact oracle-checked twins — the
stronger check the rows-only driver path can't do (sketch internals are
engine-private, so parity is pinned by ACCURACY BOUNDS, not hashes)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as e
from pulsar_project_spark.sources.tables import load_events
from tests.conftest import SF_CORRECT


def test_approx_distinct_within_rsd(spark):
    got = {r.event_type: r.approx_users
           for r in e.queries()["approx_distinct_users"](spark, SF_CORRECT).collect()}
    exact = {r.event_type: r.exact
             for r in load_events(spark, SF_CORRECT)
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact")).collect()}
    assert set(got) == set(exact)
    for t, n in exact.items():
        # rsd=0.02 → 5σ bound = 10%
        assert abs(got[t] - n) <= max(1, 0.10 * n), (t, got[t], n)


def test_percentile_sketch_brackets_exact(spark):
    got = {r.event_type: r for r in
           e.queries()["value_percentiles_sketch"](spark, SF_CORRECT).collect()}
    exact = {r.event_type: r for r in
             load_events(spark, SF_CORRECT)
             .groupBy("event_type")
             .agg(F.percentile("value", F.lit(0.5)).alias("p50"),
                  F.percentile("value", F.lit(0.9)).alias("p90"),
                  F.min("value").alias("lo"), F.max("value").alias("hi"))
             .collect()}
    for t, ex in exact.items():
        g = got[t]
        assert ex.lo <= g.p50 <= g.p90 <= g.p99 <= ex.hi
        # accuracy=10000 → near-exact at this row count
        for p in ("p50", "p90"):
            want = getattr(ex, p)
            assert math.isclose(getattr(g, p), want,
                                rel_tol=0.02, abs_tol=0.5), (t, p, g, want)


def test_stratified_sample_proportions_and_subset(spark):
    fractions = {"view": 0.1, "click": 0.1, "error": 1.0,
                 "purchase": 1.0, "signup": 0.5}
    sample = e.queries()["stratified_sample_by_type"](spark, SF_CORRECT)
    totals = {r.event_type: r["count"] for r in
              load_events(spark, SF_CORRECT).groupBy("event_type").count().collect()}
    got = {r.event_type: r["count"] for r in
           sample.groupBy("event_type").count().collect()}
    for t, frac in fractions.items():
        n, k = totals[t], got.get(t, 0)
        if frac == 1.0:
            assert k == n, (t, k, n)  # keep-whole stratum is exact
        else:
            sd = math.sqrt(n * frac * (1 - frac))
            assert abs(k - n * frac) <= 5 * sd + 1, (t, k, n * frac)
    # sampled rows are real rows of their stratum
    ids_sample = {r.event_id for r in sample.select("event_id").collect()}
    ids_all = {r.event_id for r in
               load_events(spark, SF_CORRECT).select("event_id").collect()}
    assert ids_sample <= ids_all


def test_hll_rolling_union_tracks_exact_7d_distinct(spark):
    import __spark_entry__ as e
    import pyspark.sql.functions as F
    from pulsar_project_spark.sources.tables import load_events
    from tests.conftest import SF_CORRECT

    got = {
        r.day: r.est_users_7d
        for r in e.queries()["hll_rolling_distinct_users"](spark, SF_CORRECT).collect()
    }
    ev = load_events(spark, SF_CORRECT).select(
        F.expr("ts_us div 86400000000").alias("day"), "user_id"
    )
    days = [r.day for r in ev.select("day").distinct().collect()]
    lo, hi = min(days), max(days)
    # full 7-day windows only (trailing/leading windows are partial)
    pairs = ev.select("day", "user_id").distinct().collect()
    from collections import defaultdict
    by_day = defaultdict(set)
    for r in pairs:
        by_day[r.day].add(r.user_id)
    for d in range(lo + 6, hi + 1):
        exact = len(set().union(*(by_day[x] for x in range(d - 6, d + 1) if x in by_day)))
        est = got[d]
        assert abs(est - exact) <= max(2, 0.05 * exact), (d, est, exact)
