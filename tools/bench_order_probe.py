#!/usr/bin/env python
"""Session-position probe for the round-3 bench regressions.

Round 3 moved four queries to EARLY registry slots and they slowed
28-74% with unchanged physical plans (VERDICT r3 "What's wrong" #1):
bm25_scores, neardup_components, cluster_best_representative,
revenue_rollup_region_nation (plus watch items kv_lookup_miss_message,
token_cooccurrence_top20). Hypothesis: session position, not plans —
early queries pay colder JIT/codegen caches and fresher AQE statistics.

This probe reproduces bench.py's exact warmup, then times the suspect
set twice in ONE session: immediately after warmup (the r3-like early
position) and again after a ~40-query filler workload has aged the JVM
(the r2-like late position). A large early→late drop with identical
plans confirms the artifact; stable times would instead point at a real
plan/config delta. Results land in bench_order_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

SUSPECTS = (
    "bm25_scores", "neardup_components", "cluster_best_representative",
    "revenue_rollup_region_nation", "kv_lookup_miss_message",
    "token_cooccurrence_top20",
)
N_FILLER = 40
REPEATS = 3


def _warmup(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pulsar_project_spark.operators.retrieval import simple_rag
    from pulsar_project_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    for tbl, expr in (("documents", F.max(F.length("text"))),
                      ("events", F.max(F.length("props"))),
                      ("embeddings", F.max(F.size("embedding")))):
        (load_table(spark, sf_dir, tbl).select(expr.alias("m"))
         .write.format("noop").mode("overwrite").save())
    (simple_rag(load_table(spark, sf_dir, "documents").limit(32),
                "warm the lambda filter codegen path", top_k=5)
     .write.format("noop").mode("overwrite").save())
    _n = load_table(spark, sf_dir, "nation")
    _r = load_table(spark, sf_dir, "region")
    _w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    (_n.join(F.broadcast(_r), _n.n_regionkey == _r.r_regionkey)
     .select(F.row_number().over(_w).alias("rn"))
     .orderBy(F.desc("rn")).limit(5)
     .write.format("noop").mode("overwrite").save())


def _time_all(queries, names, spark, sf_dir):
    out = {}
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 4)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pulsar_project_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("bench-order-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = e.queries()

    _warmup(spark, sf_dir)

    # EARLY measurement: the r3-like position (right after warmup).
    early = [_time_all(queries, SUSPECTS, spark, sf_dir)
             for _ in range(REPEATS)]

    # Filler: ~40 non-suspect batch queries age the session the way the
    # first two-thirds of a full bench run would.
    filler = [n for n in queries
              if n not in SUSPECTS and not n.startswith("streaming_")
              and n != "mq_pipeline_roundtrip"][:N_FILLER]
    t0 = time.perf_counter()
    _time_all(queries, filler, spark, sf_dir)
    filler_sec = round(time.perf_counter() - t0, 2)

    # LATE measurement: the r2-like position (aged session).
    late = [_time_all(queries, SUSPECTS, spark, sf_dir)
            for _ in range(REPEATS)]

    result = {
        "sf_dir": sf_dir,
        "filler_queries": len(filler),
        "filler_sec": filler_sec,
        "early": early,
        "late": late,
        "early_min": {n: min(r[n] for r in early) for n in SUSPECTS},
        "late_min": {n: min(r[n] for r in late) for n in SUSPECTS},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_order_probe.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"early_min": result["early_min"],
                      "late_min": result["late_min"]}, indent=1))


if __name__ == "__main__":
    main()
