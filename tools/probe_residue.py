#!/usr/bin/env python
"""Round-12 diagnostic: why do stateful streaming queries run ~2x their
fresh-session hot floor when sampled mid-bench?

BENCH_NOTES rounds 10-12 repeatedly observed the gap (e.g. debounce
floor 3.68 s vs 7.72 s inside the full 293-query steady run) and called
it "session residue" without isolating the mechanism. This probe does:

  1. fresh tuned session + the standard bench warmup;
  2. N back-to-back runs of the target streaming queries (hot floor);
  3. a HEAVY PREFIX: a configurable slice of the declared registry,
     executed once each (simulating bench position);
  4. the targets again (the residue-inflated cost);
  5. candidate mitigations, one at a time, re-measuring after each:
       a. System.gc() settle (heap garbage hypothesis)
       b. spark.streams.resetTerminated() (listener/registry hypothesis)
       c. StateStore.stop() via the JVM gateway (accumulated state-store
          providers + maintenance threads hypothesis)

Usage: python tools/probe_residue.py [--sf DIR] [--prefix 40] [-n 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = [
    "streaming_debounce",
    "streaming_keep_last_state",
    "streaming_session_windows",
    "streaming_ann_ingest_census",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--prefix", type=int, default=40,
                    help="number of registry queries in the heavy prefix")
    ap.add_argument("-n", type=int, default=2)
    ap.add_argument("--targets", nargs="*", default=TARGETS)
    args = ap.parse_args()

    import __spark_entry__ as e
    from pulsar_project_spark.session import get_spark

    spark = get_spark("probe_residue")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    def noop(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def sample(tag: str) -> None:
        for name in args.targets:
            times = [noop(name) for _ in range(args.n)]
            print(f"[{tag}] {name}: min={min(times):.2f} "
                  f"all={[round(t, 2) for t in times]}", flush=True)

    # standard warmup (mirrors bench.py)
    from pulsar_project_spark.sources.tables import TABLE_NAMES, load_table
    for t in TABLE_NAMES:
        load_table(spark, args.sf, t).count()

    sample("fresh")

    heavy = [n for n in qs
             if n not in args.targets][: args.prefix]
    t0 = time.perf_counter()
    for name in heavy:
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
    print(f"[prefix] {len(heavy)} queries in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    sample("after-prefix")

    spark.sparkContext._jvm.System.gc()
    time.sleep(1)
    sample("after-gc")

    spark.streams.resetTerminated()
    sample("after-resetTerminated")

    jvm = spark.sparkContext._jvm
    jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    sample("after-statestore-stop")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
