#!/usr/bin/env python
"""Tight-loop hot probe for individual declared queries.

The steady bench reports one sample per query inside a 205-query run;
when a per-query number moves more than the ambient drift band, THIS
is the follow-up: a fresh tuned session, the standard bench warmup,
then N back-to-back executions of just the named queries through the
noop sink. The minimum is the hot cost of the plan; the spread is
scheduler/GC noise. Usage:

    python tools/probe_hot.py [-n 5] [--sf DIR] name1 name2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pulsar_project_spark.session import get_spark
    from pulsar_project_spark.sources.tables import TABLE_NAMES, load_table
    import __spark_entry__ as e

    spark = get_spark("probe", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    for t in TABLE_NAMES:
        load_table(spark, args.sf, t).count()
    (load_table(spark, args.sf, "documents")
     .select(F.max(F.length("text")).alias("m"))
     .write.format("noop").mode("overwrite").save())
    (load_table(spark, args.sf, "events")
     .select(F.max(F.length("props")).alias("m"))
     .write.format("noop").mode("overwrite").save())

    qs = e.queries()
    for name in args.names:
        times = []
        for _ in range(args.n):
            t0 = time.monotonic()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            times.append(time.monotonic() - t0)
        print(f"{name}: min={min(times):.2f}s "
              f"runs=[{', '.join(f'{t:.2f}' for t in times)}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
