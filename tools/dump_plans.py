"""Dump `.explain('formatted')` for named declared queries to files.

Round-12 deliverable helper: the optimization judge checks plan claims
against committed `plans/r<N>/<query>_{before,after}.txt` files. Run this
once in a worktree of the previous round's snapshot (suffix `before`) and
once at HEAD (suffix `after`).

Usage: python tools/dump_plans.py <outdir> <suffix> <name ...>

Streaming queries are dumped too: calling the declared fn executes the
pipeline (one drain) and the dumped plan is the landed-table census read —
the micro-batch landing shape lives in streaming/pipeline.py and is
audited by tests, not by this dump.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from pulsar_project_spark.session import get_spark

    spark = get_spark("dump_plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qmap = e.queries()
    for name in names:
        if name not in qmap:
            print(f"SKIP {name}: not declared")
            continue
        try:
            df = qmap[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(f"ERROR {name}: {type(ex).__name__}: {ex}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
