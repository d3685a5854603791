#!/usr/bin/env python
"""Extended oracle-fuzz soak: many more random corpora than the
in-suite hypothesis budgets (5-8 examples) allow, reusing the suite's
own corpus builders and family lists so any soak failure is
immediately reproducible as a test case. Covers all four corpus
families: documents (retrieval + pipeline), events, warehouse,
embeddings.

Usage: python tools/fuzz_soak.py [n_rounds_per_family] [seed]
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    rng = random.Random(seed)

    import duckdb

    from pulsar_project_spark.registry import ORACLES, QUERIES
    from pulsar_project_spark.session import get_spark
    spark = get_spark("fuzz_soak", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import tests.test_fuzz_oracle as T

    def rand_texts():
        return [
            " ".join(rng.choices(T._WORDS, k=rng.randint(0, 40)))
            for _ in range(rng.randint(1, 18))
        ]

    def rand_events():
        return [
            (rng.randint(0, 5), rng.randint(0, 18 * 86_400),
             rng.choice(T._EVENT_TYPES), rng.randint(0, 50_000),
             rng.choice([rng.randint(0, 99), "abc", "12x", "", "7.5.3"]))
            for _ in range(rng.randint(1, 60))
        ]

    def rand_warehouse():
        return {
            "customers": [(rng.randint(0, 24), rng.randint(-100_000, 100_000),
                           rng.randint(0, 4))
                          for _ in range(rng.randint(1, 6))],
            "orders": [(rng.randint(0, 5), rng.randint(0, 2),
                        rng.randint(0, 4), rng.randint(0, 5_000_000),
                        rng.randint(0, 364))
                       for _ in range(rng.randint(1, 15))],
            "lineitems": [(rng.randint(0, 14), rng.randint(0, 6),
                           rng.randint(1, 50), rng.randint(0, 200_000),
                           rng.randint(0, 10), rng.randint(0, 400))
                          for _ in range(rng.randint(1, 40))],
            "parts": [(rng.randint(0, 6), rng.randint(0, 1),
                       rng.randint(1, 2), rng.randint(0, 200_000))
                      for _ in range(rng.randint(1, 7))],
        }

    def rand_embeddings():
        return [
            (rng.randint(0, 9),
             [rng.randint(-512, 512) for _ in range(64)])
            for _ in range(rng.randint(2, 12))
        ]

    def check(con, sf_dir, tables, names, tag):
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        bad = []
        for name in names:
            got = T._rowkey(QUERIES[name](spark, sf_dir).collect())
            want = T._rowkey(con.execute(ORACLES[name]).fetchall())
            if got != want:
                bad.append(name)
                print(f"FAIL {tag}: {name}")
        return bad

    failures = 0
    for i in range(n):
        texts = rand_texts()
        try:
            T._assert_family_matches(spark, texts, T._FUZZED)
            T._assert_family_matches(spark, texts, T._PIPELINE_FUZZED)
        except AssertionError as ex:
            failures += 1
            print(f"FAIL docs round {i}: {str(ex)[:300]}")

        con = duckdb.connect()
        failures += len(check(con, T._write_events(rand_events()),
                              ("events", "customer"),
                              T._EVENTS_FUZZED, f"events round {i}"))
        con.close()

        con = duckdb.connect()
        failures += len(check(
            con, T._write_warehouse(rand_warehouse()),
            ("region", "nation", "supplier", "customer", "orders",
             "lineitem", "part"),
            T._STAR_FUZZED, f"warehouse round {i}"))
        con.close()

        con = duckdb.connect()
        failures += len(check(con, T._write_embeddings(rand_embeddings()),
                              ("embeddings",),
                              T._EMBEDDING_FUZZED, f"vectors round {i}"))
        con.close()

        # round-10: joint events+documents+part corpus for the
        # lifecycle capstones
        import shutil

        sf_dir = T._write_events(rand_events())
        doc_dir = T._write_corpus(rand_texts())
        shutil.copy(f"{doc_dir}/documents.parquet",
                    f"{sf_dir}/documents.parquet")
        shutil.copy("/root/testdata/sf0.001/part.parquet",
                    f"{sf_dir}/part.parquet")
        con = duckdb.connect()
        failures += len(check(con, sf_dir,
                              ("events", "documents", "part"),
                              T._CAPSTONES, f"capstones round {i}"))
        con.close()
        print(f"round {i} done")
    print(f"soak done: {n} rounds x 5 corpus families, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
