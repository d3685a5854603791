"""Local replica of the driver's correctness gate.

Runs every declared query (Spark) against its DuckDB oracle at a chosen
scale factor and compares row count, column names, and values
(order-insensitive; floats compared exactly AND with tolerance so we can
see how close the value-hash would be).

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def canon(df):
    """pandas frame → sorted-by-all-columns, columns sorted by name."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf, duck_pdf) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"]
    if len(spark_pdf) != len(duck_pdf):
        return [f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}"]
    s, d = canon(spark_pdf), canon(duck_pdf)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        n_exact = n_close = n_diff = 0
        max_rel = 0.0
        example = None
        for a, b in zip(sv, dv):
            if a is None and b is None:
                n_exact += 1
                continue
            try:
                if isinstance(a, float) or isinstance(b, float):
                    fa, fb = float(a), float(b)
                    if fa == fb or (math.isnan(fa) and math.isnan(fb)):
                        n_exact += 1
                    elif math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12):
                        n_close += 1
                        max_rel = max(max_rel, abs(fa - fb) / max(abs(fa), abs(fb), 1e-300))
                    else:
                        n_diff += 1
                        if example is None:
                            example = (a, b)
                elif str(a) == str(b):
                    n_exact += 1
                else:
                    n_diff += 1
                    if example is None:
                        example = (a, b)
            except (TypeError, ValueError):
                if str(a) == str(b):
                    n_exact += 1
                else:
                    n_diff += 1
                    if example is None:
                        example = (a, b)
        if n_diff:
            problems.append(f"col {col}: {n_diff} DIFF (example {example}), {n_close} close, {n_exact} exact")
        elif n_close:
            problems.append(f"col {col}: NOT BIT-EXACT — {n_close} rows within 1e-9 (max rel {max_rel:.2e}); hash would likely FAIL")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as e
    from pulsar_project_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    from pulsar_project_spark.sources.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check; {len(sdf)} rows)")
            n_noracle += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, {len(sdf.columns)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
