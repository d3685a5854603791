#!/usr/bin/env python
"""Derive a 10x-scale (~sf1.0) corpus from the shipped sf0.1 tables.

The driver ships sf{0.001,0.01,0.1}; the scaling proof-point (VERDICT r3
ask #5) wants one decade of measured scaling above the per-round bench
SF. This derives sf1.0-equivalent FACT tables by unioning ten
id-offset copies of sf0.1 (documents, events, embeddings, orders,
lineitem — ids offset by copy*(max_id+1) so the uniqueness contracts
hold; lineitem's orderkey gets the SAME offset as orders so join
integrity is preserved), while DIMENSIONS stay as-is — exactly the
100 TB shape the engine documents (facts grow unbounded, dims stay
catalog-sized and broadcastable, sources/tables.py).

Caveats, stated where the numbers are reported: document text gets a
tiny per-copy suffix so the corpus isn't 90% EXACT duplicates, but the
ten copies of each doc remain near-identical — near-dup/LSH queries
therefore see a worst-case-dense duplicate graph at sf1, not a clean
10x of independent docs. Embeddings are copied verbatim (top-k queries
tolerate duplicate vectors).

Output: /tmp/sf1_derived/*.parquet (regenerable scratch, not shipped).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_derived"
COPIES = 10

DIMS = ("region", "nation", "customer", "supplier", "part")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )

    specs = {
        # table: (id column, extra select rewrite)
        "documents": ("doc_id",
                      "doc_id + c.i * (SELECT max(doc_id)+1 FROM t) AS doc_id, "
                      "CASE WHEN c.i = 0 THEN text "
                      "ELSE text || ' c' || c.i END AS text, "
                      "lang, source, "
                      "CASE WHEN c.i = 0 THEN n_chars "
                      "ELSE n_chars + 2 + len(CAST(c.i AS VARCHAR)) END AS n_chars"),
        "events": ("event_id",
                   "event_id + c.i * (SELECT max(event_id)+1 FROM t) AS event_id, "
                   "ts, user_id, event_type, value, props"),
        "embeddings": ("vec_id",
                       "vec_id + c.i * (SELECT max(vec_id)+1 FROM t) AS vec_id, "
                       "embedding, label"),
        "orders": ("o_orderkey",
                   "o_orderkey + c.i * (SELECT max(o_orderkey)+1 FROM t) AS o_orderkey, "
                   "* EXCLUDE (o_orderkey)"),
        "lineitem": ("l_orderkey",
                     # SAME offset base as orders (max o_orderkey), so the
                     # scaled foreign key still resolves
                     "l_orderkey + c.i * (SELECT max(o_orderkey)+1 FROM "
                     "read_parquet('{src}/orders.parquet')) AS l_orderkey, "
                     "* EXCLUDE (l_orderkey)"),
    }
    for t, (key, proj) in specs.items():
        proj = proj.format(src=SRC)
        con.execute(
            f"COPY (WITH t AS (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"SELECT {proj} FROM t, (SELECT unnest(range({COPIES})) AS i) c "
            f"ORDER BY {key}) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t in list(specs) + list(DIMS):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
