"""File-level proof of the Z-order data-skipping property.

The oracle-backed census proves the bit math; THIS test proves the
layout outcome the census predicts: after ``zorder_write``, every
parquet file's min/max footer statistics bound BOTH dimensions
tightly, so a box predicate touches few files — while a single-column
sort leaves the second dimension spanning its whole domain in every
file. Asserted from the actual written files' column statistics (the
exact metadata a 100 TB reader prunes with), not from in-memory state.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq

from pulsar_project_spark.operators.layout import zorder_write

_DOMAIN = 256  # 256x256 grid, dims pre-scaled (zorder_write contract)


def _file_spans(path: str, cols: tuple[str, str]):
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.read_metadata(f)
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                col = g.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    mins[name] = (st.min if mins[name] is None
                                  else min(mins[name], st.min))
                    maxs[name] = (st.max if maxs[name] is None
                                  else max(maxs[name], st.max))
        if mins[cols[0]] is not None:
            spans.append({c: (mins[c], maxs[c]) for c in cols})
    return spans


def test_zorder_files_bound_both_dimensions(spark):
    grid = spark.range(_DOMAIN * _DOMAIN).selectExpr(
        f"id div {_DOMAIN} as a", f"id % {_DOMAIN} as b"
    )
    zdir = tempfile.mkdtemp(prefix="zorder_")
    zorder_write(grid, "a", "b", zdir, n_files=16)

    spans = _file_spans(zdir, ("a", "b"))
    assert len(spans) >= 8  # range partitioner may merge a few
    # MOST z-ordered files cover well under the full domain in BOTH
    # dims (16 files over a 2-dim curve -> ~1/4 each). Per-file strict
    # bounds would be wrong: repartitionByRange samples its boundaries,
    # so a file straddling a Morton-cell edge can span a whole dim —
    # assert the median, not the straddler.
    for c in ("a", "b"):
        widths = sorted(s[c][1] - s[c][0] for s in spans)
        assert widths[len(widths) // 2] <= _DOMAIN / 2

    # pruning simulation 1: a single-dim predicate on b alone — the
    # case a sort on a cannot prune AT ALL — must touch a minority of
    # z-ordered files
    lo, hi = 96, 127
    hit_b = sum(1 for s in spans if s["b"][0] <= hi and s["b"][1] >= lo)
    assert hit_b <= len(spans) // 2

    # pruning simulation 2: a box predicate on both dims prunes at
    # least as well
    hit_box = sum(
        1 for s in spans
        if s["a"][0] <= hi and s["a"][1] >= lo
        and s["b"][0] <= hi and s["b"][1] >= lo
    )
    assert hit_box <= hit_b

    # contrast: single-column sort leaves dim b unbounded per file
    sdir = tempfile.mkdtemp(prefix="sorted_")
    (grid.repartitionByRange(16, "a").sortWithinPartitions("a")
     .write.mode("overwrite").parquet(sdir))
    sorted_spans = _file_spans(sdir, ("a", "b"))
    assert all(s["b"][1] - s["b"][0] >= _DOMAIN - 1 for s in sorted_spans)


def test_norm16_overflow_guard_raises_in_both_engines(spark, duck):
    """ADVICE r6: mixed-sign bounds spanning >= 2^63 used to wrap
    silently in Spark (non-ANSI) while DuckDB raised — the engines
    diverged instead of both failing loudly. norm16_sql now carries an
    overflow guard testing the span WITHOUT the subtraction; both
    engines must raise, and in-range mixed-sign bounds must still
    produce identical buckets."""
    import pytest

    from pulsar_project_spark.operators.layout import norm16_sql

    # spanning case: lo ~ -2^62, hi ~ +2^62 -> span ~ 2^63, must raise
    lo, hi = -(1 << 62), (1 << 62)
    spark_expr = norm16_sql("v", str(lo), str(hi), intdiv="div")
    duck_expr = norm16_sql("v", str(lo), str(hi), intdiv="//")
    with pytest.raises(Exception, match="norm16"):
        spark.sql(f"SELECT {spark_expr} AS b FROM (SELECT 0 AS v)").collect()
    with pytest.raises(Exception, match="norm16"):
        duck.execute(f"SELECT {duck_expr} AS b FROM (SELECT 0 AS v)").fetchall()

    # in-range mixed-sign case (span 2^62 < 2^63): both engines agree,
    # divide-first branch, full bucket range covered at the ends
    lo, hi = -(1 << 61), (1 << 61)
    vals = [lo, -1, 0, 1, hi]
    spark_expr = norm16_sql("v", str(lo), str(hi), intdiv="div")
    duck_expr = norm16_sql("v", str(lo), str(hi), intdiv="//")
    got_spark = [
        r["b"] for r in spark.sql(
            f"SELECT {spark_expr} AS b FROM VALUES "
            + ",".join(f"({v}L)" for v in vals) + " AS t(v) ORDER BY v"
        ).collect()
    ]
    got_duck = [
        r[0] for r in duck.execute(
            f"SELECT {duck_expr} AS b FROM (SELECT unnest(?) AS v) ORDER BY v",
            [vals],
        ).fetchall()
    ]
    assert got_spark == got_duck
    assert got_spark[0] == 0 and got_spark[-1] == 65535
    assert all(0 <= b <= 65535 for b in got_spark)


def _hilbert_replica(bits: int, x: int, y: int) -> int:
    """Pure-Python replica of the masked xy→d rounds (verified against
    the classic Wikipedia algorithm during development)."""
    d = 0
    for r in range(bits):
        s = 1 << (bits - 1 - r)
        rx = (x // s) % 2
        ry = (y // s) % 2
        quad = ry if rx == 0 else (2 if ry == 1 else 3)
        d += s * s * quad
        xm, ym = x % s, y % s
        if ry == 1:
            x, y = xm, ym
        elif rx == 1:
            x, y = s - 1 - ym, s - 1 - xm
        else:
            x, y = ym, xm
    return d


def test_hilbert_curve_bijective_and_unit_step():
    """At 6 bits/dim the full 4096-cell domain is exhaustively
    checkable: the map must be a bijection and consecutive indices
    must be Manhattan-adjacent — the defining Hilbert property (Morton
    violates it at every power-of-two seam), and the reason its range
    buckets give tighter file spans."""
    bits = 6
    inv = {}
    for x in range(1 << bits):
        for y in range(1 << bits):
            inv[_hilbert_replica(bits, x, y)] = (x, y)
    assert len(inv) == 1 << (2 * bits)
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(len(inv) - 1)
    )


def test_hilbert_stage_matches_replica(spark):
    from pyspark.sql import functions as F

    from pulsar_project_spark.operators.layout import (
        HILBERT_BITS,
        hilbert_stage,
    )

    import random

    rng = random.Random(17)
    n = 1 << HILBERT_BITS
    pts = [(rng.randrange(n), rng.randrange(n)) for _ in range(500)]
    pts += [(0, 0), (n - 1, n - 1), (0, n - 1), (n - 1, 0)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "i: long, x: long, y: long"
    )
    got = {r["i"]: r["__hd"] for r in hilbert_stage(df, "x", "y").collect()}
    for i, (x, y) in enumerate(pts):
        assert got[i] == _hilbert_replica(HILBERT_BITS, x, y)


def test_hilbert_truncated_rounds_bucket_exact():
    """The census's 3-round shortcut must give the SAME bucket as the
    full 16-round index for every point — the carry-free truncation
    argument (partial sums are multiples of 4^(16−r); the remaining
    rounds add < 4^(16−r)), checked here over a dense sample."""
    from pulsar_project_spark.operators.layout import (
        HILBERT_BITS,
        zbucket_shift,
    )

    import random

    shift = zbucket_shift(64)
    rounds = (2 * HILBERT_BITS - shift + 1) // 2

    def partial(x, y, n):
        d = 0
        for r in range(n):
            s = 1 << (HILBERT_BITS - 1 - r)
            rx = (x // s) % 2
            ry = (y // s) % 2
            quad = ry if rx == 0 else (2 if ry == 1 else 3)
            d += s * s * quad
            xm, ym = x % s, y % s
            if ry == 1:
                x, y = xm, ym
            elif rx == 1:
                x, y = s - 1 - ym, s - 1 - xm
            else:
                x, y = ym, xm
        return d

    rng = random.Random(29)
    for _ in range(20000):
        x, y = rng.randrange(1 << HILBERT_BITS), rng.randrange(1 << HILBERT_BITS)
        assert partial(x, y, rounds) >> shift == \
            partial(x, y, HILBERT_BITS) >> shift
