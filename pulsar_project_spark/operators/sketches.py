"""Count-min sketch as pure relational algebra.

The reference has no approximate structures at all (SURVEY.md §2.4);
at 100 TB a heavy-hitter census over a high-cardinality key (which
users/domains/shingles dominate the stream?) can't afford an exact
per-key aggregate every time. The count-min sketch bounds the answer
with a FIXED-size counter table; unlike the engine-private HLL/KLL
sketches (rows-only by necessity), this one is built entirely from
md5-lane hashing + one groupBy — so its every counter is replayable by
the DuckDB oracle, giving the sketch family a hash-level certification.

Properties (pinned in tests/test_count_min.py):
* estimate >= exact count, always (counters only ever over-count);
* with width W and depth D, the overestimate is bounded by
  ~ 2N/W per row with probability 1 - (1/2)^D at the textbook load.
* The sketch is MERGEABLE: counters add pointwise across shards,
  so per-partition sketches combine map-side like any sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_WIDTH = 1 << 12          # 4,096 counters per row
CMS_DEPTH = 3                # independent md5 lanes
_CMS_OFFSETS = (1, 9, 17)    # disjoint 8-hex-char lanes, as the bloom


def _cms_pos(key_expr: str, off: int) -> F.Column:
    """Row-``off``'s counter index for a key: 32-bit md5 lane mod W —
    `conv(hex,16,10)` ≡ the oracle's `('0x'||hex)::BIGINT` exactly."""
    return F.expr(
        f"cast(conv(substring(md5(cast({key_expr} as string)), {off}, 8), "
        f"16, 10) as bigint) % {CMS_WIDTH}"
    )


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """(depth INT, pos BIGINT, cnt BIGINT): the count-min counter table
    — every input row increments one counter per depth. One explode
    (×D) + one groupBy over at most D·W groups; counts are plain sums,
    so partial aggregation combines map-side and sketches from
    different shards merge by adding counters pointwise."""
    cells = df.select(
        F.explode(F.array(*[
            F.struct(
                F.lit(d).cast("int").alias("depth"),
                _cms_pos(key_col, off).alias("pos"),
            )
            for d, off in enumerate(_CMS_OFFSETS)
        ])).alias("c")
    )
    return cells.groupBy(
        F.col("c.depth").alias("depth"), F.col("c.pos").alias("pos")
    ).agg(F.count("*").alias("cnt"))


def cms_estimate(probes: DataFrame, cms: DataFrame,
                 key_col: str) -> DataFrame:
    """Point-estimate each probe key against the sketch: min over the
    D counters the key hashes to. The sketch relation is ≤ D·W rows
    (~12k) — broadcast; the probe side never shuffles. Returns the
    probe rows + ``cms_estimate``."""
    pos_cols = [
        _cms_pos(key_col, off).alias(f"__p{d}")
        for d, off in enumerate(_CMS_OFFSETS)
    ]
    p = probes.select("*", *pos_cols)
    for d in range(CMS_DEPTH):
        c = cms.filter(F.col("depth") == d).select(
            F.col("pos").alias(f"__p{d}"),
            F.col("cnt").alias(f"__c{d}"),
        )
        p = p.join(F.broadcast(c), f"__p{d}", "left")
    est = F.least(*[
        F.coalesce(F.col(f"__c{d}"), F.lit(0)) for d in range(CMS_DEPTH)
    ])
    return p.select(
        *[c for c in probes.columns],
        est.cast("bigint").alias("cms_estimate"),
    )


# --- Linear-counting distinct sketch -----------------------------------------
#
# Third member of the relational sketch trio: Bloom answers membership,
# count-min answers frequency, linear counting answers DISTINCT — and
# like the other two its state is pure relational algebra (a bitmap as
# a (group, word_idx, bits) relation, one bit_or aggregation), so the
# oracle certifies every bit. The ESTIMATE (-m·ln(z/m)) involves a
# transcendental whose last bits differ across libms, so the declared
# query emits the exact integers (set-bit count, m) and leaves the one
# float op to the consumer; tests pin the estimate's accuracy.

LC_M_BITS = 1 << 13       # 8,192 bits per group (~1 KB) — good to ~5k
LC_WORD_BITS = 62         # same DuckDB 1<<63 overflow dodge as the bloom


def lc_build(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, word_idx BIGINT, bits BIGINT): per-group linear-counting
    bitmap — every key hashes to ONE bit (md5 lane, as the bloom's).
    One projection + one bit_or groupBy over ≤ groups × m/62 cells;
    bitmaps merge across shards by bit_or, so partial aggregation
    combines map-side like any other distributive agg."""
    pos = F.expr(
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 8), "
        f"16, 10) as bigint) % {LC_M_BITS}"
    )
    cells = df.select(F.col(group_col), pos.alias("pos"))
    return cells.groupBy(
        group_col, F.expr(f"pos div {LC_WORD_BITS}").alias("word_idx")
    ).agg(
        F.expr(f"bit_or(shiftleft(1L, cast(pos % {LC_WORD_BITS} as int)))")
        .alias("bits")
    )


def lc_set_bits(lc: DataFrame, group_col: str) -> DataFrame:
    """Per-group census of the bitmap: exact set-bit count (bit_count
    is JVM-native popcount) + the sketch size. ``n_set_bits`` is the
    sufficient statistic: distinct ≈ -m·ln(1 - n_set_bits/m), left to
    the consumer to keep the relation engine-exact."""
    return lc.groupBy(group_col).agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_set_bits"),
        F.lit(LC_M_BITS).cast("bigint").alias("m_bits"),
    )
