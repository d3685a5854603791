"""Skew and co-location tools for joins at scale.

AQE's runtime skew-join splitting (enabled in session.py) handles most
skew transparently; these are the explicit levers for the cases AQE
can't fix:

* **salted_join** — when ONE side has pathological hot keys (the
  power-law user, the empty-string key) and the other side is too big
  to broadcast: explode the small-ish side ×S, scatter the big side's
  hot rows across S sub-keys with a deterministic salt. The shuffle for
  a hot key spreads over S reducers instead of one.
* **bucketed tables** — pre-shuffle once at write time
  (``bucketBy(n, key)`` + ``sortBy``), then every future equi-join or
  aggregation on that key runs shuffle-free: at 100 TB the fact-to-fact
  join (orders ⨝ lineitem) is THE shuffle, and bucketing both sides on
  the join key amortizes it across every downstream query.

Salts are deterministic (hash of a caller-named column, never rand())
so results stay reproducible and retries idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_col: str, n_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join with the big side's rows scattered across ``n_salts``
    sub-keys (salt = hash of ``salt_col`` mod n, deterministic) and the
    small side replicated ×n. Result == plain ``big.join(small, key)``
    for ``how`` in {inner, left, left_semi, left_anti} — the join types
    where an unmatched SMALL-side row is never emitted. right/full would
    emit every unmatched small-side row once per replica (×n_salts), so
    they are rejected here rather than silently wrong."""
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}, got {how!r}: "
            "the replicated small side would emit unmatched rows "
            "n_salts times under right/full joins"
        )
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).cast("int")
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort_col: str | None = None, path: str | None = None) -> None:
    """Persist a table pre-shuffled on ``key``: downstream equi-joins
    and aggregations on ``key`` between same-bucketed tables run with
    no Exchange. ``path`` makes it an external table (bucketing requires
    the catalog, but data can live anywhere)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
