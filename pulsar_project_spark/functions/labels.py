"""Label, datetime-stamp, fact-key, and URL-join expressions — the last
§2.8 utility family (reference ``utils.py:12-39``, ``memory.py:347-350``).

All are pure JVM column expressions (no UDFs). The datetime stamp is
rebuilt from integer microsecond arithmetic on a tz-free epoch value —
NOT via ``date_format(timestamp_micros(...))``, which formats in the
session timezone and would silently disagree with a differently
configured driver session (dates, unlike timestamps, are tz-free in
both Spark and DuckDB, so the date half uses ``date_format`` on a
DateType).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000
US_PER_MIN = 60_000_000
US_PER_SEC = 1_000_000


def _idiv(c: Column, n: int) -> Column:
    # exact integer division for non-negative micros < 2^53
    return ((c - F.pmod(c, F.lit(n))) / F.lit(n)).cast("long")


def datetime_stamp(ts_us: Column) -> Column:
    """``utils.py:12-13`` ``strftime('%Y%m%d_%H%M%S_%f')`` of an epoch-
    microsecond value (the reference stamps wall-clock now(); a
    distributed engine stamps the row's event time so results are
    deterministic and reruns are idempotent)."""
    days = _idiv(ts_us, US_PER_DAY)
    day_us = F.pmod(ts_us, F.lit(US_PER_DAY))
    h = _idiv(day_us, US_PER_HOUR)
    m = _idiv(F.pmod(day_us, F.lit(US_PER_HOUR)), US_PER_MIN)
    s = _idiv(F.pmod(day_us, F.lit(US_PER_MIN)), US_PER_SEC)
    us = F.pmod(day_us, F.lit(US_PER_SEC))
    date_part = F.date_format(
        F.date_add(F.to_date(F.lit("1970-01-01")), days.cast("int")), "yyyyMMdd"
    )
    pad = lambda c, n: F.lpad(c.cast("string"), n, "0")  # noqa: E731
    return F.concat(
        date_part, F.lit("_"), pad(h, 2), pad(m, 2), pad(s, 2),
        F.lit("_"), pad(us, 6),
    )


def label_suffix(seed: Column) -> Column:
    """``utils.py:15-16`` '%03d' random suffix, derandomized: md5 of the
    seed column mod 1000 (portable to DuckDB bit-for-bit — same trick as
    the dedup hash family). For a true-random label use
    ``random_label()`` (rows-only: not oracle-comparable)."""
    h = F.conv(F.substring(F.md5(seed.cast("string")), 1, 8), 16, 10).cast("bigint")
    return F.lpad(F.pmod(h, F.lit(1000)).cast("string"), 3, "0")


def random_label(ts_us: Column, seed: int | None = None) -> Column:
    """The reference's ``get_random_label`` verbatim semantics: stamp +
    '_' + random 3-digit suffix. rand() makes it non-deterministic →
    rows-only; the oracle-checked twin uses ``label_suffix``."""
    r = F.rand(seed) if seed is not None else F.rand()
    suffix = F.lpad(F.floor(r * 1000).cast("string"), 3, "0")
    return F.concat(datetime_stamp(ts_us), F.lit("_"), suffix)


def fact_key(stamp: Column, idx: Column) -> Column:
    """``memory.py:347-350``: ``f"fact_{stamp}_{i}"`` for each element
    of a key_facts list (the enumerate index arrives from posexplode)."""
    return F.concat(F.lit("fact_"), stamp, F.lit("_"), idx.cast("string"))


def robust_urljoin(base: Column, rel: Column) -> Column:
    """``utils.py:18-39`` path-preserving URL join, matching the
    reference (urlparse → path splice → urlunparse) case-for-case:

    * base path empty or '/' → combined = rel as-is;
    * else rtrim('/', base path) + '/' + ltrim('/', rel);
    * urlunparse re-inserts the leading '/' when a netloc is present
      and the combined path is non-empty without one.
    """
    scheme_netloc = F.regexp_extract(base, r"^(\w+://[^/]*)", 1)
    base_path = F.regexp_extract(base, r"^\w+://[^/]*(/.*)?$", 1)
    combined = F.when(
        base_path.isin("", "/"), rel
    ).otherwise(
        F.concat(
            F.regexp_replace(base_path, "/+$", ""),
            F.lit("/"),
            F.regexp_replace(rel, "^/+", ""),
        )
    )
    normalized = F.when(
        (combined != "") & (~combined.startswith("/")), F.concat(F.lit("/"), combined)
    ).otherwise(combined)
    return F.concat(scheme_netloc, normalized)
