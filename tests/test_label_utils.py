"""Pin functions/labels.py against the reference implementations
(utils.py:12-39, memory.py:347-350), re-implemented here verbatim from
their documented behavior — urlparse/urlunparse path splicing and
strftime stamps — so the Spark expressions are checked case-for-case."""

from __future__ import annotations

import datetime
import re
from urllib.parse import urlparse, urlunparse

from pyspark.sql import functions as F

from pulsar_project_spark.functions.labels import (
    datetime_stamp,
    fact_key,
    random_label,
    robust_urljoin,
)


def _ref_robust_urljoin(base: str, path: str) -> str:
    # reference utils.py:18-39
    bp = urlparse(base)
    base_path = bp.path
    if not base_path or base_path == "/":
        combined = path
    else:
        combined = base_path.rstrip("/") + "/" + path.lstrip("/")
    return urlunparse(bp._replace(path=combined))


URL_CASES = [
    ("https://example.com", "docs/1"),
    ("https://example.com/", "docs/1"),
    ("https://example.com/api/v1/", "/docs/1"),
    ("https://example.com/api/v1", "docs/1"),
    ("https://example.com", "/docs/1"),
    ("https://example.com/base", ""),
    ("http://h:8080/a/b/", "c/d"),
]


def test_robust_urljoin_matches_reference(spark):
    df = spark.createDataFrame(URL_CASES, ["base", "rel"])
    got = df.select("base", "rel", robust_urljoin(F.col("base"), F.col("rel")).alias("url")).collect()
    for row in got:
        assert row.url == _ref_robust_urljoin(row.base, row.rel), (row.base, row.rel)


def test_datetime_stamp_matches_strftime(spark):
    # utils.py:12-13 format '%Y%m%d_%H%M%S_%f' over known epoch micros
    micros = [0, 1_234_567, 1_700_000_000_123_456, 1_786_600_000_999_999]
    df = spark.createDataFrame([(m,) for m in micros], ["ts_us"])
    got = {r.ts_us: r.stamp for r in df.select("ts_us", datetime_stamp(F.col("ts_us")).alias("stamp")).collect()}
    for m in micros:
        want = datetime.datetime.fromtimestamp(
            m / 1_000_000, tz=datetime.timezone.utc
        ).strftime("%Y%m%d_%H%M%S_%f")
        assert got[m] == want, m


def test_fact_key_shape(spark):
    df = spark.createDataFrame([("20260813_101500_000001",)], ["stamp"])
    rows = df.select(
        F.posexplode(F.sequence(F.lit(0), F.lit(2))).alias("p", "i"), "stamp"
    ).select(fact_key(F.col("stamp"), F.col("i")).alias("k")).collect()
    assert [r.k for r in rows] == [
        "fact_20260813_101500_000001_0",
        "fact_20260813_101500_000001_1",
        "fact_20260813_101500_000001_2",
    ]


def test_random_label_shape(spark):
    # rand() suffix → rows-only: assert the reference's label shape
    df = spark.createDataFrame([(1_700_000_000_123_456,)], ["ts_us"])
    (label,) = df.select(random_label(F.col("ts_us"), seed=7).alias("l")).first()
    assert re.fullmatch(r"\d{8}_\d{6}_\d{6}_\d{3}", label), label
