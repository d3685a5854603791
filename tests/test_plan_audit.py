"""Physical-plan audit as a pytest gate (tools/explain_audit.py).

Every declared batch query's plan must be free of accidental
CartesianProduct / BroadcastNestedLoopJoin (quadratic or broadcast-the-
world shapes — the ALLOWED_NESTED_LOOP list names the queries where a
tiny-side nested loop IS the algorithm), and known filter-pushdown
queries must show non-empty PushedFilters on their parquet scans.
Plans are built at the smoke scale factor; iterative operators execute
their fit loops at plan-build time, which is why this runs at sf0.001.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as e
from tests.conftest import SF_SMOKE, canary_params
from tools.explain_audit import audit

_SKIP = {"mq_pipeline_roundtrip"}  # streaming plans audited via their tests

_NAMES = [
    n for n in sorted(e.queries())
    if not n.startswith("streaming_") and n not in _SKIP
]


@pytest.mark.parametrize("name", canary_params(_NAMES))
def test_no_accidental_nested_loop(name, spark):
    df = e.queries()[name](spark, SF_SMOKE)
    flags, summary, plan = audit(name, df)
    assert not flags, f"{name}: {flags}\n{summary}\n{plan[:4000]}"


# Queries whose defining predicate MUST reach the parquet scan — a scan
# reading every row for these means pushdown was lost.
_PUSHDOWN_REQUIRED = [
    "parts_no_bulk_order",       # l_quantity >= 45 at the lineitem scan
    "top_revenue_orders",        # ship-date range at the lineitem scan
    "except_click_days_no_purchase",  # event_type filters at the events scan
]


@pytest.mark.parametrize("name", _PUSHDOWN_REQUIRED)
def test_filter_pushdown_reaches_scan(name, spark):
    import re

    df = e.queries()[name](spark, SF_SMOKE)
    _, _, plan = audit(name, df)
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    assert any(p.strip() for p in pushed), (
        f"{name}: no non-empty PushedFilters in any scan\n{plan[:4000]}"
    )


def test_partitioned_prune_shows_partition_filters(spark):
    """The partitioned-layout query must prune at the directory level:
    its scan node carries PartitionFilters on event_type (planning-time
    pruning), not a row-level filter over all partitions."""
    import contextlib
    import io

    df = e.queries()["partitioned_prune_purchase_days"](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "event_type" in pf and "purchase" in pf


# Queries whose scan must read a PRUNED schema — a scan fetching all
# columns for a narrow projection means column pruning was lost (at
# 100 TB the difference is reading `text` or not).
_PRUNING_REQUIRED = {
    "training_order_shuffle": {"doc_id"},           # never reads text
    "length_bucket_padding_stats": {"n_chars"},     # never reads text
    "simple_rag_topk": {"doc_id", "text"},          # not lang/source/n_chars
}


@pytest.mark.parametrize("name", sorted(_PRUNING_REQUIRED))
def test_column_pruning_reaches_scan(name, spark):
    import re

    df = e.queries()[name](spark, SF_SMOKE)
    _, _, plan = audit(name, df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"{name}: no ReadSchema in plan\n{plan[:2000]}"
    read_cols = {
        c.split(":")[0].strip()
        for s in schemas for c in s.split(",") if c.strip()
    }
    allowed = _PRUNING_REQUIRED[name]
    assert read_cols <= allowed, (
        f"{name}: scan reads {sorted(read_cols - allowed)} beyond the "
        f"projection {sorted(allowed)}\n{plan[:2000]}"
    )
