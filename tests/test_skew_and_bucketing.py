"""Salted join correctness + bucketed-table shuffle elimination."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    from pulsar_project_spark.operators.skew import salted_join
    from pulsar_project_spark.sources.tables import load_events, load_table

    ev = load_events(spark, SF_SMOKE).select("event_id", "user_id", "event_type")
    dim = (
        load_table(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_name")
    )
    plain = ev.join(dim, "user_id").select("event_id", "user_id", "c_name")
    salted = salted_join(ev, dim, key="user_id", salt_col="event_id",
                         n_salts=8).select("event_id", "user_id", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from pulsar_project_spark.operators.skew import write_bucketed
    from pulsar_project_spark.sources.tables import load_table

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    od = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8, path=str(tmp_path / "li_b"))
    write_bucketed(od.withColumnRenamed("o_orderkey", "l_orderkey"),
                   "ord_b", "l_orderkey", 8, path=str(tmp_path / "ord_b"))

    # disable broadcast so the join shape (not size) decides the plan
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan  # bucketing removed both shuffles

        n = joined.count()
        want = li.join(od, li["l_orderkey"] == od["o_orderkey"]).count()
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_declared_bucketed_cojoin_has_no_join_side_exchange(spark):
    """The DECLARED query (not just the helper): its SortMergeJoin must
    read the two bucketed catalog tables with zero Exchange upstream of
    the join — the only shuffle in the plan is the final rollup."""
    import re

    import __spark_entry__ as e

    df = e.queries()["bucketed_cojoin_rollup"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    tree = plan.split("\n\n")[0]
    join_pos = tree.index("SortMergeJoin")
    below = tree[join_pos:]
    assert "Exchange" not in below, below
    # exactly one exchange anywhere: the 5-group aggregate
    assert len(re.findall(r"\+- Exchange", tree)) == 1, tree
