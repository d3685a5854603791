"""Integer-PageRank pins beyond the oracle's bit parity.

The oracle proves Spark == DuckDB on the same closed form; these pin
that the closed form IS PageRank: an independent pure-Python replica
(dict arithmetic, no Spark) must match EXACTLY (the kmeans replica
pattern), dangling mass must be redistributed (scores on a sink-only
graph must not decay to the teleport floor), and a hub must outrank a
leaf.
"""

from __future__ import annotations
import pytest

from pulsar_project_spark.operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    pagerank_integer,
)


def _replica(nodes, edges, iters):
    """Pure-Python mirror of the integer update rule."""
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    scores = {n: PR_SCALE for n in nodes}
    n = len(nodes)
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, d, w in edges:
            inflow[d] += (scores[s] * w) // outw[s]
        dang = sum(scores[u] for u in nodes if u not in outw)
        scores = {
            v: ((PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE
                + PR_DAMP_NUM * (inflow[v] + dang // n)) // PR_DAMP_DEN
            for v in nodes
        }
    return scores


def _spark_pr(spark, nodes, edges, iters):
    ndf = spark.createDataFrame([(x,) for x in nodes], "node string")
    edf = spark.createDataFrame(edges, "src string, dst string, w long")
    return {r.node: r.score
            for r in pagerank_integer(ndf, edf, iters=iters).collect()}


@pytest.mark.gate  # full replica certification
def test_matches_pure_python_replica_exactly(spark):
    nodes = ["a", "b", "c", "d", "e"]
    edges = [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "c", 1),
             ("d", "a", 5)]  # e is dangling, d is a source
    for iters in (1, 3):
        got = _spark_pr(spark, nodes, edges, iters)
        want = _replica(nodes, edges, iters)
        assert got == want, f"iters={iters}: {got} != {want}"


def test_dangling_mass_is_redistributed(spark):
    # every node dangles -> each round every node gets teleport + its
    # uniform share of ALL prior mass; with N=2 the scores stay at
    # exactly PR_SCALE forever rather than decaying to 0.15*SCALE
    got = _spark_pr(spark, ["x", "y"], [], 3)
    want = _replica(["x", "y"], [], 3)
    assert got == want
    assert got["x"] == PR_SCALE


def test_hub_outranks_sources(spark):
    # everyone points at h; h forwards to one leaf. Both h (3 in-edges)
    # and l (h's entire outflow) must outrank the in-degree-0 sources;
    # exact values pinned by the replica.
    nodes = ["h", "l", "u1", "u2", "u3"]
    edges = [("u1", "h", 1), ("u2", "h", 1), ("u3", "h", 1), ("h", "l", 1)]
    got = _spark_pr(spark, nodes, edges, 3)
    assert got["h"] > got["u1"] and got["l"] > got["u1"]
    assert got == _replica(nodes, edges, 3)
