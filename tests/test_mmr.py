"""MMR rerank pinned against an independent numpy replica.

The declared query has no DuckDB oracle (greedy k-step argmax is
iterative), so this test IS its correctness gate: an intentionally
separate, loop-per-step reference implementation must agree exactly on
the selected ids, order, and scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pulsar_project_spark.operators.mmr import mmr_select


def _reference_mmr(ids, rel, emb, k, lam):
    """Straight-from-the-paper replica: explicit loops, no vectorized
    max-sim caching — a genuinely different implementation."""
    ids = list(ids)
    rel = [float(r) for r in rel]
    unit = []
    for v in emb:
        v = np.asarray(v, dtype=np.float64)
        n = np.sqrt(float(v @ v)) or 1.0
        unit.append(v / n)
    selected = []
    out = []
    for rank in range(1, min(k, len(ids)) + 1):
        best = None
        best_key = None
        for i in range(len(ids)):
            if i in selected:
                continue
            if selected:
                ms = max(float(unit[i] @ unit[j]) for j in selected)
                score = lam * rel[i] - (1.0 - lam) * ms
            else:
                score = rel[i]
            key = (-score, ids[i])
            if best_key is None or key < best_key:
                best, best_key = i, key
        out.append((ids[best], rel[best], -best_key[0], rank))
        selected.append(best)
    return out


@pytest.mark.parametrize("seed", [0, 7])
def test_mmr_select_matches_reference(seed):
    rng = np.random.default_rng(seed)
    n, dim, k, lam = 40, 16, 10, 0.7
    ids = np.arange(n) * 3 + 1  # sparse, offset ids — no density assumption
    rel = np.round(rng.uniform(0, 2, n), 3)
    emb = rng.normal(size=(n, dim))
    pdf = pd.DataFrame({
        "doc_id": ids,
        "rel": rel,
        "embedding": [emb[i] for i in range(n)],
    })
    got = mmr_select(pdf, k, lam)
    want = _reference_mmr(ids, rel, emb, k, lam)
    assert list(map(tuple, got.to_numpy())) == [
        (i, r, pytest.approx(s), rk) for (i, r, s, rk) in want
    ]


def test_mmr_first_pick_is_pure_relevance_and_diversity_changes_order():
    # two near-identical high-rel docs + one distinct lower-rel doc:
    # MMR must pick the distinct doc second.
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "rel": [1.0, 0.99, 0.5],
        "embedding": [np.array([1.0, 0.0]), np.array([1.0, 0.01]),
                      np.array([0.0, 1.0])],
    })
    got = mmr_select(pdf, k=3, lam=0.5)
    assert list(got["doc_id"]) == [1, 3, 2]
    assert list(got["rank"]) == [1, 2, 3]


def test_mmr_ties_break_by_doc_id():
    same = np.array([1.0, 0.0])
    pdf = pd.DataFrame({
        "doc_id": [9, 4, 6],
        "rel": [1.0, 1.0, 1.0],
        "embedding": [same, same, same],
    })
    got = mmr_select(pdf, k=1, lam=0.7)
    assert list(got["doc_id"]) == [4]
