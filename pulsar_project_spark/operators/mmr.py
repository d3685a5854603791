"""Maximal Marginal Relevance (MMR) rerank — diversity-aware top-k.

Carbonell & Goldstein's MMR (SIGIR '98): greedily pick the candidate
maximizing ``λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`` — relevance traded
against redundancy with the already-selected set S. The standard second
stage after retrieval when the top-k must not be k near-duplicates
(which, post-dedup corpora aside, it often is).

Execution shape: MMR is inherently sequential in k, but the candidate
set is small BY CONSTRUCTION (a retrieval stage's top-N, N≈50-1000), so
the right plan is: distributed stages produce the candidate set, then
ONE Arrow batch on ONE executor runs the O(N·k) greedy loop via
``applyInPandas`` over a constant group key — no driver collect, no
per-row Python. At 100 TB the cost lives in the candidate stages (BM25
/ ANN), not here; this stays O(N·k·dim) regardless of corpus size.

Determinism: ties break (score desc, doc_id asc) — same rule as every
top-k in the engine; float math is numpy float64 row-wise, no
cross-row reduction whose order could vary.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

MMR_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("rel", DoubleType()),
    StructField("mmr_score", DoubleType()),
    StructField("rank", IntegerType()),
])


def mmr_select(pdf: pd.DataFrame, k: int, lam: float) -> pd.DataFrame:
    """Greedy MMR over one pandas batch: columns (doc_id, rel,
    embedding). Pure function — unit tests pin it against an
    independent numpy replica."""
    ids = pdf["doc_id"].to_numpy()
    rel = pdf["rel"].to_numpy(dtype=np.float64)
    emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.sqrt((emb * emb).sum(axis=1))
    norms[norms == 0.0] = 1.0
    unit = emb / norms[:, None]

    n = len(ids)
    k = min(k, n)
    selected: list[int] = []
    # -inf, not 0: max similarity to the selected set can be negative,
    # and clamping it at 0 would erase the diversity bonus for
    # anti-correlated candidates.
    max_sim = np.full(n, -np.inf)
    out_rows = []
    remaining = np.ones(n, dtype=bool)
    for rank in range(1, k + 1):
        if selected:
            score = lam * rel - (1.0 - lam) * max_sim
        else:
            score = rel.copy()
        score[~remaining] = -np.inf
        # argmax with (score desc, doc_id asc) tiebreak
        best = np.lexsort((ids, -score))[0]
        out_rows.append((int(ids[best]), float(rel[best]),
                         float(score[best]), rank))
        remaining[best] = False
        sims = unit @ unit[best]
        max_sim = np.maximum(max_sim, sims)
        selected.append(best)
    return pd.DataFrame(out_rows, columns=["doc_id", "rel", "mmr_score", "rank"])


MMR_Q_SCHEMA = StructType([
    StructField("rank", IntegerType()),
    StructField("doc_id", LongType()),
    StructField("rel_q", LongType()),
    StructField("mmr_q", LongType()),
])


def mmr_select_q(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """Integer-exact MMR greedy, λ = 7/10: columns (doc_id, rel_q, qv)
    where qv is the floor(v·1e6) BIGINT quantization and rel_q the
    integer dot against the query vector. All arithmetic is int64 —
    bitwise engine-independent — so unlike the float ``mmr_select``
    this variant IS oracle-checkable: a DuckDB recursive CTE replays
    the same greedy argmax exactly (queries/retrieval.py).

    Scores: rank 1 picks argmax rel (emitted ×10 to share the λ-scaled
    integer scale); rank n>1 picks argmax of ``7·rel − 3·max_{s∈S}
    dot(c, s)``. Ties break (score desc, doc_id asc) — the engine-wide
    top-k rule."""
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    rel = pdf["rel_q"].to_numpy(dtype=np.int64)
    qv = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
    n = len(ids)
    k = min(k, n)
    sims = qv @ qv.T  # pairwise integer dots; |v_i| ≤ 1e6·√dim ⇒ fits int64
    remaining = np.ones(n, dtype=bool)
    selected: list[int] = []
    rows = []
    for rank in range(1, k + 1):
        if selected:
            max_sim = sims[:, selected].max(axis=1)
            score = 7 * rel - 3 * max_sim
        else:
            score = 10 * rel
        best = min(
            (i for i in range(n) if remaining[i]),
            key=lambda i: (-int(score[i]), int(ids[i])),
        )
        rows.append((rank, int(ids[best]), int(rel[best]), int(score[best])))
        remaining[best] = False
        selected.append(best)
    return pd.DataFrame(rows, columns=["rank", "doc_id", "rel_q", "mmr_q"])


def mmr_rerank_q(cands: DataFrame, k: int = 5) -> DataFrame:
    """Integer-exact MMR over a candidate DataFrame (doc_id, rel_q, qv).
    Same single-Arrow-batch execution shape as ``mmr_rerank``."""
    def apply(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return mmr_select_q(pdf.sort_values("doc_id", kind="stable"), k)

    return (
        cands.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(apply, schema=MMR_Q_SCHEMA)
    )


def mmr_rerank(cands: DataFrame, k: int = 10, lam: float = 0.7) -> DataFrame:
    """Rerank a candidate DataFrame (doc_id, rel, embedding) with MMR.
    The whole candidate set is one group (it is small by construction —
    a prior top-N stage), so the greedy loop runs as a single Arrow
    batch on an executor."""
    def apply(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return mmr_select(pdf.sort_values("doc_id", kind="stable"), k, lam)

    return (
        cands.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(apply, schema=MMR_SCHEMA)
    )
