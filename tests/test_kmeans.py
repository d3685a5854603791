"""k-means parity: the distributed quantized Lloyd's must match a
driver-side numpy replica EXACTLY (integer math → no tolerance)."""

from __future__ import annotations

import math

import numpy as np

from tests.conftest import SF_SMOKE

K, ITERS = 4, 3


def _numpy_kmeans(vecs: dict[int, np.ndarray], k: int, iters: int):
    q = {i: np.floor(v.astype(np.float64) * 1_000_000).astype(np.int64)
         for i, v in vecs.items()}
    cent = {label: q[label].copy() for label in range(k)}
    assign = {}
    for _ in range(iters):
        for i, v in q.items():
            dists = [(int(((v - cent[c]) ** 2).sum()), c) for c in sorted(cent)]
            sq, label = min(dists)
            assign[i] = (label, sq)
        for c in range(k):
            members = [q[i] for i, (lb, _) in assign.items() if lb == c]
            if members:
                s = np.stack(members).sum(axis=0)
                cent[c] = np.array(
                    [math.floor(x / len(members)) for x in s], dtype=np.int64
                )
    return assign


def test_kmeans_matches_numpy_replica(spark):
    from pulsar_project_spark.operators.kmeans import kmeans_assign
    from pulsar_project_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = {
        r["vec_id"]: (r["label"], r["sq_dist"])
        for r in kmeans_assign(emb, k=K, iters=ITERS).collect()
    }
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
        for r in emb.select("vec_id", "embedding").collect()
    }
    want = _numpy_kmeans(vecs, K, ITERS)
    assert got == want
