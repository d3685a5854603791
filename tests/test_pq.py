"""Pins for product quantization beyond the oracle's bit parity.

Zero-residual exactness: a vector sitting EXACTLY on a codebook
centroid combination must encode to those codes, and its ADC distance
to any query must equal the true quantized squared distance (PQ's
approximation error IS the residual; at residual zero, ADC is exact).
This separates "the argmin matches the oracle" from "the geometry is
right".
"""

from __future__ import annotations

from pulsar_project_spark.operators.pq import (
    PQ_DIM,
    PQ_K,
    PQ_M,
    PQ_SCALE,
    PQ_SUB,
    pq_adc_topk,
    pq_codebook,
    pq_encode,
    pq_query_lut,
)


def _centroid_vector(codes: list[int]) -> list[float]:
    """Float vector whose quantization lands exactly on the given
    centroid per subspace (codebook values are multiples of PQ_SCALE,
    so value/SCALE is exactly representable and floor() recovers it)."""
    v = []
    for m in range(PQ_M):
        for j in range(PQ_SUB):
            v.append(pq_codebook(m, codes[m], j) / PQ_SCALE)
    return v


def test_zero_residual_vectors_encode_to_their_codes(spark):
    rows = []
    expected = {}
    for i in range(8):
        codes = [(i + m) % PQ_K for m in range(PQ_M)]
        rows.append((i, _centroid_vector(codes)))
        expected[i] = codes
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got: dict[int, dict[int, int]] = {}
    for r in pq_encode(vecs).collect():
        got.setdefault(r["vec_id"], {})[r["subspace"]] = r["code"]
    for i, codes in expected.items():
        assert [got[i][m] for m in range(PQ_M)] == codes


def test_adc_is_exact_at_zero_residual(spark):
    codes = [1] * PQ_M
    vecs = spark.createDataFrame(
        [(0, _centroid_vector(codes))], "vec_id long, embedding array<double>"
    )
    query_q = [(((i * 5) % 7) - 3) * PQ_SCALE for i in range(PQ_DIM)]
    [row] = pq_adc_topk(pq_encode(vecs), query_q, k=1).collect()
    true_sq = sum(
        (query_q[m * PQ_SUB + j] - pq_codebook(m, 1, j)) ** 2
        for m in range(PQ_M) for j in range(PQ_SUB)
    )
    assert row["adc_dist"] == true_sq
    # and the LUT the operator builds is the same closed form
    lut = {(m, c): d for m, c, d in pq_query_lut(query_q)}
    assert sum(lut[(m, 1)] for m in range(PQ_M)) == true_sq
