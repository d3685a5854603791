"""Pins for the baseline-JPEG entropy codec the oracle can't see.

The oracle certifies coefficient recovery; these pin stream-level
properties: the scan really contains restart markers and stuffed
bytes (i.e., those code paths run, not just exist), and corruption is
detected rather than silently mis-decoded.
"""

from __future__ import annotations

import pytest

from pulsar_project_spark.operators.jpeg import (
    RESTART_INTERVAL,
    decode_jpeg_coefs,
    encode_jpeg,
    jpeg_dims,
)


def _scan_bytes(payload: bytes) -> bytes:
    # everything after the SOS segment header
    i = payload.index(b"\xff\xda")
    ln = int.from_bytes(payload[i + 2:i + 4], "big")
    return payload[i + 2 + ln:-2]


def test_restart_markers_present_and_reset_prediction():
    # doc 1 has (32//8)*(24//8) = 12 blocks -> 2 restarts at interval 4
    payload = encode_jpeg(1)
    w, h = jpeg_dims(1)
    n_blocks = (w // 8) * (h // 8)
    scan = _scan_bytes(payload)
    rsts = [scan.count(bytes([0xFF, 0xD0 + i])) for i in range(8)]
    assert sum(rsts) == (n_blocks - 1) // RESTART_INTERVAL
    # decode succeeds -> prediction reset matched on both sides
    nb, _, blocks = decode_jpeg_coefs(payload)
    assert nb == n_blocks and len(blocks) == n_blocks


def test_byte_stuffing_occurs_across_corpus():
    # at least one doc's entropy data must contain a stuffed 0xFF00
    assert any(b"\xff\x00" in _scan_bytes(encode_jpeg(d))
               for d in range(64))


def test_corrupted_entropy_data_is_detected():
    payload = bytearray(encode_jpeg(5))
    i = payload.index(b"\xff\xda") + 20
    payload[i] ^= 0x55
    with pytest.raises((ValueError, AssertionError, IndexError, KeyError)):
        decode_jpeg_coefs(bytes(payload))


def test_spark_roundtrip_matches_plan(spark):
    from pyspark.sql import functions as F

    from pulsar_project_spark.operators.jpeg import (
        decode_jpeg_features,
        jpeg_qcoefs,
        synthesize_jpeg,
    )
    docs = spark.createDataFrame([(i,) for i in range(24)], "doc_id long")
    got = {r["doc_id"]: r for r in
           decode_jpeg_features(synthesize_jpeg(docs)).collect()}
    for d in range(24):
        w, h = jpeg_dims(d)
        nb = (w // 8) * (h // 8)
        plan = [jpeg_qcoefs(d, b) for b in range(nb)]
        assert got[d]["n_blocks"] == nb
        assert got[d]["sum_dc"] == sum(q[0] for q in plan)
        assert got[d]["sum_abs_ac"] == sum(abs(c) for q in plan for c in q[1:])


# --- round-6 pixel path: the integer IDCT must BE an IDCT -------------------


def test_integer_idct_tracks_float_idct_within_one():
    """The fixed-point kernel is only certified self-consistent by the
    oracle; this pins that it's a real inverse DCT: for a spread of
    docs, every decoded sample must sit within 1 of the float-IDCT
    reference (2^14 fractional bits leave sub-LSB error)."""
    import math

    import numpy as np

    from pulsar_project_spark.operators.jpeg import (
        decode_jpeg_coefs,
        decode_jpeg_pixels_one,
        encode_jpeg,
        zigzag_uv,
    )

    zz = zigzag_uv()
    for doc_id in (-9, 0, 1, 7, 42):
        payload = encode_jpeg(doc_id)
        got = decode_jpeg_pixels_one(payload)
        _, qt, blocks = decode_jpeg_coefs(payload)
        for b, q in enumerate(blocks):
            ref = np.zeros((8, 8))
            for z, c in enumerate(q):
                if not c:
                    continue
                u, v = zz[z]
                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                cv = 1 / math.sqrt(2) if v == 0 else 1.0
                ys = np.cos((2 * np.arange(8) + 1) * u * np.pi / 16)
                xs = np.cos((2 * np.arange(8) + 1) * v * np.pi / 16)
                ref += 0.25 * cu * cv * c * qt[z] * np.outer(ys, xs)
            ref = np.clip(np.round(ref) + 128, 0, 255)
            assert np.abs(got[b].reshape(8, 8) - ref).max() <= 1, (
                f"doc {doc_id} block {b}: integer IDCT diverged from float"
            )


def test_zero_coefficient_block_decodes_to_flat_128():
    import numpy as np

    from pulsar_project_spark.operators.jpeg import idct_kernel

    # DC row of the kernel is the constant basis; a zero block is pure
    # level shift -> every sample exactly 128
    acc = np.zeros(64, dtype=np.int64)
    samples = ((acc + (1 << 13)) >> 14) + 128
    assert (samples == 128).all()
    # and the kernel's DC row is flat (2048 = 2^14 / 8)
    assert set(idct_kernel()[0].tolist()) == {2048}


def test_pixel_features_layout(spark):
    from pulsar_project_spark.operators.jpeg import (
        decode_jpeg_pixel_features,
        jpeg_dims,
        synthesize_jpeg,
    )

    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    out = decode_jpeg_pixel_features(synthesize_jpeg(docs)).collect()
    assert len(out) == 6
    for r in out:
        w, h = jpeg_dims(r["doc_id"])
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_px"] == w * h
        assert 0 <= r["min_px"] <= r["max_px"] <= 255
