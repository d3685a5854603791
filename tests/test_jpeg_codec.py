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
    nb, _, blocks, sw, sh = decode_jpeg_coefs(payload)
    assert nb == n_blocks and len(blocks) == n_blocks
    assert (sw, sh) == (w, h)  # stream SOF0 == closed form (ADVICE r6)


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
        got, _w, _h = decode_jpeg_pixels_one(payload)
        _, qt, blocks, _, _ = decode_jpeg_coefs(payload)
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


# --- round-7 color path: 4:2:0 YCbCr must BE a JPEG color pipeline ----------


def test_color_roundtrip_matches_coefficient_plan():
    from pulsar_project_spark.operators.jpeg import (
        JPEG_QTABLE,
        JPEG_QTABLE_CHROMA,
        decode_jpeg_color_coefs,
        encode_jpeg_color,
        jpeg_color_dims,
        jpeg_color_qcoefs,
    )

    for doc_id in (-9, -1, 0, 1, 5, 7, 42):
        w, h, qts, blocks = decode_jpeg_color_coefs(encode_jpeg_color(doc_id))
        assert (w, h) == jpeg_color_dims(doc_id)
        assert qts[0] == list(JPEG_QTABLE)
        assert qts[1] == qts[2] == list(JPEG_QTABLE_CHROMA)
        n_mcus = (w // 16) * (h // 16)
        assert [len(blocks[c]) for c in range(3)] == [4 * n_mcus, n_mcus,
                                                      n_mcus]
        for c in range(3):
            for b, q in enumerate(blocks[c]):
                assert q == jpeg_color_qcoefs(doc_id, c, b), (doc_id, c, b)


def test_color_restart_markers_reset_all_three_predictors():
    from pulsar_project_spark.operators.jpeg import (
        RESTART_INTERVAL_COLOR,
        decode_jpeg_color_coefs,
        encode_jpeg_color,
    )

    # doc 1 is 32x32 -> 4 MCUs -> one RST at interval 2; decode success
    # across it proves both sides reset Y AND chroma predictors
    payload = encode_jpeg_color(1)
    scan = payload[payload.index(b"\xff\xda") + 14:]
    n_rst = sum(scan.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
    assert n_rst == (4 - 1) // RESTART_INTERVAL_COLOR
    decode_jpeg_color_coefs(payload)  # would raise on a predictor bug


def test_color_integer_pipeline_tracks_float_pipeline():
    """The fixed-point IDCT + nearest upsample + fixed-point CSC must
    be a real color decode: every R/G/B sample within 3 of the float
    pipeline (1 LSB IDCT + amplified chroma error + CSC rounding)."""
    import math

    import numpy as np

    from pulsar_project_spark.operators.jpeg import (
        decode_jpeg_color_coefs,
        decode_jpeg_color_pixels_one,
        encode_jpeg_color,
        zigzag_uv,
    )

    zz = zigzag_uv()

    def float_plane(blocks, qt, w, h, block_px):
        plane = np.zeros((h, w))
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
            y0, x0 = block_px(b)
            plane[y0:y0 + 8, x0:x0 + 8] = np.clip(ref + 128, 0, 255)
        return plane

    for doc_id in (-9, 0, 1, 7):
        payload = encode_jpeg_color(doc_id)
        w, h, qts, blocks = decode_jpeg_color_coefs(payload)
        mw = w // 16
        yf = float_plane(blocks[0], qts[0], w, h,
                         lambda b: ((b // 4 // mw) * 16 + (b % 4 // 2) * 8,
                                    (b // 4 % mw) * 16 + (b % 4 % 2) * 8))
        cbf = float_plane(blocks[1], qts[1], w // 2, h // 2,
                          lambda b: ((b // mw) * 8, (b % mw) * 8))
        crf = float_plane(blocks[2], qts[2], w // 2, h // 2,
                          lambda b: ((b // mw) * 8, (b % mw) * 8))
        cbu = cbf.repeat(2, 0).repeat(2, 1) - 128
        cru = crf.repeat(2, 0).repeat(2, 1) - 128
        rf = np.clip(yf + 1.402 * cru, 0, 255)
        gf = np.clip(yf - 0.344136 * cbu - 0.714136 * cru, 0, 255)
        bf = np.clip(yf + 1.772 * cbu, 0, 255)
        r, g, b = decode_jpeg_color_pixels_one(payload)
        for got, ref, name in ((r, rf, "R"), (g, gf, "G"), (b, bf, "B")):
            assert np.abs(got - ref).max() <= 3, (
                f"doc {doc_id} {name}: integer color pipeline diverged")


def test_color_corruption_raises_valueerror():
    import pytest as _pytest

    from pulsar_project_spark.operators.jpeg import (
        decode_jpeg_color_coefs,
        encode_jpeg_color,
    )

    payload = bytearray(encode_jpeg_color(5))
    i = payload.index(b"\xff\xda") + 20
    payload[i] ^= 0x55
    with _pytest.raises((ValueError, IndexError, KeyError)):
        decode_jpeg_color_coefs(bytes(payload))
    with _pytest.raises(ValueError):
        decode_jpeg_color_coefs(b"\x00\x00")
