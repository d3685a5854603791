"""Unit pins for the stdlib-zlib PNG codec that the oracle can't see.

The ``png_decode_features`` oracle replays pixel values, which proves
filtering/inflate/chunking end-to-end — but two codec properties are
not SQL-replayable and get pinned here:

* multi-IDAT reassembly is REAL: every synthesized image's compressed
  stream exceeds the ``PNG_IDAT_SPLIT`` (64-byte) chunk split, so
  ``n_idat_chunks >= 2``;
* the chunk walk verifies CRCs: a single flipped payload byte must
  fail the decode, not silently corrupt pixels.
"""

from __future__ import annotations

import pytest

from pulsar_project_spark.operators.multimodal import (
    decode_png_features,
    synthesize_png,
)


def test_every_png_splits_into_multiple_idat_chunks(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    feats = decode_png_features(synthesize_png(docs)).collect()
    assert len(feats) == 12
    assert all(r["n_idat_chunks"] >= 2 for r in feats)
    # all five filter types run: every height >= 12 > 5
    assert all(r["height"] >= 12 for r in feats)


def test_corrupted_chunk_fails_crc_check(spark):
    docs = spark.createDataFrame([(3,)], "doc_id long")
    [row] = synthesize_png(docs).collect()
    payload = bytearray(row["png"])
    # flip one byte inside the first IDAT chunk's data
    idat_at = bytes(payload).index(b"IDAT")
    payload[idat_at + 10] ^= 0xFF
    bad = spark.createDataFrame([(3, bytes(payload))],
                                "doc_id long, png binary")
    with pytest.raises(Exception, match="CRC|PythonException"):
        decode_png_features(bad).collect()
