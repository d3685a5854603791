"""LSH band-recall guarantee for the dHash Hamming near-dup (ADVICE r10).

The census claims "Hamming <= K" semantics, so the banding must make
every qualifying pair a candidate: with K+1 bands, K differing bits
cannot touch all bands (pigeonhole), so some band matches exactly.
The round-10 4x14 layout violated this at K=4 — a pair differing by
exactly one bit per band shared no band and was silently missed by
BOTH engines (which is why the oracle couldn't catch it).
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_project_spark.queries.multimodal_ops import (
    _DHASH_BAND_BITS,
    _DHASH_BANDS,
    _DHASH_HAM_K,
)


def bands_of(h: int) -> list[int]:
    mask = (1 << _DHASH_BAND_BITS) - 1
    return [(h >> (i * _DHASH_BAND_BITS)) & mask
            for i in range(_DHASH_BANDS)]


def test_band_layout_covers_hash_and_guarantees_recall():
    # every one of the 56 hash bits lands in some band ...
    assert _DHASH_BANDS * _DHASH_BAND_BITS >= 56
    # ... and K+1 bands guarantee recall at Hamming <= K
    assert _DHASH_BANDS >= _DHASH_HAM_K + 1


def test_one_bit_per_band_pair_is_candidate():
    # the exact adversarial shape that escaped the 4x14 layout:
    # K bits flipped, one in each of the first K bands
    a = (1 << 56) - 1
    flips = 0
    for i in range(_DHASH_HAM_K):
        flips |= 1 << (i * _DHASH_BAND_BITS)
    b = a ^ flips
    assert bin(a ^ b).count("1") == _DHASH_HAM_K
    assert any(x == y for x, y in zip(bands_of(a), bands_of(b)))


@settings(max_examples=300, deadline=None)
@given(h=st.integers(0, (1 << 56) - 1),
       flip_bits=st.sets(st.integers(0, 55), min_size=0,
                         max_size=_DHASH_HAM_K))
def test_every_hamming_le_k_pair_shares_a_band(h, flip_bits):
    other = h
    for p in flip_bits:
        other ^= 1 << p
    assert any(x == y for x, y in zip(bands_of(h), bands_of(other)))


def test_worst_case_exhaustive_band_assignment():
    # no choice of K bit positions can hit all bands (i.e. the band
    # index function maps 56 positions into >= K+1 bands such that K
    # positions always leave a band untouched) — true by counting:
    # K positions touch at most K < BANDS bands.
    positions = range(56)
    band_idx = {p: p // _DHASH_BAND_BITS for p in positions}
    assert set(band_idx.values()) == set(range(_DHASH_BANDS)) or \
        len(set(band_idx.values())) >= _DHASH_HAM_K + 1
    # spot-check the densest combinations touching max bands
    for combo in combinations([0, 12, 24, 36, 48], _DHASH_HAM_K):
        touched = {band_idx[p] for p in combo}
        assert len(touched) < _DHASH_BANDS
