"""Pin the Spark BPE trainer against an independent pure-Python replica.

The replica re-implements Sennrich-style BPE from scratch (regex
tokenizer, char+</w> init, weighted pair argmax with the (weight DESC,
left ASC, right ASC) tiebreak, greedy left-to-right merge) with no
shared code beyond the spec, so agreement is evidence, not tautology.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from pulsar_project_spark.operators.text_analysis import learn_bpe_merges


def _replica(texts: list[str], n_merges: int):
    words = Counter()
    for t in texts:
        cleaned = re.sub(r"[^\w\s]", "", t.lower())
        for w in cleaned.split():
            words[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), _w = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = l + r
        merges.append((rank, l, r, merged))
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = merged
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


_CORPORA = [
    ["the cat sat on the mat", "the rat sat on the cat", "a cat and a rat"],
    ["aaa aa a", "aaaa aa", "aa aaa"],          # overlapping-pair greed
    ["x", "y y", "z z z"],                       # runs out of pairs early
    ["Hello, World! hello world", "HELLO... world?!"],
]


@pytest.mark.parametrize("texts", _CORPORA)
def test_spark_bpe_matches_pure_python_replica(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    got = sorted(
        tuple(r) for r in learn_bpe_merges(docs, n_merges=6).collect()
    )
    want = sorted(_replica(texts, 6))
    assert got == want
