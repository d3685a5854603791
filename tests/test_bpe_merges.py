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


@pytest.mark.parametrize("texts", [
    _CORPORA[0]] + [pytest.param(t, marks=pytest.mark.gate)
                    for t in _CORPORA[1:]])
def test_spark_bpe_matches_pure_python_replica(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    got = sorted(
        tuple(r) for r in learn_bpe_merges(docs, n_merges=6).collect()
    )
    want = sorted(_replica(texts, 6))
    assert got == want


def _replica_encode_census(texts: list[str], n_merges: int):
    merges = _replica(texts, n_merges)
    census = {}
    for i, t in enumerate(texts):
        cleaned = re.sub(r"[^\w\s]", "", t.lower())
        ws = [w for w in cleaned.split() if w]
        if not ws:
            continue
        n_tokens = 0
        n_symbols_pre = 0
        for w in ws:
            syms = list(w) + ["</w>"]
            n_symbols_pre += len(syms)
            for _rank, l, r, merged in merges:
                out = []
                for s in syms:
                    if out and out[-1] == l and s == r:
                        out[-1] = merged
                    else:
                        out.append(s)
                syms = out
            n_tokens += len(syms)
        census[i] = (len(ws), n_tokens, n_symbols_pre)
    return census


@pytest.mark.parametrize("texts", [
    _CORPORA[0]] + [pytest.param(t, marks=pytest.mark.gate)
                    for t in _CORPORA[1:]])
def test_spark_bpe_encode_census_matches_replica(spark, texts):
    from pulsar_project_spark.operators.text_analysis import bpe_encode_census

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_symbols_pre"])
        for r in bpe_encode_census(docs, n_merges=6).collect()
    }
    assert got == _replica_encode_census(texts, 6)


def test_string_replace_pass_equals_array_fold_pass(spark):
    """The round-6 encoder applies each merge as ONE native replace()
    over a boundary-marked symbol string; this pins equivalence with
    the greedy array fold on the adversarial cases:

    * run-of-same-symbol ('aaaa' under a+a): both must produce
      [aa, aa] — the naive single-separator encoding would miss the
      second merge because the separator is shared between matches;
    * prefix/suffix traps ('ab b' under a+b must NOT merge; 'a ab'
      under a+ab must) — string boundaries make partial-symbol
      matches impossible;
    * no cascade: merged output never re-merges within the same pass
      (merged = left||right can never equal left again).
    """
    from pyspark.sql import functions as F

    from pulsar_project_spark.operators.text_analysis import (
        apply_merge_pass,
        encode_symstr,
        symstr_token_count,
        word_to_symstr,
    )

    words = ["aaaa", "aab", "abb", "ab", "a", "", "abcabc", "aabb"]
    merges = [("a", "a", "aa"), ("a", "b", "ab"), ("ab", "c", "abc"),
              ("a", "ab", "aab"), ("aa", "bb", "aabb")]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    merge_arr = F.array(*[
        F.struct(F.lit(l).alias("left"), F.lit(r).alias("right"),
                 F.lit(m).alias("merged"))
        for l, r, m in merges
    ])
    syms = F.concat(
        F.filter(F.split(F.col("w"), ""), lambda c: c != ""),
        F.array(F.lit("</w>")),
    )
    folded = F.size(F.aggregate(
        merge_arr, syms, lambda acc, m: apply_merge_pass(acc, m)))
    replaced = symstr_token_count(
        encode_symstr(merge_arr, word_to_symstr(F.col("w"))))
    rows = df.select("w", folded.alias("nf"), replaced.alias("nr")).collect()
    for r in rows:
        assert r.nf == r.nr, f"divergence on {r.w!r}: fold {r.nf} != replace {r.nr}"
