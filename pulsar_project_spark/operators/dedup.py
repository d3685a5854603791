"""Deduplication operators — north-star extension (SURVEY.md §2.11).

Generalizes the reference's only dedup (tool-name last-wins dict overwrite,
``manager.py:230``) into the dedup family a 100 TB training-data pipeline
needs:

* **exact** — hash-groupBy on a content fingerprint (md5 of normalized
  text): one shuffle on the fingerprint, keep min-id. The canonical
  "remove exact copies" pass.
* **n-gram Jaccard** — shingle → explode → self-join on shingle →
  per-pair intersection counts → Jaccard. Exact but quadratic in
  co-bucketed docs; used as the verifier behind LSH candidates.
* **MinHash + LSH banding** — k deterministic hash functions over
  shingles; signatures cut into bands; docs sharing a band bucket are
  candidates. Turns the quadratic all-pairs into |bands| equi-joins —
  THE scale path: shuffle is on (band_id, band_hash), candidate count is
  data-dependent not n².
* **SimHash** — 32-bit sign-aggregated token-hash fingerprint; equal
  fingerprints (or small Hamming distance) → near-dup candidates.

Portability: every hash is derived from md5 (identical in Spark, DuckDB,
Python) — `H(s) = int(md5(s)[:8], 16)` — so the correctness oracle can
recompute signatures bit-for-bit. No engine-private hash (xxhash64,
hash()) appears in any declared query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pulsar_project_spark.functions.text import clean_string, tokenize

# MinHash parameters: 16 hashes in 4 bands of 4. Universal-hash constants
# are small odd/affine integers; p is the smallest prime > 2^32.
MINHASH_NUM = 16
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_NUM // MINHASH_BANDS
MINHASH_P = 4_294_967_311
MINHASH_A = tuple(2 * j + 1 for j in range(MINHASH_NUM))
MINHASH_B = tuple(12_345 * j + 7 for j in range(MINHASH_NUM))

ROLLING_P = 2_147_483_647  # 2^31 - 1, Mersenne prime for the rolling hash


def portable_hash(col: Column) -> Column:
    """32-bit md5-derived token hash as BIGINT — identical in Spark,
    DuckDB (``('0x'||substr(md5(s),1,8))::BIGINT``) and Python."""
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 8), 16, 10).cast("bigint")


def fingerprint_md5(text_col: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of the normalized (clean_string) text."""
    return F.md5(F.encode(clean_string(text_col), "utf-8"))


def shingles(tokens: Column, n: int = 5) -> Column:
    """Distinct n-gram shingles (space-joined token windows). 1-based
    element_at so the oracle's 1-based list slicing matches exactly."""
    # guard: Spark sequence(1, 0) counts DOWN ([1,0]); short docs must
    # yield an empty shingle set, matching DuckDB's empty generate_series
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + off) for off in range(n)])
    )
    return F.when(F.size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5) -> DataFrame:
    """(doc_id, shingle) exploded relation + per-doc shingle counts ride
    along for Jaccard."""
    toks = docs.select(
        F.col(id_col), shingles(tokenize(clean_string(text_col)), n).alias("sh")
    )
    return toks.select(
        id_col, F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact dedup by normalized-content fingerprint: keep the lowest id
    (first-seen wins — the batch analog of insertion order), count copies."""
    fp = docs.select(F.col(id_col), fingerprint_md5(text_col).alias("fingerprint"))
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("keeper_" + id_col),
        F.count("*").alias("n_copies"),
    )


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5,
                        threshold: float = 0.0) -> DataFrame:
    """All-pairs n-gram Jaccard via the shingle self-join. Intersection
    and set sizes are exact ints; Jaccard is one double division →
    bit-identical across engines. Quadratic in per-shingle bucket size —
    at scale, run on LSH candidates (minhash_candidates) instead."""
    sh = shingle_table(docs, id_col, text_col, n)
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = (F.col("inter").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"))
    out = pairs.select("doc_a", "doc_b", "inter", "n_a", "n_b", jac.alias("jaccard"))
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 5) -> DataFrame:
    """Per-doc MinHash signature: sig_j = min over shingles of
    (a_j·H(s) + b_j) mod p. Computed as array ops over the shingle array —
    no explode, no shuffle: one projection."""
    toks = docs.select(
        F.col(id_col), shingles(tokenize(clean_string(text_col)), n).alias("sh")
    ).filter(F.size("sh") > 0)
    hashes = F.transform(F.col("sh"), lambda s: portable_hash(s))
    sig = F.array(*[
        F.array_min(F.transform(hashes, lambda h: (h * MINHASH_A[j] + MINHASH_B[j]) % MINHASH_P))
        for j in range(MINHASH_NUM)
    ])
    return toks.select(id_col, sig.alias("sig"))


def minhash_bands(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 5) -> DataFrame:
    """LSH banding: signature cut into bands, each band rendered as a
    join-able bucket key string."""
    sigs = minhash_signatures(docs, id_col, text_col, n)
    rows = []
    for band in range(MINHASH_BANDS):
        lo = band * MINHASH_ROWS
        key = F.concat_ws(
            "_", *[F.element_at("sig", lo + r + 1).cast("string") for r in range(MINHASH_ROWS)]
        )
        rows.append(sigs.select(
            id_col, F.lit(band).alias("band_id"), key.alias("band_key")
        ))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def minhash_candidates(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 5) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any band bucket. One
    equi-join per the banding relation — the scale path that replaces the
    all-pairs join. Feed into ngram_jaccard on the candidate subset (or
    trust signature similarity) to confirm."""
    bands = minhash_bands(docs, id_col, text_col, n)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per token (with multiplicity), each of the
    ``bits`` bit positions votes ±1 by the token hash's bit; the sign of
    the per-bit sum sets the fingerprint bit. Two grouped aggregations:
    (doc, bit) votes → doc fingerprint."""
    toks = docs.select(
        F.col(id_col),
        F.explode(tokenize(clean_string(text_col))).alias("token"),
    ).select(id_col, portable_hash(F.col("token")).alias("h"))
    bit_idx = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    # shiftright/shiftleft builders take only literal shift amounts — the
    # per-row bit shifts go through SQL exprs
    votes = toks.select(id_col, "h", bit_idx).select(
        id_col, "bit",
        (F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) * 2 - 1).alias("vote"),
    )
    per_bit = votes.groupBy(id_col, "bit").agg(F.sum("vote").alias("s"))
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0)
        ).alias("simhash")
    )


def rolling_fingerprint(tokens: Column) -> Column:
    """Polynomial rolling hash over the token stream:
    fold(acc·31 + H(token) mod p). Order-sensitive — two docs with the
    same bag but different order fingerprint differently (unlike minhash).
    Empty docs fingerprint to 0."""
    folded = F.aggregate(
        tokens,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 31 + portable_hash(t)) % ROLLING_P,
    )
    return F.when(F.size(tokens) > 0, folded).otherwise(F.lit(0).cast("bigint"))
