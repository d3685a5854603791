"""Deduplication operators — north-star extension (SURVEY.md §2.11).

Generalizes the reference's only dedup (tool-name last-wins dict overwrite,
``manager.py:230``) into the dedup family a 100 TB training-data pipeline
needs:

* **exact** — hash-groupBy on a content fingerprint (md5 of normalized
  text): one shuffle on the fingerprint, keep min-id. The canonical
  "remove exact copies" pass.
* **n-gram Jaccard** — shingle → explode → bucket-by-shingle →
  per-pair intersection counts → Jaccard. Exact but quadratic in
  co-bucketed docs; used as the verifier behind LSH candidates.
* **MinHash + LSH banding** — k deterministic hash functions over
  shingles; signatures cut into bands; docs sharing a band bucket are
  candidates. Turns the quadratic all-pairs into a bucket grouping —
  THE scale path: shuffle is on (band_id, band_key), candidate count is
  data-dependent not n².
* **SimHash** — 32-bit sign-aggregated token-hash fingerprint; equal
  fingerprints (or small Hamming distance) → near-dup candidates.

Portability: every hash is derived from md5 (identical in Spark, DuckDB,
Python) — `H(s) = int(md5(s)[:8], 16)` — so the correctness oracle can
recompute signatures bit-for-bit. No engine-private hash (xxhash64,
hash()) appears in any declared query.

Performance notes (measured at sf0.1, local[32]):

* Token/shingle arrays are ALWAYS materialized as real columns before a
  higher-order lambda touches them. Referencing the tokenizer expression
  from inside ``transform``/``element_at`` lambdas re-inlines the regex
  per array element (HOFs run interpreted, outside codegen CSE) — the
  naive form re-tokenized every doc once per shingle, 12× slower.
* MinHash signatures run as explode → ONE codegen'd groupBy with 16
  ``min()`` aggregates — not 16 interpreted ``array_min(transform(...))``
  lambdas — and the aggregation barrier stops Catalyst from duplicating
  the hash subtree into downstream band expressions.
* Pair generation is bucket-collect (``collect_list`` per bucket → local
  pair expansion), not a self-join: the expensive shingle/signature
  subtree executes once, and the only shuffle is the bucket groupBy.
  At 100 TB a pathological mega-bucket (stop-shingle) would skew this;
  AQE skew handling plus a bucket-size cap (drop buckets over ~10k docs,
  they are non-discriminative anyway) is the production guard.
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


def token_table(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, tk ARRAY<STRING>) with the token array materialized once."""
    return docs.select(F.col(id_col), tokenize(clean_string(text_col)).alias("tk"))


def shingle_hashes(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 5,
                   distinct: bool = True) -> DataFrame:
    """(id, sh BIGINT): n-gram shingles as POLYNOMIAL HASHES of the
    md5-derived token hashes — sh = fold(h_i·31 + h_{i+1}) over the
    window, < 2^52 so no overflow/modulo anywhere.

    Shape: posexplode tokens → hash → ``lead`` window per doc → one
    arithmetic combine — ALL whole-stage codegen. Measured 6× faster
    than building shingle strings in higher-order lambdas (HOFs run
    interpreted), and the gap widens with CPU count: the window shuffle
    is bandwidth-proportional while interpreted lambdas are the
    bottleneck at any scale. ``distinct=False`` skips the dedup shuffle
    for consumers that are multiplicity-insensitive (MinHash: min() is
    unaffected by duplicates)."""
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokenize(clean_string(text_col))).alias("pos", "tok"),
    )
    hashed = toks.select(id_col, "pos", portable_hash(F.col("tok")).alias("h0"))
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = hashed.select(
        id_col, "h0",
        *[F.lead("h0", i).over(w).alias(f"h{i}") for i in range(1, n)],
    )
    poly = F.col("h0")
    for i in range(1, n):
        poly = poly * 31 + F.col(f"h{i}")
    out = leads.filter(F.col(f"h{n - 1}").isNotNull()).select(
        F.col(id_col), poly.alias("sh")
    )
    return out.distinct() if distinct else out


def shingle_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5) -> DataFrame:
    """(doc_id, n_sh, shingle) exploded distinct-shingle relation with
    the per-doc shingle count riding along (for Jaccard)."""
    from pyspark.sql.window import Window

    sh = shingle_hashes(docs, id_col, text_col, n, distinct=True)
    return sh.withColumn(
        "n_sh", F.count("*").over(Window.partitionBy(id_col)).cast("int")
    ).select(id_col, "n_sh", F.col("sh").alias("shingle"))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact dedup by normalized-content fingerprint: keep the lowest id
    (first-seen wins — the batch analog of insertion order), count copies."""
    fp = docs.select(F.col(id_col), fingerprint_md5(text_col).alias("fingerprint"))
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("keeper_" + id_col),
        F.count("*").alias("n_copies"),
    )


def _bucket_pairs(buckets: DataFrame, elem: str = "ds") -> Column:
    """All ordered pairs (i < j) within a sorted collect_list column —
    local array expansion, no self-join."""
    ids = F.col(elem)
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


MAX_BUCKET = 10_000  # pair-generation guard: a bucket shared by more
# docs than this separates nothing and would expand quadratically —
# declared in the oracle SQL too, so the cap is part of the semantics,
# not a silent truncation.


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5,
                        threshold: float = 0.0,
                        max_bucket: int = MAX_BUCKET) -> DataFrame:
    """All-pairs n-gram Jaccard via shingle bucketing: group docs per
    shingle, expand pairs locally, count shared shingles per pair.
    Intersection and set sizes are exact ints; Jaccard is one double
    division → bit-identical across engines. Quadratic in per-shingle
    bucket size — at scale, run on LSH candidates (minhash_candidates)
    instead; ``max_bucket`` drops non-discriminative mega-buckets."""
    st = shingle_table(docs, id_col, text_col, n)
    buckets = (
        st.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct(F.col(id_col).alias("id"),
                                                  F.col("n_sh")))).alias("ds"))
        .filter(F.size("ds").between(2, max_bucket))
    )
    pairs = buckets.select(F.explode(_bucket_pairs(buckets)).alias("p")).select(
        F.col("p.a.id").alias("doc_a"), F.col("p.b.id").alias("doc_b"),
        F.col("p.a.n_sh").alias("n_a"), F.col("p.b.n_sh").alias("n_b"),
    )
    agg = pairs.groupBy("doc_a", "doc_b", "n_a", "n_b").agg(
        F.count("*").alias("inter")
    )
    jac = (F.col("inter").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"))
    out = agg.select("doc_a", "doc_b", "inter", "n_a", "n_b", jac.alias("jaccard"))
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 5) -> DataFrame:
    """Per-doc MinHash signature: sig_j = min over shingles of
    (a_j·sh + b_j) mod p over the polynomial shingle hash. ONE
    groupBy(doc) with 16 codegen'd min() aggregates, straight off the
    non-distinct shingle stream (min() is multiplicity-insensitive, so
    the dedup shuffle is skipped). The shuffle is on doc_id (uniform —
    no skew); map-side partial mins shrink it to one row per doc per
    partition."""
    hashed = shingle_hashes(docs, id_col, text_col, n, distinct=False)
    mins = [
        F.min((F.col("sh") * MINHASH_A[j] + MINHASH_B[j]) % MINHASH_P).alias(f"s{j}")
        for j in range(MINHASH_NUM)
    ]
    per_doc = hashed.groupBy(id_col).agg(*mins)
    return per_doc.select(
        id_col, F.array(*[F.col(f"s{j}") for j in range(MINHASH_NUM)]).alias("sig")
    )


def minhash_bands(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 5) -> DataFrame:
    """LSH banding: signature cut into bands, each band rendered as a
    join-able bucket key string. ONE explode over the signature row —
    the signature subtree executes once (not once per band)."""
    sigs = minhash_signatures(docs, id_col, text_col, n)
    band_structs = F.array(*[
        F.struct(
            F.lit(band).alias("band_id"),
            F.concat_ws("_", *[
                F.element_at("sig", band * MINHASH_ROWS + r + 1).cast("string")
                for r in range(MINHASH_ROWS)
            ]).alias("band_key"),
        )
        for band in range(MINHASH_BANDS)
    ])
    return sigs.select(id_col, F.explode(band_structs).alias("b")).select(
        id_col, F.col("b.band_id").alias("band_id"), F.col("b.band_key").alias("band_key")
    )


def minhash_candidates(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 5,
                       max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any band bucket. Bucket
    groupBy + local pair expansion — one shuffle on (band_id, band_key),
    signature pipeline runs once. Feed into ngram_jaccard on the
    candidate subset (or trust signature similarity) to confirm.
    ``max_bucket`` drops degenerate mega-buckets (declared in the
    oracle's HAVING — not a silent cap)."""
    bands = minhash_bands(docs, id_col, text_col, n)
    buckets = (
        bands.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ds"))
        .filter(F.size("ds").between(2, max_bucket))
    )
    return (
        buckets.select(F.explode(_bucket_pairs(buckets)).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per token (with multiplicity), each of the
    ``bits`` bit positions votes ±1 by the token hash's bit; the sign of
    the per-bit sum sets the fingerprint bit. Two grouped aggregations:
    (doc, bit) votes → doc fingerprint."""
    toks = token_table(docs, id_col, text_col).select(
        F.col(id_col), F.explode("tk").alias("token")
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
    Empty docs fingerprint to 0. Pass a MATERIALIZED token column."""
    folded = F.aggregate(
        tokens,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 31 + portable_hash(t)) % ROLLING_P,
    )
    return F.when(F.size(tokens) > 0, folded).otherwise(F.lit(0).cast("bigint"))


def incremental_dedup(incoming: DataFrame, historical: DataFrame,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Classify an INCOMING shard against a HISTORICAL fingerprint store
    — the daily-ingest shape of exact dedup at 100 TB, where the corpus
    is append-only and re-fingerprinting the whole archive per batch is
    off the table. Verdict per incoming doc:

    * ``dup_historical`` — fingerprint already in the store (wins over
      any intra-batch duplication: the archived copy is the keeper);
    * ``dup_internal`` — new to the store but not first-seen (min id)
      within the batch;
    * ``new`` — first-seen, becomes the store's keeper.

    Scale shape: the store side carries ONE distinct md5 column (32
    bytes/doc — ~3 TB of store per 100 G docs), the classify join is a
    plain equi hash join on the fingerprint, and the intra-batch
    first-seen is a window over the same shuffle key, so AQE can plan
    both off one exchange. A bloom-filter prefilter on the store is the
    production add-on when the batch is tiny relative to the archive."""
    from pyspark.sql.window import Window

    inc = incoming.withColumn("fingerprint", fingerprint_md5(text_col))
    hist = (
        historical.select(fingerprint_md5(text_col).alias("fingerprint"))
        .distinct()
        .withColumn("__in_store", F.lit(1))
    )
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    return (
        inc.withColumn("rn", F.row_number().over(w))
        .join(hist, "fingerprint", "left")
        .withColumn(
            "verdict",
            F.when(F.col("__in_store").isNotNull(), "dup_historical")
            .when(F.col("rn") > 1, "dup_internal")
            .otherwise("new"),
        )
        .drop("__in_store", "rn")
    )


MAX_LEV_BLOCK = 1_000  # blocking guard: a (lang, size-bin) block larger
# than this is non-discriminative and would expand quadratically — the
# cap is declared in the oracle SQL too, part of the semantics.


def blocked_levenshtein_pairs(docs: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text",
                              block_cols: tuple[str, ...] = ("lang",),
                              size_col: str | None = "n_chars",
                              size_bin: int = 64, probe_len: int = 80,
                              threshold: int = 20,
                              max_block: int = MAX_LEV_BLOCK) -> DataFrame:
    """Near-dup confirm #3 (after Jaccard and MinHash): bounded edit
    distance on a normalized prefix probe, candidate pairs from
    BLOCKING on (block_cols..., size_col div size_bin) — the classic
    blocking+verify record-linkage shape. Docs differing in the block
    key can't be confirmed pairs by construction (an edit-distance-close
    pair has close lengths, so only adjacent-bin misses occur — accepted
    recall trade, same as LSH banding).

    Scale shape: pair generation is a codegen'd EQUI SELF-JOIN on the
    block key (a block of b docs streams b²/2 pairs through whole-stage
    codegen — measured 4× faster here than collect_list + interpreted
    HOF pair expansion, whose parallelism is capped at the block count),
    and the O(probe_len²) DP runs JVM-side via
    ``levenshtein(l, r, threshold)`` — the bounded variant bails out at
    ``threshold``, turning the DP O(len·threshold). Blocks over
    ``max_block`` docs are dropped via a window count on the same
    shuffle key (declared, mirrored in oracles)."""
    from pyspark.sql.window import Window

    bin_expr = (
        [F.expr(f"{size_col} div {size_bin}").alias("__szbin")]
        if size_col else []
    )
    keys = [*block_cols] + (["__szbin"] if size_col else [])
    base = docs.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        *bin_expr,
        F.substring(clean_string(text_col), 1, probe_len).alias("__probe"),
    ).withColumn(
        "__bn", F.count("*").over(Window.partitionBy(*keys))
    ).filter(F.col("__bn") <= max_block).drop("__bn")
    # The DP is the cost center (~30µs/pair bounded; the threshold
    # filter pushes into the join residual, so it executes WITH pair
    # generation). Parallelism therefore equals the join's task count —
    # and a broadcast join inherits the LEFT side's partitioning, which
    # for one parquet file is ONE task. Hash the left side across the
    # cluster by id first (any distribution works under a broadcast
    # right side; per-task DP work is then uniform in docs, not in
    # block² sizes). Left to AQE the tiny byte size would coalesce back
    # to one partition, so the count is pinned to core count. If the
    # planner instead picks a shuffle join (big inputs at real scale),
    # this exchange is simply replaced by the join's own — with AQE
    # skew-split handling oversized blocks.
    n_cpu = docs.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(n_cpu, id_col).alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
        + [F.col(f"a.{id_col}") < F.col(f"b.{id_col}")],
    ).select(
        F.col(f"a.{id_col}").alias("doc_a"),
        F.col(f"b.{id_col}").alias("doc_b"),
        F.levenshtein(F.col("a.__probe"), F.col("b.__probe"),
                      threshold).alias("lev"),
    )
    # bounded levenshtein returns -1 when the distance exceeds threshold
    return pairs.filter(F.col("lev") >= 0)


# --- Bloom-filter store prefilter --------------------------------------------
#
# The production add-on incremental_dedup names: when today's batch is
# tiny relative to the archive, shuffling the batch against a
# multi-terabyte fingerprint store for an equi-join is almost entirely
# wasted work — most incoming docs are NEW. A Bloom filter built over
# the store answers "definitely new" without the join: k hash bits per
# fingerprint, OR-ed into a fixed bit array; an incoming doc missing
# ANY of its k bits cannot be in the store (no false negatives, by
# construction), so only the "maybe" minority proceeds to the exact
# join. The filter is pure relational algebra — no sketch library, no
# driver state: the bit array IS a (word_idx, bits) relation built by
# one bit_or aggregation and broadcast to the probe side.

BLOOM_M_BITS = 1 << 17    # 131,072 bits -> ~2,114 words (~17 KB)
BLOOM_WORD_BITS = 62      # 62, not 64: DuckDB overflow-checks 1<<63 (sign
                          # bit), so capping the shift at 61 keeps the
                          # oracle's bit array arithmetic legal and the
                          # Spark side bit-identical to it
_BLOOM_HASH_OFFSETS = (1, 9, 17)  # k=3 independent 32-bit lanes of the md5


def _bloom_positions(fp_col: str) -> list:
    """k bit positions from disjoint 8-hex-char lanes of the (md5)
    fingerprint — `conv(hex,16,10)` here equals the oracle's
    `CAST('0x'||hex AS BIGINT)` exactly (32 bits, never signed)."""
    return [
        F.expr(
            f"cast(conv(substring({fp_col}, {off}, 8), 16, 10) as bigint) "
            f"% {BLOOM_M_BITS}"
        )
        for off in _BLOOM_HASH_OFFSETS
    ]


def bloom_build(historical: DataFrame, text_col: str = "text") -> DataFrame:
    """(word_idx BIGINT, bits BIGINT): the store's Bloom bit array as a
    relation — distinct fingerprints → k positions each → one bit_or
    aggregation over at most ``BLOOM_M_BITS/64`` groups. At 100 TB the
    store scan is the only big input; the result is ~16 KB,
    broadcast-joinable everywhere."""
    hist = historical.select(
        fingerprint_md5(text_col).alias("fp")
    ).distinct()
    pos = hist.select(
        F.explode(F.array(*_bloom_positions("fp"))).alias("pos")
    )
    return pos.groupBy(F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word_idx")).agg(
        F.expr(f"bit_or(shiftleft(1L, cast(pos % {BLOOM_WORD_BITS} as int)))")
        .alias("bits")
    )


def bloom_prefilter(incoming: DataFrame, bloom: DataFrame,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Probe the store's Bloom relation: per incoming doc, explode its
    k positions, broadcast-join the (tiny) bit-array relation, and
    reduce with min(hit) — ``bloom_maybe = 1`` iff ALL k bits are set.
    A 0 is a GUARANTEE the doc is new (skip the store join); a 1 is a
    candidate for the exact fingerprint join. Returns
    (id, fingerprint, bloom_maybe)."""
    inc = incoming.select(
        F.col(id_col), fingerprint_md5(text_col).alias("fingerprint")
    )
    probes = inc.select(
        id_col, "fingerprint",
        F.explode(F.array(*_bloom_positions("fingerprint"))).alias("pos"),
    )
    joined = probes.join(
        F.broadcast(bloom),
        F.expr(f"pos div {BLOOM_WORD_BITS}") == F.col("word_idx"),
        "left",
    ).select(
        id_col, "fingerprint",
        F.when(
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(
                F.expr(f"shiftleft(1L, cast(pos % {BLOOM_WORD_BITS} as int))"))
               != 0),
            1,
        ).otherwise(0).alias("hit"),
    )
    return joined.groupBy(id_col, "fingerprint").agg(
        F.min("hit").alias("bloom_maybe")
    )


def incremental_dedup_bloom_gated(incoming: DataFrame, historical: DataFrame,
                                  id_col: str = "doc_id",
                                  text_col: str = "text") -> DataFrame:
    """``incremental_dedup`` with the Bloom prefilter WIRED IN — the
    production composition: incoming docs probe the store's ~17 KB
    Bloom relation first, and ONLY the maybe-minority joins the full
    fingerprint store (bloom_maybe = 0 is a no-false-negative
    guarantee of 'not in store', so skipping the join for those rows
    is semantics-preserving). The intra-batch first-seen window runs
    on the whole batch regardless (it is store-independent).

    The certification is the point: this function's DECLARED oracle is
    the UNGATED ``incremental_dedup`` SQL — a hash match is a machine
    proof, on real data, that the gate changed the COST of the store
    join (rows entering it) and nothing else."""
    from pyspark.sql.window import Window

    inc = incoming.withColumn("fingerprint", fingerprint_md5(text_col))
    bloom = bloom_build(historical, text_col)
    probed = bloom_prefilter(incoming, bloom, id_col, text_col)
    maybes = probed.filter(F.col("bloom_maybe") == 1).select(
        id_col, "fingerprint"
    )
    hist = (
        historical.select(fingerprint_md5(text_col).alias("fingerprint"))
        .distinct()
        .withColumn("__in_store", F.lit(1))
    )
    # ONLY the maybes reach the store join; definite-new rows skip it
    confirmed = maybes.join(hist, "fingerprint", "inner").select(
        id_col, F.lit(1).alias("__in_store")
    )
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    return (
        inc.withColumn("rn", F.row_number().over(w))
        .join(confirmed, id_col, "left")
        .withColumn(
            "verdict",
            F.when(F.col("__in_store").isNotNull(), "dup_historical")
            .when(F.col("rn") > 1, "dup_internal")
            .otherwise("new"),
        )
        .drop("__in_store", "rn")
    )


# Exact set-similarity join threshold as a rational (Jaccard >= 1/2):
# the verify condition cross-multiplies to (DEN+NUM)·inter >= NUM·(n_a+n_b),
# the prefix length to n − ceil(NUM·n/DEN) + 1, and the length filter to
# DEN·min(n_a,n_b) >= NUM·max(n_a,n_b) — all integers, oracle-replayable.
PJ_T_NUM = 1
PJ_T_DEN = 2


def prefix_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """EXACT 5-gram-shingle similarity join (Jaccard >= 1/2) with
    PPJoin-style prefix + length filtering — the COMPLETE counterpart
    to ``ngram_jaccard_pairs``, whose MAX_BUCKET mega-bucket guard is a
    declared incompleteness: here no bucket is dropped, yet the join
    never goes all-pairs, because candidates come only from pairs
    sharing a shingle in their frequency-ordered PREFIX (the rarest
    n − ceil(n/2) + 1 shingles of each doc, under the global
    (df ASC, shingle ASC) total order) and passing the length filter
    (2·min(n_a,n_b) >= max — a Jaccard >= 1/2 pair cannot differ more
    than 2x in size). Both filters are completeness THEOREMS, and the
    declared query's oracle computes ground truth from pairs sharing
    ANY shingle — so a single pruned qualifying pair breaks the hash.

    Prefix filtering needs a sparse set domain to bite: 5-gram shingles
    are combinatorially sparse even over a tiny vocabulary (this
    corpus: 31 words — raw token sets are hopeless for ANY exact
    all-pairs method there, while shingle prefixes stay rare).

    Scale shape: a df-count aggregate, a PER-DOC rank window (the
    global order is the (df, shingle) KEY — never a materialized
    global rank), one equi-join on prefix shingles for candidates, one
    exact-verify equi-join on (doc, shingle)."""
    from pyspark.sql.window import Window

    st = shingle_table(docs, id_col, text_col)  # (id, n_sh, shingle)
    df_tab = st.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    wr = Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("shingle"))
    ranked = (st.join(df_tab, "shingle")
              .withColumn("rk", F.row_number().over(wr)))
    prefix = ranked.filter(
        F.col("rk") <= F.expr(
            f"n_sh - ((n_sh * {PJ_T_NUM} + {PJ_T_DEN} - 1)"
            f" div {PJ_T_DEN}) + 1")
    ).select(F.col(id_col).alias("d"), F.col("n_sh"), "shingle")
    cand = (
        prefix.select(F.col("d").alias("a"), F.col("n_sh").alias("n_a"),
                      "shingle")
        .join(prefix.select(F.col("d").alias("b"),
                            F.col("n_sh").alias("n_b"), "shingle"),
              "shingle")
        .filter((F.col("a") < F.col("b"))
                & (PJ_T_DEN * F.least("n_a", "n_b")
                   >= PJ_T_NUM * F.greatest("n_a", "n_b")))
        .select("a", "b")
        .distinct()
    )
    sh_a = st.select(F.col(id_col).alias("a"), "shingle")
    sh_b = st.select(F.col(id_col).alias("b2"),
                     F.col("shingle").alias("sh2"))
    inter = (
        cand.join(sh_a, "a")
        .join(sh_b, (F.col("b") == F.col("b2"))
              & (F.col("shingle") == F.col("sh2")))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = st.select(id_col, "n_sh").distinct()
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"),
                                F.col("n_sh").alias("n_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"),
                           F.col("n_sh").alias("n_b")), "b")
        .filter((PJ_T_DEN + PJ_T_NUM) * F.col("inter")
                >= PJ_T_NUM * (F.col("n_a") + F.col("n_b")))
    )
    jac = (F.col("inter").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"))
    return out.select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"),
                      "inter", F.col("n_a").cast("long").alias("n_a"),
                      F.col("n_b").cast("long").alias("n_b"),
                      jac.alias("jaccard"))


def repeated_window_census(docs: DataFrame, w: int = 8,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """EXACT SUBSTRING-DEDUP CENSUS (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv 2107.06499):
    per document, how many of its w-token windows occur ≥2 times in
    the WHOLE corpus (within- or cross-document — self-repetition is
    repetition). The suffix-array step of the paper reduced to its
    relational core: every token offset emits one rolling-hash window,
    one grouped count finds the repeated hashes, one join carries the
    verdict back. Returns (id, n_windows, n_repeated) for every doc
    with ≥1 window; the consumer drops or trims spans.

    The window hash folds (acc·31 + h) mod 2³¹−1 per step — unlike the
    5-gram shingles' overflow-free 2⁵² headroom, w=8 would overflow
    INT64, so the modular fold is load-bearing, not a style choice.
    Hash-based "equality" is the paper's own trade (collisions
    over-count repetition with probability ~n²/2³¹ per window); both
    engines compute identical hashes, so parity stays exact.

    Shape: posexplode → md5 token hash → w-1 ``lead`` columns over one
    per-doc window sort → arithmetic combine (all codegen), then one
    count shuffle on the 8-byte hash and one count-distinct-free join
    back. At 100 TB the shuffle carries (doc, pos, hash) triples —
    8-byte hashes, not w-token strings, which is why the fold beats
    shipping the spans themselves."""
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokenize(clean_string(text_col))).alias("pos", "tok"),
    )
    hashed = toks.select(id_col, "pos", portable_hash(F.col("tok")).alias("h0"))
    win = Window.partitionBy(id_col).orderBy("pos")
    leads = hashed.select(
        id_col, "pos", "h0",
        *[F.lead("h0", i).over(win).alias(f"h{i}") for i in range(1, w)],
    )
    poly = F.col("h0")
    for i in range(1, w):
        poly = (poly * 31 + F.col(f"h{i}")) % ROLLING_P
    windows = leads.filter(F.col(f"h{w - 1}").isNotNull()).select(
        id_col, "pos", poly.alias("sh"))
    counts = windows.groupBy("sh").agg(F.count(F.lit(1)).alias("n_occ"))
    return (
        windows.join(counts, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum((F.col("n_occ") >= 2).cast("bigint")).cast("bigint")
            .alias("n_repeated"),
        )
    )
