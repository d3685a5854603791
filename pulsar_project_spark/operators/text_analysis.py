"""Text-analysis operators — north-star extension (SURVEY.md §2.11,
generalizing the reference's tokenizer/stopword machinery
``utils.py:291-316`` into the per-document scoring passes a training-data
pipeline runs at 100 TB).

All of these are single-projection, whole-stage-codegen column
expressions over a materialized token array — no shuffle, no UDF: the
ideal shape for a full-corpus scan (narrow, embarrassingly parallel,
column-pruned to ``doc_id, text``).

Determinism: every score is per-row arithmetic over integer counts
(one division at the end) — bit-exact across engines; language argmax
uses a fixed CASE preference order, never a float tie.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pulsar_project_spark.functions.text import (
    COMMON_ENGLISH_WORDS,
    clean_string,
    tokenize,
)

# Function-word profiles (public linguistic common knowledge). Scoring =
# how many profile words occur in the doc's token set; predicted language
# = argmax with fixed en>de>fr>es preference on ties, 'und' (undetermined)
# when no profile hits at all.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "von"),
    "fr": ("le", "la", "et", "les", "des", "est", "pas", "pour", "que", "dans"),
    "es": ("el", "los", "las", "es", "en", "que", "por", "para", "con", "una"),
}
LANG_ORDER = ("en", "de", "fr", "es")

# BPE-ish pretokenizer (GPT-2-style, minus contractions): letter runs,
# digit runs, punctuation runs — each optionally space-prefixed — plus
# whitespace runs. RE2-safe (no lookaround) so DuckDB scores identically.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def profile_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """How many profile words appear in the token array. ``array_intersect``
    (hash-set build over the tokens, codegen) — NOT a higher-order
    ``filter(markers, m -> array_contains(tokens, m))`` lambda, which runs
    interpreted and probes the token array once per profile word (measured
    5× slower at sf0.1). Equivalent because profiles are duplicate-free:
    |intersect(profile, tokens)| == #profile words present."""
    markers = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(markers, tokens))


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-doc language scores + argmax prediction. NULL text reads as
    the empty document → all-zero scores and 'und', matching the
    oracle's semantics (without the coalesce, Spark's NULL-propagating
    size() emits NULL scores for such rows — found by the NULL sweep)."""
    toks = docs.select(
        F.col(id_col),
        tokenize(clean_string(F.coalesce(F.col(text_col), F.lit("")))).alias("tk"),
    )
    scored = toks.select(
        id_col,
        *[profile_hits(F.col("tk"), LANG_PROFILES[lang]).alias(f"s_{lang}")
          for lang in LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_ORDER:  # fixed preference order breaks ties
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return scored.select(
        id_col, *[f"s_{lang}" for lang in LANG_ORDER], pred.alias("pred_lang")
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-doc quality signals (the C4/Gopher-style filter features):
    token count, stopword ratio, alpha ratio, punctuation ratio, mean
    token length, and a fixed-weight composite. One projection."""
    stops = F.array(*[F.lit(w) for w in sorted(COMMON_ENGLISH_WORDS)])
    t = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).alias("n_punct"),
        F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).alias("n_alpha"),
        tokenize(clean_string(t)).alias("tk"),
    )
    counted = base.select(
        id_col, "n_chars", "n_punct", "n_alpha",
        F.size("tk").alias("n_tokens"),
        F.size(F.filter(F.col("tk"), lambda x: F.array_contains(stops, x))).alias("n_stop"),
        F.aggregate(F.col("tk"), F.lit(0), lambda acc, x: acc + F.length(x)).alias("tok_chars"),
    )
    nt = F.col("n_tokens").cast("double")
    nc = F.col("n_chars").cast("double")
    stop_ratio = F.when(F.col("n_tokens") > 0, F.col("n_stop") / nt).otherwise(F.lit(0.0))
    alpha_ratio = F.when(F.col("n_chars") > 0, F.col("n_alpha") / nc).otherwise(F.lit(0.0))
    punct_ratio = F.when(F.col("n_chars") > 0, F.col("n_punct") / nc).otherwise(F.lit(0.0))
    mean_tok = F.when(F.col("n_tokens") > 0, F.col("tok_chars") / nt).otherwise(F.lit(0.0))
    length_term = F.when(F.col("n_tokens") >= 20, F.lit(1.0)).otherwise(nt / 20.0)
    # fixed parenthesization — the oracle states the identical expression
    quality = ((F.lit(0.4) * stop_ratio) + (F.lit(0.3) * alpha_ratio)
               + (F.lit(0.2) * length_term)) - (F.lit(0.1) * punct_ratio)
    return counted.select(
        id_col, "n_chars", "n_tokens", "n_stop",
        stop_ratio.alias("stop_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_tok.alias("mean_token_len"),
        quality.alias("quality_score"),
    )


FEATURE_DIM = 32  # hashing-trick output dimensionality


def feature_hash_embedding(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           dim: int = FEATURE_DIM) -> DataFrame:
    """Hashing-trick text vectorizer (Weinberger et al. 2009): token →
    md5-derived hash → bucket ``h % dim``, signed by hash parity —
    ``(doc_id, dim_id, weight)`` sparse relation with integer weights
    (term counts keep multiplicity, signs make collisions cancel in
    expectation). The text→vector bridge into the similarity family.

    Shape at scale: explode + ONE groupBy(doc, dim) shuffle, all codegen,
    weights are order-independent integer sums. Output is sparse — empty
    buckets produce no row (a dense form is one ``pivot`` away)."""
    from pulsar_project_spark.operators.dedup import portable_hash

    toks = docs.select(
        F.col(id_col), F.explode(tokenize(clean_string(text_col))).alias("tok")
    )
    hashed = toks.select(
        id_col,
        portable_hash(F.col("tok")).alias("h"),
    ).select(
        id_col,
        (F.col("h") % dim).alias("dim_id"),
        F.when((F.floor(F.col("h") / 256) % 2) == 0, F.lit(1))
         .otherwise(F.lit(-1)).alias("sign"),
    )
    return (
        hashed.groupBy(id_col, "dim_id")
        .agg(F.sum("sign").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def bpe_token_counts(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Token-count pass: whitespace tokens vs BPE-ish pretokenizer
    pieces (the 'how many tokens is this corpus' budgeting scan)."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    bpe = F.regexp_count(t, F.lit(BPE_PATTERN)) - F.regexp_count(t, F.lit(r"\s+"))
    return docs.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
    )


def learn_bpe_merges(docs, n_merges: int = 8, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Learn a byte-pair-encoding merge table from the corpus — the REAL
    iterative BPE trainer (Sennrich et al.), not a tokenizer heuristic.

    Scale shape: the 100 TB corpus is touched ONCE — a word-frequency
    groupBy — and every training iteration then runs on the VOCAB table
    (thousands of rows, not billions): explode adjacent symbol pairs,
    weight by word frequency, take the argmax pair (total-order
    tiebreak: weight DESC, left ASC, right ASC) as a ONE-ROW DataFrame,
    and apply the merge greedily left-to-right inside each word via one
    array fold over a broadcast of that row — no ``collect``, nothing
    ever reaches the driver (the package-wide invariant). The loop
    mirrors the k-means pattern: ``localCheckpoint`` truncates lineage
    per round.

    Returns (rank BIGINT, left STRING, right STRING, merged STRING) —
    rank 1 is the first-learned merge; fewer rows than ``n_merges``
    when the vocab runs out of pairs. Deterministic by construction;
    ``tests/test_bpe_merges.py`` pins it against an independent
    pure-Python replica."""
    from pyspark.sql import functions as F

    from pulsar_project_spark.functions.text import clean_string, tokenize

    words = (
        docs.select(F.explode(tokenize(clean_string(text_col))).alias("w"))
        .groupBy("w").agg(F.count("*").alias("freq"))
    )
    # word -> symbol array: characters, with an end-of-word marker </w>
    vocab = words.select(
        "freq",
        F.concat(
            F.filter(F.split(F.col("w"), ""), lambda c: c != ""),
            F.array(F.lit("</w>")),
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merge_rows = []
    for rank in range(1, n_merges + 1):
        pairs = vocab.select(
            "freq",
            # SQL-string HOFs (round 13): Python-lambda HOFs pay a py4j
            # callback per construction, per training round
            F.explode(F.expr(
                "zip_with(slice(syms, 1, greatest(size(syms) - 1, 0)),"
                " slice(syms, 2, greatest(size(syms) - 1, 0)),"
                " (l, r) -> struct(l as l, r as r))")).alias("p"),
        )
        # best stays LAZY (round 13): it was localCheckpoint(eager)ed,
        # one extra driver action + materialization per round. As the
        # broadcast side of the fold below it is built inline in the
        # vocab checkpoint's action (one pairs-agg over the ~vocab-sized
        # table — map-side combinable, cheap); the argmax is
        # deterministic (total-order tiebreak), so the final merge-table
        # union re-deriving each round's best off that round's
        # CHECKPOINTED vocab yields identical rows. Measured interleaved
        # (5 alternations): med 2.84 -> 2.40 s, parity exceptAll 0/0.
        best = (
            pairs.groupBy("p").agg(F.sum("freq").alias("weight"))
            .orderBy(F.col("weight").desc(), F.col("p.l").asc(),
                     F.col("p.r").asc())
            .limit(1)
            .select(
                F.col("p.l").alias("__l"), F.col("p.r").alias("__r"),
                F.concat("p.l", "p.r").alias("__m"),
            )
        )
        merge_rows.append(best.select(
            F.lit(rank).cast("bigint").alias("rank"),
            F.col("__l").alias("left"), F.col("__r").alias("right"),
            F.col("__m").alias("merged"),
        ))
        # greedy non-overlapping left-to-right merge inside each word;
        # get() is NULL-safe out of bounds (ANSI-proof on empty acc)
        vocab = vocab.crossJoin(F.broadcast(best)).select(
            "freq",
            F.expr(
                "aggregate(syms, cast(array() as array<string>),"
                " (acc, s) -> CASE WHEN size(acc) > 0"
                " AND get(acc, size(acc) - 1) = __l AND s = __r"
                " THEN concat(slice(acc, 1, size(acc) - 1), array(__m))"
                " ELSE concat(acc, array(s)) END)").alias("syms"),
        ).localCheckpoint(eager=True)

    out = merge_rows[0]
    for df in merge_rows[1:]:
        out = out.unionByName(df)
    return out


# Boundary markers for the string-domain encoder: every symbol is
# wrapped \x1f sym \x1e, so a merge pass is ONE native replace() of
# "\x1f l \x1e \x1f r \x1e" with "\x1f lr \x1e" — string boundaries
# make prefix/suffix false matches impossible, and Java replace's
# left-to-right non-overlapping scan IS the greedy merge recurrence
# (proof by cases in tests/test_bpe_merges.py; exceptAll parity with
# the array fold on the full corpus). Control characters never occur
# in tokenizer output (tokenize strips whitespace/punctuation).
BPE_SYM_L = "\x1f"
BPE_SYM_R = "\x1e"


def word_to_symstr(w):
    """word column -> boundary-marked symbol string, with the </w>
    end-of-word marker symbol appended."""
    from pyspark.sql import functions as F

    return F.concat(
        F.regexp_replace(w, "(.)", BPE_SYM_L + "$1" + BPE_SYM_R),
        F.lit(BPE_SYM_L + "</w>" + BPE_SYM_R),
    )


def encode_symstr(merge_arr_col, symstr_col):
    """Fold the ranked merge array over the symbol string: one native
    replace() per merge, so the per-word cost is O(merges · length) in
    codegen'd string ops instead of the array fold's O(merges ·
    length²) interpreted accumulator copies (round-6 probe,
    BENCH_NOTES.md). Returns the encoded symbol string; token count =
    number of \x1e markers left."""
    from pyspark.sql import functions as F

    return F.aggregate(
        merge_arr_col, symstr_col,
        lambda acc, m: F.replace(
            acc,
            F.concat(F.lit(BPE_SYM_L), m["left"], F.lit(BPE_SYM_R),
                     F.lit(BPE_SYM_L), m["right"], F.lit(BPE_SYM_R)),
            F.concat(F.lit(BPE_SYM_L), m["merged"], F.lit(BPE_SYM_R)),
        ),
    )


def symstr_token_count(enc):
    from pyspark.sql import functions as F

    return (F.length(enc)
            - F.length(F.replace(enc, F.lit(BPE_SYM_R), F.lit("")))).cast("int")


def apply_merge_pass(syms, m):
    """ONE greedy left-to-right non-overlapping merge pass over a symbol
    array: wherever (m.left, m.right) sit adjacent, fuse into m.merged
    — the same recurrence training uses, shared by the learned-merge and
    fixed-merge encoders. Exactly SQL ``replace()`` semantics when each
    symbol maps to one fresh character (the fixed twin's oracle relies
    on this equivalence)."""
    from pyspark.sql import functions as F

    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.get(acc, F.size(acc) - 1) == m["left"])
            & (s == m["right"]),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(m["merged"])),
        ).otherwise(F.concat(acc, F.array(s))),
    )


# Constant merge table for the deterministic oracle twin: rank-ordered,
# with one CASCADING merge (rank-2 consumes rank-1's output) so the
# symbol-level — not character-level — semantics are what's certified.
FIXED_BPE_MERGES: tuple[tuple[str, str, str], ...] = (
    ("t", "h", "th"),
    ("th", "e", "the"),
    ("e", "r", "er"),
    ("a", "n", "an"),
    ("i", "n", "in"),
)


def bpe_fixed_encode_census(docs, id_col: str = "doc_id",
                            text_col: str = "text"):
    """The learned-BPE encoder with the merge table pinned to
    ``FIXED_BPE_MERGES`` — the SAME nested higher-order fold as
    ``bpe_encode_census``, driver-certifiable because the oracle can
    replay a constant merge table: one greedy symbol-level merge pass
    equals one SQL ``replace()`` onto a fresh single character (both
    are left-to-right non-overlapping), so k ranked passes are k
    chained replaces, and ``n_tokens = length(final) + 1`` (the
    ``</w>`` marker never participates in a merge). This gives the
    rows-only learned pair a hash-level driver verdict on the encode
    path (the ``ivf_cell_assignment`` certification pattern)."""
    from pyspark.sql import functions as F

    from pulsar_project_spark.functions.text import clean_string, tokenize

    merge_arr = F.array(*[
        F.struct(F.lit(l).alias("left"), F.lit(r).alias("right"),
                 F.lit(m).alias("merged"))
        for l, r, m in FIXED_BPE_MERGES
    ])
    n_cpu = docs.sparkSession.sparkContext.defaultParallelism
    words = docs.select(
        F.col(id_col),
        F.explode(tokenize(clean_string(text_col))).alias("w"),
    ).repartition(n_cpu, id_col).withColumn(
        "symstr", word_to_symstr(F.col("w")),
    )
    encoded = words.select(
        id_col,
        F.length("w").alias("n_chars"),
        symstr_token_count(
            encode_symstr(merge_arr, F.col("symstr"))
        ).alias("n_tokens"),
    )
    return encoded.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.sum("n_tokens").cast("bigint").alias("n_bpe_tokens"),
        (F.sum("n_chars") + F.count("*")).cast("bigint")
        .alias("n_symbols_pre"),
    )


def bpe_encode_census(docs, n_merges: int = 8, id_col: str = "doc_id",
                      text_col: str = "text"):
    """APPLY the learned BPE merge table: encode every word by folding
    the ranked merges (outer fold) over its symbol array (inner greedy
    fold — the same left-to-right pass as training), then census the
    result per doc: word count, total BPE tokens, compression vs
    character count. The ranked merge table rides in as ONE broadcast
    array row — training output never touches the driver, and encoding
    folds the 8 merges over a boundary-marked symbol STRING (one
    native replace() per merge — see ``encode_symstr``), no UDF."""
    from pyspark.sql import functions as F

    from pulsar_project_spark.functions.text import clean_string, tokenize

    merges = learn_bpe_merges(docs, n_merges, id_col, text_col)
    # collect_list order is NOT guaranteed across the shuffle into the
    # global aggregate (it only looks ordered on a local single
    # partition) — a scrambled merge order would silently change BPE
    # encodings at scale. Carry rank INTO the struct and array_sort:
    # a rank-first struct sorts by rank, deterministically.
    merge_arr = merges.agg(
        F.array_sort(
            F.collect_list(F.struct("rank", "left", "right", "merged"))
        ).alias("__ms")
    )

    # The per-word nested fold runs INTERPRETED (HOFs sit outside
    # codegen), so this stage is CPU-bound — and a broadcast crossJoin
    # inherits the scan's partitioning (ONE task for a single-file
    # corpus). Pin the fold's parallelism to core count, same as the
    # levenshtein confirm (measured 14.9 s → ~1 s at sf0.1).
    n_cpu = docs.sparkSession.sparkContext.defaultParallelism
    words = docs.select(
        F.col(id_col),
        F.explode(tokenize(clean_string(text_col))).alias("w"),
    ).repartition(n_cpu, id_col).withColumn(
        "symstr", word_to_symstr(F.col("w")),
    )

    encoded = words.crossJoin(F.broadcast(merge_arr)).select(
        id_col,
        F.length("w").alias("n_chars"),
        symstr_token_count(
            encode_symstr(F.col("__ms"), F.col("symstr"))
        ).alias("n_tokens"),
    )
    return encoded.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.sum("n_tokens").cast("bigint").alias("n_bpe_tokens"),
        (F.sum("n_chars") + F.count("*")).cast("bigint").alias("n_symbols_pre"),
    )


def char_bigram_familiarity(docs, id_col: str = "doc_id",
                            text_col: str = "text"):
    """Self-supervised statistical quality signal: how 'familiar' is
    each document's character-bigram distribution relative to the
    corpus it sits in? Rare-bigram documents (mojibake, binary spill,
    wrong-language shards) score low — the LM-perplexity idea with the
    log table replaced by raw corpus counts so every number is an
    exact integer (no cross-engine float-log drift).

    Scale shape (round-6 rewrite, BENCH_NOTES.md): the per-(doc,
    bigram) count relation is produced by ONE Arrow ``mapInPandas``
    pass — each document's characters become a uint32 code vector
    (``utf-32-le``, so char semantics match SQL ``substring`` exactly,
    astral planes included), bigrams are a vectorized
    shift-and-combine, and ``np.unique`` counts them — replacing the
    explode→shuffle of the raw bigram stream (50M tiny rows at sf1)
    with per-row numpy (measured 24 s → 2.4 s hot at sf1, exceptAll
    parity). The relation is ``localCheckpoint``-ed because BOTH
    consumers read it: the corpus table derives from it by a tiny
    groupBy (≤ ~4k ASCII bigram groups) and broadcasts back for the
    scoring join. Docs shorter than 2 chars are dropped explicitly."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    base = docs.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) >= 2)
        & F.col(id_col).isNotNull()
    )
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("bg", StringType()),
        StructField("cnt_in_doc", LongType()),
    ])

    def counts(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            bgs: list[str] = []
            cs: list[int] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                c = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                # 0x200000 > max code point: (a, b) -> a<<21 | b is
                # collision-free, and chr() recovers both exactly
                codes = c[:-1] * 0x200000 + c[1:]
                uniq, cnt = np.unique(codes, return_counts=True)
                ids.extend([int(doc_id)] * len(uniq))
                bgs.extend(chr(u >> 21) + chr(u & 0x1FFFFF) for u in uniq)
                cs.extend(cnt.tolist())
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "bg": pd.Series(bgs, dtype="object"),
                "cnt_in_doc": pd.Series(cs, dtype="int64"),
            })

    n_cpu = docs.sparkSession.sparkContext.defaultParallelism
    per_doc = (
        base.select(id_col, text_col)
        .repartition(n_cpu, id_col)
        .mapInPandas(counts, out_schema)
        .localCheckpoint(eager=True)
    )
    table = per_doc.groupBy("bg").agg(
        F.sum("cnt_in_doc").alias("cnt")
    )
    return (
        per_doc.join(F.broadcast(table), "bg")
        .groupBy(id_col)
        .agg(
            F.sum("cnt_in_doc").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("cnt_in_doc") * F.col("cnt")).cast("bigint")
             .alias("familiarity_sum"),
        )
    )
