"""Text scalar expression builders.

Column-expression equivalents of the reference's text utilities — all
JVM-side built-ins (whole-stage codegen, no Python in the hot path):

* ``clean_string``  ⇔ reference ``utils.py:249-252``
* ``tokenize`` / stopword filter ⇔ reference ``utils.py:291-316`` (ASCII
  path; the reference's CJK branch is broken — ``utils.py:300`` calls
  ``len(char.strip)`` unparenthesized — so the ASCII path is the defined
  behavior we reproduce; see SURVEY.md §7.3)
* ``truncate`` ⇔ ``utils.py:246-247``; display truncation w/ ellipsis ⇔
  ``task.py:505-509``
* ``sanitize_filename`` ⇔ ``task.py:236-239``
* ``extract_title`` ⇔ ``task.py:350-370``
* ``extract_between_markers`` ⇔ ``task.py:263-285``

Each builder returns a Column, so operators compose them inside a single
select — one projection, one codegen stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference stopword set (utils.py:261-274). This is behavioral data, not
# code: scoring parity requires the same word list bit-for-bit.
COMMON_ENGLISH_WORDS = frozenset({
    "the", "and", "of", "a", "to", "in", "is", "you", "that", "it",
    "he", "was", "for", "on", "are", "as", "with", "his", "they", "i",
    "at", "be", "this", "have", "from", "or", "one", "had", "by", "word",
    "but", "not", "what", "all", "were", "we", "when", "your", "can",
    "said", "there", "use", "an", "each", "which", "she", "do", "how",
    "their", "if", "will", "up", "other", "about", "out", "many", "then",
    "them", "these", "so", "some", "her", "would", "make", "like",
    "him", "into", "time", "has", "look", "two", "more", "write",
    "go", "see", "number", "no", "way", "could", "people", "my",
    "than", "first", "water", "been", "call", "who", "oil", "its",
    "now", "find", "long", "down", "day", "did", "get", "come",
    "made", "may", "part",
})

# NOTE: the reference checks ``temp_word.lower() not in common_english_words``
# but its set contains "I" uppercase (utils.py:261-274) — so "i" is NOT
# actually filtered by the reference. We keep the evident intent (lowercase
# set) for our engine; declared queries avoid the single-letter edge.

# Reference Chinese stopword set (utils.py:277-289) — behavioral data,
# used by the CJK tokenizer path (keywords_cjk below).
COMMON_CHINESE_WORDS = frozenset(
    "的一是不在人有我他这个上们来到时大地为"
    "子中你说生国年着就那和要她出也得里后自以"
    "会家可下而过天去能对小多然于心学么之都好"
    "看起发当没成只如事把还用第样道想作种开美"
    "总从无情己面最女但现前些所同日手又行意动"
    "方期它头经长儿"
)

STOPWORDS_SQL_ARRAY = "array(" + ",".join(f"'{w}'" for w in sorted(COMMON_ENGLISH_WORDS)) + ")"


def clean_string(col: Column | str) -> Column:
    """lower + strip every non-word, non-space char (utils.py:249-252).

    Java regex ``\\w``/``\\s`` are ASCII classes by default, matching
    Python's behavior on ASCII corpora and DuckDB's RE2 semantics — the
    oracle mirrors with ``regexp_replace(lower(x),'[^\\w\\s]','','g')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), r"[^\w\s]", "")


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenizer over cleaned text → array<string>, empties
    dropped. (The reference's char-loop accumulates [A-Za-z0-9]+ runs and
    emits punctuation as single tokens; after ``clean_string`` no
    punctuation survives, so split-on-whitespace is exactly equivalent —
    this is the composition ``simple_rag`` actually runs, utils.py:326-330.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def remove_stopwords(tokens: Column) -> Column:
    """Drop reference stopwords (utils.py:261-274, applied :293-315).

    ``array_except`` also dedups — the reference keeps duplicate tokens.
    Use ``F.filter`` + membership to preserve multiplicity.
    """
    stop = F.array(*[F.lit(w) for w in sorted(COMMON_ENGLISH_WORDS)])
    return F.filter(tokens, lambda t: ~F.array_contains(stop, F.lower(t)))


def keywords(col: Column | str) -> Column:
    """Full reference keyword pipeline: clean → tokenize → de-stopword."""
    return remove_stopwords(tokenize(clean_string(col)))


# --- CJK tokenizer path (utils.py:291-316) ---------------------------------
#
# The reference's CJK branch is BROKEN in the original: utils.py:300
# calls ``len(char.strip)`` without parentheses, raising TypeError on any
# CJK input. Per SURVEY.md §7.3 we implement the evident INTENT — CJK
# chars in [一,鿿] emit as single-char tokens unless in the
# Chinese stopword set; ASCII-ish alnum runs accumulate and drop English
# stopwords; any other non-space char emits as its own token — and mark
# the deviation here. Char-level token classes are a per-row scalar
# transform → Arrow-batched pandas_udf (the JVM path can't express the
# run-accumulation + per-char class switch in one builtin expression).

# one token per match, classed by capture group: CJK char | alnum run
# (underscore excluded — Python isalnum() semantics) | other non-space
_CJK_TOKEN_RE = None  # compiled lazily inside the UDF worker


def _keywords_cjk_py(text: str) -> list[str]:
    """Pure-Python replica of the fixed reference loop — shared by the
    pandas UDF (vectorized via findall per row) and the unit tests."""
    import re as _re

    global _CJK_TOKEN_RE
    if _CJK_TOKEN_RE is None:
        _CJK_TOKEN_RE = _re.compile(
            r"([一-鿿])|([^\W_一-鿿]+)|(\S)"
        )
    out: list[str] = []
    for m in _CJK_TOKEN_RE.finditer(text):
        cjk, run, other = m.group(1), m.group(2), m.group(3)
        if cjk is not None:
            if cjk not in COMMON_CHINESE_WORDS:
                out.append(cjk)
        elif run is not None:
            if run.lower() not in COMMON_ENGLISH_WORDS:
                out.append(run)
        else:
            out.append(other)
    return out


def keywords_cjk(col: Column | str) -> Column:
    """Arrow-batched tokenizer covering the reference's full (fixed) CJK
    + ASCII semantics. Use :func:`keywords` (pure JVM) for ASCII-only
    corpora — this UDF exists for mixed-script text, where per-char CJK
    classing is the semantics. Python-defined behavior → rows-only in
    declared queries (SURVEY.md §7.3, §7.6)."""
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def _udf(texts):
        return texts.map(
            lambda t: _keywords_cjk_py(t) if t is not None else None
        )

    c = F.col(col) if isinstance(col, str) else col
    return _udf(c)


def truncate(col: Column | str, n: int) -> Column:
    """Prefix of length n (utils.py:246-247)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def truncate_display(col: Column | str, n: int) -> Column:
    """Display truncation: cap at n chars and append '...' when longer
    (task.py:505-509 response-summary behavior, default n=200)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > n, F.concat(F.substring(c, 1, n), F.lit("..."))).otherwise(c)


def sanitize_filename(col: Column | str, stem_cap: int = 30) -> Column:
    """Filename sanitization (task.py:236-239): strip chars outside
    [\\w\\s-], collapse runs of [-\\s] to '_', cap the stem length."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[^\w\s-]", "")
    collapsed = F.regexp_replace(stripped, r"[-\s]+", "_")
    return F.substring(collapsed, 1, stem_cap)


_TITLE_VERB_RE = r"^(create|build|develop|make|generate|write)\s+"


def extract_title(col: Column | str, cap: int = 60) -> Column:
    """Title extraction (task.py:350-370): first '.'-sentence else first
    50 chars; drop a leading create/build/... verb; title-case; cap 60.

    The leading-verb drop is an anchored case-insensitive regexp_replace —
    identical semantics in the DuckDB oracle (RE2 supports ``(?i)``)."""
    c = F.col(col) if isinstance(col, str) else col
    first_sentence = F.element_at(F.split(c, r"\."), 1)
    base = F.when(F.instr(c, ".") > 0, first_sentence).otherwise(F.substring(c, 1, 50))
    deverbed = F.regexp_replace(F.trim(base), "(?i)" + _TITLE_VERB_RE, "")
    return F.substring(F.initcap(F.trim(deverbed)), 1, cap)


def extract_between_markers(col: Column | str, start: str, end: str,
                            fallback_lines: int = 20) -> Column:
    """Marker substring extraction (task.py:263-285):
    ``text[find(start) : find(end, after start) + len(end)]``; when the end
    marker is missing, take the first ``fallback_lines`` lines from start.
    NULL when the start marker is absent."""
    c = F.col(col) if isinstance(col, str) else col
    spos = F.instr(c, start)                      # 1-based, 0 = missing
    after = F.substring(c, spos, 0x7FFFFFFF)      # suffix from start marker
    epos_rel = F.instr(F.substring(after, len(start) + 1, 0x7FFFFFFF), end)
    spanned = F.when(
        epos_rel > 0,
        F.substring(after, 1, len(start) + epos_rel - 1 + len(end)),
    ).otherwise(
        F.array_join(F.slice(F.split(after, "\n"), 1, fallback_lines), "\n")
    )
    return F.when(spos > 0, spanned)
