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
