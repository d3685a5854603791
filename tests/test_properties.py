"""Property-based tests (hypothesis) for the pure-Python surfaces."""

from __future__ import annotations

import json
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_project_spark.functions.lenient_json import lenient_parse

_safe_text = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    max_size=12,
)
_json_val = st.recursive(
    st.none() | st.booleans() | st.integers(-10**9, 10**9) | _safe_text,
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(_safe_text, children, max_size=4),
    max_leaves=12,
)


def _canon(obj) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


@given(_json_val)
@settings(max_examples=200, deadline=None)
def test_strict_json_roundtrips_canonically(obj):
    assert lenient_parse(json.dumps(obj)) == _canon(obj)


@given(_json_val)
@settings(max_examples=200, deadline=None)
def test_trailing_commas_tolerated(obj):
    s = json.dumps(obj)
    # values are alphanumeric-only, so brace/bracket surgery never
    # touches string contents. json5 allows a trailing comma only after
    # an element — `[,]`/`{,}` are invalid — so leave empties alone.
    lenient = re.sub(r"(?<=[^\[{])\}", ",}", re.sub(r"(?<=[^\[{])\]", ",]", s))
    assert lenient_parse(lenient) == _canon(obj)


@given(st.dictionaries(
    st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True),
    st.integers(-1000, 1000), min_size=1, max_size=5,
))
@settings(max_examples=200, deadline=None)
def test_unquoted_keys_tolerated(d):
    body = ", ".join(f"{k}: {v}" for k, v in d.items())
    assert lenient_parse("{" + body + "}") == _canon(d)


@given(st.lists(_safe_text, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_single_quotes_tolerated(xs):
    s = "[" + ", ".join("'" + x + "'" for x in xs) + "]"
    assert lenient_parse(s) == _canon(xs)
