"""Lenient (json5-style) JSON parsing — the reference parses LLM output
with the ``json5`` library (``utils.py:140,162``), which tolerates
trailing commas, single quotes, unquoted keys, comments, hex numbers,
and ``Infinity``/``NaN`` literals. ``from_json`` is strict, so full
parity needs Python (SURVEY.md §7.6): an Arrow-batched Pandas UDF,
never row-at-a-time.

Backend: real ``json5`` when importable; otherwise a small
recursive-descent parser below implementing the json5 grammar subset
the reference's inputs exercise. The earlier regex normalizer was
retired because it corrupted strings containing ``//`` and could not
express comments or hex numbers; the parser tokenizes strings first,
so comment stripping can never touch string bodies. Both paths are
pure functions of the input string.
"""

from __future__ import annotations

import json
import re

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_WS = " \t\n\r\v\f\u00a0\u2028\u2029\ufeff"
_IDENT = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_HEX = re.compile(r"[+-]?0[xX][0-9a-fA-F]+")
# json5 numbers: optional sign, leading/trailing decimal point allowed
_NUM = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")
_ESCAPES = {
    '"': '"', "'": "'", "\\": "\\", "/": "/", "b": "\b", "f": "\f",
    "n": "\n", "r": "\r", "t": "\t", "v": "\v", "0": "\0",
}


class _Json5Error(ValueError):
    pass


class _P:
    """Recursive-descent parser for the json5 grammar subset: comments,
    both quote styles with json5 escapes (\\x, line continuations),
    unquoted identifier keys, trailing commas, hex ints, signed
    Infinity/NaN, leading '+' and bare-dot decimals."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.n = len(s)

    def err(self, why: str):
        raise _Json5Error(f"{why} at {self.i}")

    def skip_ws(self) -> None:
        s, n = self.s, self.n
        while self.i < n:
            c = s[self.i]
            if c in _WS:
                self.i += 1
            elif c == "/" and self.i + 1 < n and s[self.i + 1] == "/":
                j = s.find("\n", self.i + 2)
                self.i = n if j < 0 else j + 1
            elif c == "/" and self.i + 1 < n and s[self.i + 1] == "*":
                j = s.find("*/", self.i + 2)
                if j < 0:
                    self.err("unterminated comment")
                self.i = j + 2
            else:
                return

    def parse(self):
        self.skip_ws()
        v = self.value()
        self.skip_ws()
        if self.i != self.n:
            self.err("trailing data")
        return v

    def value(self):
        if self.i >= self.n:
            self.err("unexpected end")
        c = self.s[self.i]
        if c == "{":
            return self.obj()
        if c == "[":
            return self.arr()
        if c in "\"'":
            return self.string(c)
        return self.literal_or_number()

    def obj(self):
        self.i += 1
        out = {}
        while True:
            self.skip_ws()
            if self.i >= self.n:
                self.err("unterminated object")
            if self.s[self.i] == "}":
                self.i += 1
                return out
            c = self.s[self.i]
            if c in "\"'":
                key = self.string(c)
            else:
                m = _IDENT.match(self.s, self.i)
                if not m:
                    self.err("bad object key")
                key = m.group(0)
                self.i = m.end()
            self.skip_ws()
            if self.i >= self.n or self.s[self.i] != ":":
                self.err("expected ':'")
            self.i += 1
            self.skip_ws()
            out[key] = self.value()
            self.skip_ws()
            if self.i < self.n and self.s[self.i] == ",":
                self.i += 1
            elif self.i < self.n and self.s[self.i] == "}":
                self.i += 1
                return out
            else:
                self.err("expected ',' or '}'")

    def arr(self):
        self.i += 1
        out = []
        while True:
            self.skip_ws()
            if self.i >= self.n:
                self.err("unterminated array")
            if self.s[self.i] == "]":
                self.i += 1
                return out
            out.append(self.value())
            self.skip_ws()
            if self.i < self.n and self.s[self.i] == ",":
                self.i += 1
            elif self.i < self.n and self.s[self.i] == "]":
                self.i += 1
                return out
            else:
                self.err("expected ',' or ']'")

    def string(self, quote: str) -> str:
        s, n = self.s, self.n
        self.i += 1
        buf: list[str] = []
        while True:
            if self.i >= n:
                self.err("unterminated string")
            c = s[self.i]
            if c == quote:
                self.i += 1
                return "".join(buf)
            if c == "\\":
                self.i += 1
                if self.i >= n:
                    self.err("bad escape")
                e = s[self.i]
                if e in _ESCAPES:
                    buf.append(_ESCAPES[e])
                    self.i += 1
                elif e == "u":
                    buf.append(chr(int(s[self.i + 1 : self.i + 5], 16)))
                    self.i += 5
                elif e == "x":
                    buf.append(chr(int(s[self.i + 1 : self.i + 3], 16)))
                    self.i += 3
                elif e in "\n\u2028\u2029":  # line continuation
                    self.i += 1
                elif e == "\r":  # \r or \r\n continuation
                    self.i += 2 if s[self.i + 1 : self.i + 2] == "\n" else 1
                else:
                    self.err("bad escape")
            elif c in "\n\r":
                self.err("newline in string")
            else:
                buf.append(c)
                self.i += 1

    def literal_or_number(self):
        s = self.s
        for word, val in (
            ("true", True), ("false", False), ("null", None),
            ("Infinity", float("inf")), ("+Infinity", float("inf")),
            ("-Infinity", float("-inf")), ("NaN", float("nan")),
            ("+NaN", float("nan")), ("-NaN", float("nan")),
        ):
            if s.startswith(word, self.i):
                self.i += len(word)
                return val
        m = _HEX.match(s, self.i)
        if m:
            self.i = m.end()
            return int(m.group(0), 16)
        m = _NUM.match(s, self.i)
        if m:
            self.i = m.end()
            t = m.group(0)
            if t.lstrip("+-").isdigit():
                return int(t)
            return float(t)
        self.err("unexpected token")


try:  # pragma: no cover - not shipped in this container
    import json5  # type: ignore

    def _lenient_backend(s: str):
        return json5.loads(s)
except ImportError:

    def _lenient_backend(s: str):
        return _P(s).parse()


def _loads(s: str):
    """Strict-first parse: try the C-accelerated ``json.loads`` and fall
    back to the json5 grammar only when it rejects. On any input strict
    JSON accepts, both parsers produce identical Python values (same
    int/float split, same last-key-wins objects, and Python's ``json``
    already admits the Infinity/NaN literals the json5 path handles), so
    this is purely a fast path: real-world corpora are overwhelmingly
    strict JSON, and the Python recursive descent was the whole cost of
    the lenient UDF/UDTF on such data (~10× per row)."""
    try:
        return json.loads(s)
    except Exception:
        return _lenient_backend(s)


def lenient_parse(s: str | None) -> str | None:
    """Parse leniently, return canonical JSON (sorted keys) or None when
    unparseable — canonical form makes results comparable. Infinity/NaN
    round-trip as the Python repr tokens, matching a json5.loads →
    json.dumps pipeline."""
    if s is None:
        return None
    try:
        return json.dumps(_loads(s), sort_keys=True, separators=(",", ":"))
    except Exception:
        return None


# explicit DataType, not a DDL string: the decorator re-runs on Python
# workers at deserialization time, where no session exists to parse DDL
@pandas_udf(StringType())
def lenient_json_canonical(col: pd.Series) -> pd.Series:
    """Arrow-batched lenient parse → canonical JSON string column."""
    return col.map(lenient_parse)


def flatten_paths(value, prefix: str = "$"):
    """Depth-first (document-order) path flatten of a parsed JSON value:
    yields (jsonpath-ish path, scalar-as-string) leaves. Dict keys keep
    document order (the lenient parser preserves it); arrays index."""
    if isinstance(value, dict):
        if not value:
            yield prefix, "{}"
        for k, v in value.items():
            yield from flatten_paths(v, f"{prefix}.{k}")
    elif isinstance(value, list):
        if not value:
            yield prefix, "[]"
        for i, v in enumerate(value):
            yield from flatten_paths(v, f"{prefix}[{i}]")
    elif value is None:
        yield prefix, "null"
    elif value is True:
        yield prefix, "true"
    elif value is False:
        yield prefix, "false"
    else:
        yield prefix, json.dumps(value) if isinstance(value, str) else repr(value)


class Json5PathsUDTF:
    """Python UDTF (Spark 4 table function surface): one input string of
    lenient JSON5 → one row per leaf (path, value). The lateral-join
    form of the lenient parser — semi-structured flattening that
    ``explode(from_json(...))`` cannot express because the grammar is
    JSON5 (comments, single quotes, trailing commas, unquoted keys) and
    the shape is unknown ahead of time.

    Registered Arrow-optimized (``useArrow=True``) — batches cross the
    JVM↔Python boundary as Arrow, the UDTF body is the per-row
    generator. Unparseable input yields a single ($error, null-reason)
    row rather than dropping the document silently."""

    def eval(self, s: str | None):
        if s is None:
            return
        try:
            parsed = _loads(s)
        except Exception:
            yield "$error", "unparseable"
            return
        yield from flatten_paths(parsed)
