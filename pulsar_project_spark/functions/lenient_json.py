"""Lenient (json5-style) JSON parsing — the reference parses LLM output
with the ``json5`` library (``utils.py:140,162``), which tolerates
trailing commas, single quotes, and unquoted keys. ``from_json`` is
strict, so full parity needs Python (SURVEY.md §7.6): an Arrow-batched
Pandas UDF, never row-at-a-time.

Backend: real ``json5`` when importable; otherwise a deterministic
normalizer (single→double quotes, trailing-comma strip, unquoted-key
quoting) feeding stdlib ``json``. Both paths are pure functions of the
input string.
"""

from __future__ import annotations

import json
import re

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

try:  # pragma: no cover - not shipped in this container
    import json5  # type: ignore

    def _loads(s: str):
        return json5.loads(s)
except ImportError:
    _TRAILING_COMMA = re.compile(r",\s*([}\]])")
    _UNQUOTED_KEY = re.compile(r"([{,]\s*)([A-Za-z_][A-Za-z0-9_]*)(\s*:)")
    _SINGLE_QUOTED = re.compile(r"'([^'\\]*(?:\\.[^'\\]*)*)'")

    def _loads(s: str):
        s = _SINGLE_QUOTED.sub(lambda m: json.dumps(m.group(1)), s)
        s = _UNQUOTED_KEY.sub(r'\1"\2"\3', s)
        s = _TRAILING_COMMA.sub(r"\1", s)
        return json.loads(s)


def lenient_parse(s: str | None) -> str | None:
    """Parse leniently, return canonical strict JSON (sorted keys) or
    None when unparseable — canonical form makes results comparable."""
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
