"""Deterministic LLM-provider stub — the SURVEY §2.10 boundary.

The reference's ``provider.py:25-257`` defines ``LLMProvider`` (one
method, ``generate_response(prompt) -> str``) and six HTTP-backed
implementations selected by ``get_provider`` (provider.py:9-22). The
calls are external I/O — not computation — so the engine ships the
INTERFACE plus a seeded, pure-function fake: the react-loop dispatch
(client.py:216-333) composes end-to-end against it, tests are
hermetic, and no network exists anywhere.

Determinism contract: the response is a pure function of
(seed, prompt) via md5, emitted in the exact fenced-JSON shape the
reference demands of its real providers (client.py:122-136: triple
backticks, keys text/think/mem_op/tool/finished). Two forms, pinned
bit-equal by tests/test_providers.py:

- ``DeterministicProvider.generate_response`` — driver-side Python,
  the interface the reference's call sites use;
- ``response_expr`` — the same function as a Spark Column over a
  prompt column (md5/substr/concat built-ins, zero UDFs), so the
  react loop can run UNROLLED inside one DataFrame plan with the
  provider applied to millions of sessions at once. That is the
  Spark-first translation of "call the LLM per turn": the boundary
  becomes a vectorized column transform; swapping in a real provider
  means swapping this column for a Pandas-UDF batch endpoint call.
"""

from __future__ import annotations

import hashlib
import json
from abc import ABC, abstractmethod

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "LLMProvider",
    "DeterministicProvider",
    "get_provider",
    "response_expr",
    "RESPONSE_SCHEMA",
]

# from_json schema for the parsed structured output (client.py:194-214)
RESPONSE_SCHEMA = (
    "think STRING, text STRING, "
    "mem_op STRUCT<name: STRING, args: MAP<STRING, STRING>>, "
    "tool STRUCT<name: STRING, args: MAP<STRING, STRING>>, "
    "finished BOOLEAN"
)


class LLMProvider(ABC):
    """Abstract provider (reference provider.py:25-31), sync form."""

    @abstractmethod
    def generate_response(self, prompt: str) -> str:
        """Generate a response string for the prompt."""


class DeterministicProvider(LLMProvider):
    """Seeded pure-function provider: md5(seed || prompt) drives every
    choice, so replays are byte-identical and the react loop is
    testable without any network. Decision rule (mirrored bit-for-bit
    by ``response_expr``):

    - h = md5(seed + prompt) hex
    - finished  = int(h[0], 16) % 2 == 0
    - mem_op emitted when int(h[1], 16) % 3 == 0
    - tool  emitted when int(h[2], 16) % 3 == 0
    - text  = 'Answer ' + h[0:8]; think = 'Because ' + h[8:16]
    - mem_op = add_memory_record(content=h[16:22]);
      tool   = search(q=h[22:28])
    """

    def __init__(self, seed: str = "0"):
        self.seed = str(seed)

    def generate_response(self, prompt: str) -> str:
        h = hashlib.md5((self.seed + prompt).encode("utf-8")).hexdigest()
        out: dict = {
            "text": f"Answer {h[0:8]}",
            "think": f"Because {h[8:16]}",
        }
        if int(h[1], 16) % 3 == 0:
            out["mem_op"] = {"name": "add_memory_record",
                             "args": {"content": h[16:22]}}
        if int(h[2], 16) % 3 == 0:
            out["tool"] = {"name": "search", "args": {"q": h[22:28]}}
        out["finished"] = int(h[0], 16) % 2 == 0
        body = json.dumps(out, separators=(", ", ": "))
        return f"```\n{body}\n```"


def response_expr(prompt: Column, seed: str = "0") -> Column:
    """``DeterministicProvider.generate_response`` as a Spark Column —
    md5/substr/CASE built-ins only, so the provider boundary rides
    whole-stage codegen across any number of sessions. The emitted
    string is byte-equal to the Python form (pinned by test): JSON is
    assembled with the same separators and key order json.dumps uses.
    """
    h = F.md5(F.concat(F.lit(str(seed)), prompt))

    def hx(i: int) -> Column:  # int(h[i], 16)
        return F.conv(F.substring(h, i + 1, 1), 16, 10).cast("int")

    mem = F.concat(
        F.lit('"mem_op": {"name": "add_memory_record", '
              '"args": {"content": "'),
        F.substring(h, 17, 6), F.lit('"}}, '))
    tool = F.concat(
        F.lit('"tool": {"name": "search", "args": {"q": "'),
        F.substring(h, 23, 6), F.lit('"}}, '))
    body = F.concat(
        F.lit('{"text": "Answer '), F.substring(h, 1, 8),
        F.lit('", "think": "Because '), F.substring(h, 9, 8),
        F.lit('", '),
        F.when(hx(1) % 3 == 0, mem).otherwise(F.lit("")),
        F.when(hx(2) % 3 == 0, tool).otherwise(F.lit("")),
        F.lit('"finished": '),
        F.when(hx(0) % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit("}"),
    )
    return F.concat(F.lit("```\n"), body, F.lit("\n```"))


def get_provider(provider_name: str = "Deterministic"):
    """Factory (reference provider.py:9-22). Every network-backed name
    the reference routes maps to the deterministic stub here — the
    engine computes; serving real models is outside it by SURVEY §2.1.
    """
    known = {"Deterministic", "Pollinations", "Ollama", "OpenAI",
             "Anthropic", "Gemini", "Open", "Doubao", "Qwen", "GLM",
             "OpenRouter"}
    if provider_name not in known:
        return None
    return DeterministicProvider
