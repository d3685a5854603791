"""Provider-stub gates: the deterministic fake is byte-equal between
its Python interface form and its Spark column form, parses under the
client's fenced-JSON contract, and the factory routes every name the
reference routes."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pulsar_project_spark.functions.providers import (
    RESPONSE_SCHEMA,
    DeterministicProvider,
    get_provider,
    response_expr,
)


def test_python_and_spark_forms_are_byte_equal(spark):
    prompts = [f"prompt {i} with words filter merge {i * 7}"
               for i in range(64)] + ["", "unicode ✓ prompt", "a" * 500]
    prov = DeterministicProvider(seed="42")
    want = [prov.generate_response(p) for p in prompts]
    df = spark.createDataFrame([(p,) for p in prompts], ["prompt"])
    got = [r["resp"] for r in
           df.select(response_expr(F.col("prompt"), seed="42")
                     .alias("resp")).collect()]
    assert got == want


def test_response_parses_under_client_contract(spark):
    """The fenced body must round-trip through the same parse the
    react loop uses (client.py:122-136, 194-214): strip fences,
    from_json with the declared schema."""
    prompts = [f"q{i}" for i in range(32)]
    df = spark.createDataFrame([(p,) for p in prompts], ["prompt"])
    parsed = df.select(
        F.from_json(
            F.regexp_extract(response_expr(F.col("prompt")),
                             r"```\n(.*)\n```", 1),
            RESPONSE_SCHEMA,
        ).alias("r")
    ).select("r.*").collect()
    assert all(r["text"].startswith("Answer ") for r in parsed)
    assert all(r["think"].startswith("Because ") for r in parsed)
    assert all(r["finished"] is not None for r in parsed)
    # both optional branches occur across 32 prompts (p≈1/3 each)
    assert any(r["mem_op"] is not None for r in parsed)
    assert any(r["tool"] is not None for r in parsed)
    assert any(r["mem_op"] is None for r in parsed)
    # and the python form agrees on WHICH prompts carry which branch
    prov = DeterministicProvider()
    for p, r in zip(prompts, parsed):
        d = json.loads(
            prov.generate_response(p).split("```\n")[1].split("\n```")[0])
        assert ("mem_op" in d) == (r["mem_op"] is not None)
        assert ("tool" in d) == (r["tool"] is not None)
        assert d["finished"] == r["finished"]


def test_factory_routes_reference_names():
    for name in ["Deterministic", "Pollinations", "Ollama", "OpenAI",
                 "Anthropic", "Gemini", "Open", "Doubao", "Qwen",
                 "GLM", "OpenRouter"]:
        assert get_provider(name) is DeterministicProvider
    assert get_provider("nope") is None


def test_seed_changes_response():
    p = "same prompt"
    assert (DeterministicProvider("1").generate_response(p)
            != DeterministicProvider("2").generate_response(p))
