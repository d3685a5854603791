"""React-loop parity gate (rows-only twin test): the UNROLLED Spark
plan in queries/capstones.py must produce byte-identical traces to a
straight-line Python replica of the reference's loop (client.py:216-333)
driven by the same DeterministicProvider — every message, every seq,
every stop decision."""

from __future__ import annotations

import json

import duckdb

from pulsar_project_spark.functions.providers import DeterministicProvider
from pulsar_project_spark.queries.capstones import (
    _REACT_ITERS,
    _REACT_SEED,
)
from pulsar_project_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _python_replica() -> list[tuple]:
    """The reference loop, replicated per session in plain Python over
    the same context digests the Spark plan derives."""
    con = duckdb.connect()
    ctx = con.execute(
        "SELECT user_id, 'events=' || count(*) || ' latest=' || "
        "max(event_type) FROM "
        f"read_parquet('{SF_DIR}/events.parquet') "
        "WHERE user_id IS NOT NULL GROUP BY user_id"
    ).fetchall()
    con.close()
    prov = DeterministicProvider(seed=_REACT_SEED)
    out = []
    for session, ctx_text in ctx:
        msgs = [(0, "user", f"summarize my activity: {ctx_text}")]
        done = False
        b = 0  # fixed 4-slot seq base per turn (gaps where a branch
        # is absent — matches the plan's zero-shuffle state advance)
        for _ in range(_REACT_ITERS):
            if done:
                break
            history = "\n".join(
                f"{role.upper()}: {content}"
                for _, role, content in sorted(msgs))
            prompt = (f"## Context:\n{ctx_text}"
                      f"\n## Conversation History:\n{history}")
            resp = prov.generate_response(prompt)
            data = json.loads(resp.split("```\n")[1].split("\n```")[0])
            msgs.append((b + 1, "assistant", data["text"]))
            msgs.append((b + 2, "assistant", f"[Think] {data['think']}"))
            if "mem_op" in data:
                m = data["mem_op"]
                msgs.append((
                    b + 3, "assistant",
                    f"[Memory Operation Called] name: {m['name']}, "
                    f"result: stored {m['args']['content']}"))
            if "tool" in data:
                t = data["tool"]
                msgs.append((
                    b + 4, "assistant",
                    f"[Tool Called] name: {t['name']}, "
                    f"result: ok {t['args']['q']}"))
            # a tool call forces another iteration (client.py:289)
            done = data["finished"] and "tool" not in data
            b += 4
        out.extend((session, seq, role, content)
                   for seq, role, content in msgs)
    return sorted(out)


def test_unrolled_plan_matches_python_replica(spark):
    got = sorted(
        (r["session"], r["seq"], r["role"], r["content"])
        for r in QUERIES["react_loop_trace"](spark, SF_DIR).collect())
    want = _python_replica()
    assert got == want
