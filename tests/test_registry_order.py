"""Registry-order regression gate.

The driver's per-round correctness check covers roughly the FIRST 50
registry entries. ``registry.CORE_FIRST`` pins exactly which 50 those
are. Round-5 rotation: slots 2-17 are the 16 oracle-backed queries with
no driver verdict after rounds 1-4, slots 18-19 the two queries new
this round (PNG codec, fixed-merge BPE twin), then re-certs of every
query whose module changed this round after its last verdict, then the
stalest (round-2-last) green queries. This test fails the build if a
new query ever displaces the pinned set.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as e
from pulsar_project_spark.registry import CORE_FIRST, NEVER_CHECKED_R5, NEW_R5

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_green() -> set[str]:
    """Cumulative driver-green set from every recorded round."""
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            for name, v in json.load(fh).items():
                if (v.get("rows_match") and v.get("schema_match", True)
                        and v.get("hash_match", True)):
                    green.add(name)
    return green


def test_core_fifty_lead_the_registry():
    names = list(e.queries())
    assert len(CORE_FIRST) == 50
    assert names[: len(CORE_FIRST)] == list(CORE_FIRST)


def test_core_fifty_all_have_oracles():
    # every driver-budget entry must get the STRONG check (hash vs
    # DuckDB), not the rows-only fallback
    oracles = e.oracle_sql()
    missing = [n for n in CORE_FIRST if n not in oracles]
    assert not missing, f"core entries without oracles: {missing}"


def test_canary_leads():
    # slot 1 is the flagship, green r1-r4 — if the driver ever reports
    # it red, the harness (not the engine) changed
    assert CORE_FIRST[0] == "simple_rag_topk"


def test_all_never_checked_queries_get_a_slot():
    # the POINT of the rotation: every oracle-backed declared query
    # ends the round with a driver verdict
    assert len(NEVER_CHECKED_R5) == 16
    missing = [n for n in NEVER_CHECKED_R5 if n not in CORE_FIRST]
    assert not missing, f"never-checked queries without a slot: {missing}"
    # ...and none of them was already green (else the slot is wasted)
    wasted = sorted(set(NEVER_CHECKED_R5) & _driver_green())
    assert not wasted, f"slot spent on already-green queries: {wasted}"


def test_round5_additions_get_slots():
    for n in NEW_R5:
        assert n in CORE_FIRST, f"round-5 addition without a slot: {n}"


def test_remaining_slots_are_deliberate_recerts():
    # every slot that isn't canary/never-checked/new must be a KNOWN
    # driver-green query (a re-cert), never an accidental stranger
    green = _driver_green()
    strangers = [
        n for n in CORE_FIRST[1:]
        if n not in NEVER_CHECKED_R5 and n not in NEW_R5 and n not in green
    ]
    assert not strangers, f"unexplained core entries: {strangers}"


def test_all_declared_queries_still_registered():
    # rotation must not LOSE anything: every driver-green name and
    # every CORE_FIRST name still resolves to a runnable query
    names = set(e.queries())
    for n in CORE_FIRST:
        assert n in names, f"core entry vanished from registry: {n}"
    lost = _driver_green() - names
    assert not lost, f"previously-green queries vanished: {lost}"
