#!/usr/bin/env python
"""Build the next round's driver-budget rotation (registry.CORE_FIRST).

The external driver hash-checks roughly the FIRST 50 registry entries
each round, so the budget must rotate onto whatever still lacks a
driver verdict. This tool reads every recorded CORRECTNESS_r*.json and
prints, in priority order:

1. oracle-backed queries that have NEVER been inside a driver window
   (no verdict in any round) — these take the front slots;
2. queries whose LAST driver verdict predates a change to their module
   (not detectable here — list them by hand from git log);
3. ever-failed queries (should be empty; any entry here is a bug).

Usage: python tools/rotate_budget.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pulsar_project_spark.registry import ORACLES, QUERIES

    seen: dict[str, bool] = {}  # name -> ever fully green in a driver round
    rounds = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_r*.json")))
    for path in rounds:
        with open(path) as fh:
            data = json.load(fh)
        for name, v in data.items():
            green = bool(v.get("rows_match")) and bool(
                v.get("schema_match", True)) and bool(v.get("hash_match", True))
            seen[name] = seen.get(name, False) or green

    oracle_backed = [n for n in QUERIES if n in ORACLES]
    never = [n for n in oracle_backed if n not in seen]
    failed = [n for n, g in seen.items() if not g and n in ORACLES]
    green = [n for n, g in seen.items() if g]

    print(f"rounds read: {[os.path.basename(p) for p in rounds]}")
    print(f"oracle-backed declared: {len(oracle_backed)}; "
          f"cumulative driver-green: {len(green)}; "
          f"never driver-checked: {len(never)}; ever-failed: {len(failed)}")
    print("\n# never driver-checked (front of next CORE_FIRST, after the canary):")
    for n in never:
        print(f'    "{n}",')
    if failed:
        print("\n# EVER-FAILED (investigate before rotating):")
        for n in failed:
            print(f'    "{n}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
