"""Regenerate verification.GREEN from the driver's CORRECTNESS files.

Usage (start of each round, after reading the new CORRECTNESS_r{N}.json):

    python tools/update_green.py

Prints the union of all green names across every CORRECTNESS_r*.json in
the repo root, formatted as a Python frozenset literal to paste into
travel_data_pipeline_spark/verification.py, plus a summary of which
registered queries remain unverified (candidates for PRIORITY_HEAD).
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path, encoding="utf-8") as fh:
            data = json.load(fh)
        for name, row in data.items():
            if row.get("err") is None and (row.get("hash_match")
                                           or row.get("rows_match")):
                green.add(name)
        print(f"# {os.path.basename(path)}: cumulative green = {len(green)}")

    from travel_data_pipeline_spark import registry

    registered = list(registry.QUERIES)
    unverified = [n for n in registered if n not in green]
    stale = sorted(green - set(registered))

    print("\nGREEN: frozenset[str] = frozenset({")
    for name in sorted(green & set(registered)):
        print(f'    "{name}",')
    print("})")
    print(f"\n# {len(unverified)} registered queries with no green row "
          "(PRIORITY_HEAD candidates):")
    for n in unverified:
        print(f"#   {n}")
    if stale:
        print(f"# stale green names no longer registered: {stale}")


if __name__ == "__main__":
    main()
