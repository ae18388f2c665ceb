#!/usr/bin/env python
"""Regenerate bench.py's IDLE_FLOOR_SEC table — the per-query all-time
floors the band verdicts judge against (VERDICT r12 #1) — as the min
over every recorded BENCH_r*.json draw.  Run after a structural plan
change lowers a floor, or when a new query joins BENCH_QUERY_NAMES
(tests/test_tools.py pins that every benched query has a floor row).

    python tools/gen_floors.py [--write]

Floors only ever move DOWN across regenerations: a recorded draw is
evidence the engine hit that wall once; a higher later draw is
environment.  New queries with no BENCH history yet are seeded from
the floors already in bench.py (pass --seed name=sec to add one).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "# --- BEGIN GENERATED FLOORS (tools/gen_floors.py) ---"
END = "# --- END GENERATED FLOORS ---"


def compute_floors() -> dict[str, float]:
    import bench

    floors: dict[str, float] = dict(bench.IDLE_FLOOR_SEC)  # never raise
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            d = json.load(open(path))
        except (OSError, ValueError):
            continue
        qs = d.get("parsed", d).get("queries", {})
        for k, v in qs.items():
            if not isinstance(v, (int, float)):
                continue
            floors[k] = round(min(floors.get(k, float("inf")), v), 4)
    return floors


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument(
        "--seed",
        action="append",
        default=[],
        metavar="NAME=SEC",
        help="seed a floor for a query with no BENCH history yet",
    )
    args = ap.parse_args()

    floors = compute_floors()
    for s in args.seed:
        name, sec = s.split("=", 1)
        floors[name] = round(float(sec), 4)

    body = [BEGIN, "IDLE_FLOOR_SEC = {"]
    for k in sorted(floors):
        body.append(f'    "{k}": {floors[k]},')
    body += ["}", END]
    block = "\n".join(body)
    print(block)

    if args.write:
        path = os.path.join(REPO, "bench.py")
        text = open(path).read()
        pat = re.compile(
            re.escape(BEGIN) + ".*?" + re.escape(END), flags=re.S
        )
        assert pat.search(text), "floor markers missing from bench.py"
        open(path, "w").write(pat.sub(lambda m: block, text))
        print(f"# wrote {len(floors)} floors to bench.py", file=sys.stderr)


if __name__ == "__main__":
    main()
