#!/usr/bin/env python
"""Idle-host reference bench (VERDICT r7 task 2; r6 #5 / #2).

Rounds 5–7 showed a wrong-direction drift on the common-14 bench subset
(4.71 → 6.28 s) with loadavg_start ≈ 3.0 every round and *untouched*
operators moving ±50 % in both directions — the signature of external
host load, never falsified because no idle-host run was on record.  This
tool records that reference point: per-query **min-of-5** for the
common-14 + the unsettled ``q_graph_bfs``, refusing to run unless the
1-minute loadavg is below a threshold (default 1.5) so the number is a
property of the engine, not the neighbours.

Usage:  python tools/idle_bench.py [--max-load 1.5]
Prints one JSON line shaped like bench.py's, with ``metric:
"idle_reference_min5"``; paste the row into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysqldump_to_parquet_spark.session import get_spark  # noqa: E402

#: bench.py's original common subset (its first 14 names — stable since
#: round 1; imported, not copied, so a bench.py edit can never silently
#: desynchronize the idle reference from the BENCH_r*.json rows it is
#: compared against) + the operator whose wall-time the r6/r7 verdicts
#: flagged as unsettled.
from bench import BENCH_QUERY_NAMES  # noqa: E402

COMMON_14 = BENCH_QUERY_NAMES[:14]
#: The heavy tail (VERDICT r8 task 2): every bench operator whose
#: wall-time has drifted unexplained in any round now has an idle row,
#: so future drift is falsifiable without a re-investigation —
#: q_dedup_semantic / q_kmeans moved +44 % in r8 on untouched code with
#: no idle reference to compare against.
EXTRA = [
    "q_graph_bfs",
    "q_kmeans",
    "q_dedup_semantic",
    "q_bpe_merges",
    "q_pagerank",
    "q_dedup_substring",
    "q_interval_concurrency",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-load", type=float, default=1.5)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    load_start = os.getloadavg()
    if load_start[0] > args.max_load:
        print(
            f"refusing: loadavg {load_start[0]:.2f} > {args.max_load} — "
            "an idle-reference number taken on a busy host is the exact "
            "failure this tool exists to prevent",
            file=sys.stderr,
        )
        sys.exit(2)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="mtps-idle-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    import __spark_entry__ as entrypoint

    registry = entrypoint.queries()
    names = COMMON_14 + EXTRA
    registry[names[0]](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    common_total = round(sum(timings[n] for n in COMMON_14), 4)
    print(
        json.dumps(
            {
                "metric": "idle_reference_min5",
                "value": common_total,
                "unit": "sec",
                "queries": timings,
                # bench.py's tolerant parse: unparseable dirs → -1.0, not
                # a crash after all timed runs completed
                "sf": (
                    float(m.group(1))
                    if (m := re.search(r"sf([0-9.]+)", sf_dir))
                    else -1.0
                ),
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "cpus": cpus,
                "reps": args.reps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
