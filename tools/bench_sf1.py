#!/usr/bin/env python
"""sf1 compute-bound bench leg (VERDICT r15 #3).

At sf0.1 every bench query is fixed-overhead-bound: the r15 scaling
block measured low/high-core ratios of 0.51-1.09 (8 cores BEAT 32 on
total wall), so no optimization can be wall-clock-evidenced by the
sf0.1 bench.  This leg times the heaviest queries one decade up, where
data volume dominates the per-job floor, and is the before/after
instrument for the r16 optimization work.

    python tools/gen_sf1.py --out /tmp/sf1          # once per session
    SPARK_GRAFT_CPUS=32 python tools/bench_sf1.py   # high-core draw
    SPARK_GRAFT_CPUS=8  python tools/bench_sf1.py   # low-core draw

Contract mirrors bench.py where it can: master local[$SPARK_GRAFT_CPUS],
data dir from $SPARK_GRAFT_SF1_DIR (default /tmp/sf1 — a SEPARATE
variable so the driver's $SPARK_GRAFT_SF_DIR sf0.1 contract is
untouched), each query driven to completion through the noop sink,
min-of-REPS wall, ONE JSON line with the same
metric/value/unit/queries/sf keys.

One deliberate divergence, because it is a measurement-correctness fix
at this scale: EACH QUERY RUNS IN ITS OWN SUBPROCESS (fresh JVM).  In a
shared session at sf1, earlier queries' localCheckpoint RDDs and cached
blocks keep ~10× more heap live than at sf0.1 and later queries inherit
the GC pressure — measured: q_dedup_semantic min-of-3 drew 12.5 s after
bpe+bfs in one session vs 4.3 s warm in a fresh one, a 2.9× instrument
error on untouched code.  Per-query isolation is also the driver's own
cold-JVM shape.  Within a subprocess the reps share the session, so the
recorded min is the warm floor.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The heavy tail worth a decade of data (VERDICT r15 #3's list): the
#: iterative frames, the data-volume dedups, the IVF kNN join and the
#: multi-self-join suite query.
SF1_QUERY_NAMES = [
    "q_bpe_merges",
    "q_graph_bfs",
    "q_dedup_semantic",
    "q_kmeans",
    "q_pagerank",
    "q_dedup_phash",
    "q_sim_knn_join_ivf",
    "q_tpch_q21",
]

REPS = 3


def _run_one(name: str, sf_dir: str, cpus: int, reps: int) -> None:
    """Child mode: time one query min-of-``reps`` in a fresh session and
    print one JSON object."""
    from mysqldump_to_parquet_spark.session import get_spark

    spark = get_spark(
        app_name=f"mtps-bench-sf1-{name}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    import __spark_entry__ as entrypoint

    registry = entrypoint.queries()
    spark.sparkContext.setJobDescription(f"sf1-bench: {name}")
    best = float("inf")
    per_rep = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df = registry[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        per_rep.append(round(dt, 4))
        best = min(best, dt)
    print(json.dumps({"query": name, "sec": round(best, 4), "reps": per_rep}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", metavar="QUERY", help="(internal) child mode")
    ap.add_argument("--reps", type=int, default=REPS)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    if not os.path.isdir(sf_dir):
        raise SystemExit(
            f"{sf_dir} missing — run tools/gen_sf1.py --out {sf_dir} first"
        )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    if args.one:
        import __spark_entry__ as entrypoint

        if args.one not in entrypoint.queries():
            raise SystemExit(f"unknown query: {args.one}")
        _run_one(args.one, sf_dir, cpus, args.reps)
        return

    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1).rstrip(".")) if m else 1.0
    load0 = [round(x, 2) for x in os.getloadavg()]
    timings: dict[str, float] = {}
    rep_detail: dict[str, list] = {}
    for name in SF1_QUERY_NAMES:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             "--reps", str(args.reps)],
            capture_output=True,
            text=True,
            check=True,
        )
        row = json.loads(out.stdout.strip().splitlines()[-1])
        timings[name] = row["sec"]
        rep_detail[name] = row["reps"]

    print(
        json.dumps(
            {
                "metric": "sf1_heavy_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": args.reps,
                "rep_detail": rep_detail,
                "cpus": cpus,
                "loadavg_start": load0,
            }
        )
    )


if __name__ == "__main__":
    main()
