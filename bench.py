#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion via a count-style action so the full
plan (scan → shuffle → agg/join/window) runs; results are not collected to
the driver.  A warmup pass on the smallest query amortizes JVM/codegen
startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysqldump_to_parquet_spark.session import get_spark  # noqa: E402

#: Headline queries (a representative slice of SURVEY.md §2.2 — scan-heavy
#: agg, shuffle join, broadcast join, window, top-k).
BENCH_QUERY_NAMES = [
    "q_agg_groupby",
    "q_join_inner",
    "q_join_broadcast",
    "q_win_rank",
    "q_topk_per_group",
    "q_agg_distinct",
    "q_sort_limit",
    "q_join_asof",
    "q_stream_tumbling",
    "q_udf_pandas_scalar",
    "q_dedup_exact",
    "q_dedup_near",
    "q_sim_topk",
    "q_text_stats",
    # the expensive tail (round-3): multi-self-join, n-gram equi-join
    # with a broadcast eval side, iterative graph rounds — so round-over-
    # round tracking covers the operators most likely to regress at scale
    "q_tpch_q21",
    "q_decontaminate",
    "q_pagerank",
    # the iterative tail (round-4): the three slowest operators in the
    # registry — frontier BFS, incremental BPE rounds, Lloyd k-means —
    # were previously bench-invisible, so a superlinear regression in
    # any checkpoint/persist discipline went unmeasured
    "q_graph_bfs",
    "q_bpe_merges",
    "q_kmeans",
    # round-5 scale primaries: day-grain cumulative uniques (replaces the
    # per-type window at scale) and the deterministic LSH candidate stage
    "q_win_running_distinct_daily",
    "q_dedup_near_candidates",
    # round-5b: token-span exact dedup — the heaviest new operator of the
    # round (two data-sized exchanges), kept regression-visible
    "q_dedup_substring",
    # round-6: one-pass Gram covariance (mapInPandas NumPy fold), the
    # sweep-line concurrency (delta pre-agg + calendar-bounded windows),
    # and SemDeDup-style cell-blocked semantic dedup (self-join + cosine)
    "q_embed_covariance",
    "q_interval_concurrency",
    "q_dedup_semantic",
    # round-15 (VERDICT r14 #7): the r13/r14 similarity surface —
    # distributed kNN join through the written IVF layout (fixture
    # batch, pruned small-batch path), batched multi-probe ANN, and
    # perceptual image dedup — had no round-over-round wall tracking;
    # exactly the operators most likely to regress silently next.
    # First reps pay the per-session layout build; min-of-7 records
    # the warm probe wall, which is the deploy-shape number.
    "q_sim_knn_join_ivf",
    "q_sim_ann_ivf_batch",
    "q_dedup_phash",
]


#: 1-min loadavg above which the host is considered externally loaded —
#: the same bar tools/idle_bench.py gates on.  Three rounds of bench
#: drift (r6–r8 kmeans/semdedup/interval numbers) were adjudicated as
#: host load only via a separate idle table; the gate makes each BENCH
#: file carry its own verdict (VERDICT r9 #7).
LOAD_GATE = 1.5

#: how long to wait for the host to go idle before running anyway
LOAD_GATE_WAIT_SEC = 90

#: samples per query.  r10's lesson: min-of-3 under an "ok" loadavg gate
#: still drew 11–27 % high on UNTOUCHED operators (mid-draw hypervisor
#: noise the 1-min loadavg cannot see); the idle-reference method
#: (tools/idle_bench.py, min-of-5) repeatedly landed in the 4.6–4.9 s
#: common-14 band.  Folding that method in makes the recorded BENCH
#: number self-adjudicating (VERDICT r10 #1).
REPS = 5

#: Per-query all-time floors (sec) at the driver's sf0.1 / 32-thread
#: configuration — the min over every recorded BENCH_r* draw, i.e.
#: the engine floor each query has demonstrably hit.  Two consecutive
#: rounds the RECORDED total overstated by ~35 % on untouched code
#: because the heavy tail had no confirm merge (VERDICT r12 #1); the
#: confirm now covers every query, and any session floor still landing
#: >BAND_TOLERANCE× its all-time floor gets a per-query ``band_verdict`` so a
#: contended host reads as "environment" in the JSON itself, not in a
#: post-hoc BASELINE.md table.  Regenerate after a structural plan
#: change: min over BENCH_r*.json 'queries' maps (see BASELINE.md idle
#: sections for the idle-draw provenance of the heavy-tail values).
# --- BEGIN GENERATED FLOORS (tools/gen_floors.py) ---
IDLE_FLOOR_SEC = {
    "q_agg_distinct": 0.2772,
    "q_agg_groupby": 0.3551,
    "q_bpe_merges": 3.9208,
    "q_decontaminate": 0.6853,
    "q_dedup_exact": 0.1592,
    "q_dedup_near": 0.581,
    "q_dedup_near_candidates": 0.3889,
    "q_dedup_phash": 0.9282,
    "q_dedup_semantic": 2.0303,
    "q_dedup_substring": 0.8734,
    "q_embed_covariance": 0.5279,
    "q_graph_bfs": 2.4191,
    "q_interval_concurrency": 0.4579,
    "q_join_asof": 0.3619,
    "q_join_broadcast": 0.3916,
    "q_join_inner": 0.2939,
    "q_kmeans": 1.7808,
    "q_pagerank": 0.91,
    "q_sim_ann_ivf_batch": 1.1879,
    "q_sim_knn_join_ivf": 1.8002,
    "q_sim_topk": 0.2277,
    "q_sort_limit": 0.1112,
    "q_stream_tumbling": 0.203,
    "q_text_stats": 0.2276,
    "q_topk_per_group": 0.4104,
    "q_tpch_q21": 0.8599,
    "q_udf_pandas_scalar": 0.3393,
    "q_win_rank": 0.3426,
    "q_win_running_distinct_daily": 0.1973,
}
# --- END GENERATED FLOORS ---

#: a session floor above this multiple of the all-time floor is
#: flagged.  The table holds all-time MINS, which sit ~10–25 % below
#: the BASELINE.md idle-band UPPERS the ">1.25× its idle band" rule
#: (VERDICT r12 #1) is phrased against — 1.5× an all-time min ≈ 1.25×
#: a band upper.  Calibrated on the r13 double-draw: at 1.25 an
#: ordinary elevated-steal draw flags 10–18 uniformly-inflated rows
#: (pure noise), at 1.5 only rows genuinely outside their band fire.
BAND_TOLERANCE = 1.5


def band_verdicts_for(timings: dict, sf: float) -> dict:
    """Queries whose session floor sits >BAND_TOLERANCE× the all-time
    floor — {} off the table's sf0.1 conditions (other scale factors
    have no recorded floor to judge against)."""
    if abs(sf - 0.1) > 1e-9:
        return {}
    out = {}
    for n, t in timings.items():
        floor = IDLE_FLOOR_SEC.get(n)
        if floor and t > BAND_TOLERANCE * floor:
            out[n] = {
                "floor": t,
                "all_time": floor,
                "ratio": round(t / floor, 2),
            }
    return out


def _load_gate() -> dict:
    """Record-and-annotate load gate: wait up to LOAD_GATE_WAIT_SEC for
    the 1-min loadavg to drop below LOAD_GATE, then run regardless —
    the driver's bench run must always produce a number; the verdict
    field says how much to trust it."""
    waited = 0.0
    load = os.getloadavg()[0]
    while load > LOAD_GATE and waited < LOAD_GATE_WAIT_SEC:
        time.sleep(5.0)
        waited += 5.0
        load = os.getloadavg()[0]
    return {
        "threshold": LOAD_GATE,
        "waited_sec": round(waited, 1),
        "loadavg_at_gate": round(load, 2),
        "verdict": "ok" if load <= LOAD_GATE else "loaded",
    }


def _cpu_counters() -> dict:
    """Steal and total jiffies from /proc/stat — the counter the loadavg
    gate cannot see: a hypervisor neighbour stealing cycles MID-draw
    shows up here as steal% even when this host's own runqueue is empty
    (the r10 drift signature).  Returns zeros off-Linux."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        return {"steal": vals[7] if len(vals) > 7 else 0, "total": sum(vals)}
    except (OSError, ValueError, IndexError):
        return {"steal": 0, "total": 0}


def _psi_cpu() -> dict:
    """CPU pressure-stall info (/proc/pressure/cpu, "some" line): avg10 %
    and the monotonically-increasing total stall µs.  total's delta over
    the bench is the direct measure of 'runnable but not running' time —
    contention evidence that survives even when avgs have decayed."""
    try:
        with open("/proc/pressure/cpu") as fh:
            for line in fh:
                if line.startswith("some"):
                    kv = dict(
                        p.split("=") for p in line.split()[1:] if "=" in p
                    )
                    return {
                        "avg10": float(kv.get("avg10", 0.0)),
                        "avg60": float(kv.get("avg60", 0.0)),
                        "total_us": int(kv.get("total", 0)),
                    }
    except (OSError, ValueError):
        pass
    return {"avg10": 0.0, "avg60": 0.0, "total_us": 0}


def _time_queries(registry, names, spark, sf_dir, reps) -> dict:
    """Per-query min-of-``reps`` wall times (each rep drives the full
    plan through a noop sink — nothing is collected)."""
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = registry[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    return timings


def main() -> None:
    gate = _load_gate()  # before Spark starts: external load only
    load_start = os.getloadavg()  # pre-Spark: external load, falsifiable
    cpu0, psi0 = _cpu_counters(), _psi_cpu()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark(
        app_name="mtps-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    import __spark_entry__ as entrypoint

    registry = entrypoint.queries()
    names = [n for n in BENCH_QUERY_NAMES if n in registry]

    # Warmup: run the first query once to pay JVM + codegen startup.
    registry[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings = _time_queries(registry, names, spark, sf_dir, REPS)
    common = names[: min(14, len(names))]
    common_total = round(sum(timings[n] for n in common), 4)

    # Same-session idle confirm (VERDICT r10 #1, extended to EVERY query
    # r13 after two consecutive rounds where the heavy tail — outside
    # the old common-14-only merge — absorbed ~11 s of pure host
    # contention into the recorded total, VERDICT r12 #1): re-time the
    # full set min-of-2 immediately after the main pass and record the
    # common-14 delta (pass-vs-pass, BEFORE the merge below; kept on the
    # stable-since-r1 subset so the stability signal stays comparable
    # across rounds).  A small |delta| says the draw was stable
    # end-to-end; a large positive one flags mid-draw contention the
    # loadavg gate missed; a large NEGATIVE one means the MAIN pass was
    # the contended one — adjudication lives IN the JSON.
    confirm = _time_queries(registry, names, spark, sf_dir, 2)
    confirm_common = round(sum(confirm[n] for n in common), 4)
    delta_pct = round(
        100.0 * (confirm_common - common_total) / common_total, 1
    ) if common_total else 0.0
    # The recorded numbers are SESSION FLOORS for every query (min-of-7:
    # 5 main + 2 confirm) — the headline is the engine's floor
    # regardless of which pass the noise hit; the delta above still
    # reports pass stability.
    for n in names:
        timings[n] = min(timings[n], confirm[n])
    total = round(sum(timings.values()), 4)
    common_total = round(sum(timings[n] for n in common), 4)

    # Per-query band verdicts vs the all-time floor table — only where
    # the table's conditions hold (the driver's sf0.1 configuration).
    # "high" floors on UNTOUCHED code mean environment beat min-of-7
    # samples; on touched code, a regression.  Either way the flag is
    # in the recorded JSON, not a post-hoc adjudication.
    band_verdicts = band_verdicts_for(timings, sf)

    cpu1, psi1 = _cpu_counters(), _psi_cpu()
    dt = max(1, cpu1["total"] - cpu0["total"])
    steal_pct = round(100.0 * (cpu1["steal"] - cpu0["steal"]) / dt, 3)

    # Settle-and-redraw on a contended window (VERDICT r14 perf note:
    # every recorded-margin scare so far was hypervisor steal, and the
    # floors under it were fine).  When the draw's own steal% exceeds
    # 1.5 — the level at which r12/r14 recorded 10–30 % uniform
    # inflation — wait out the neighbour and take one more min-of-2
    # pass, merging floors.  The JSON records both steal readings, so
    # the adjudication ("the redraw window was cleaner and the floors
    # dropped") is in the instrument, not a post-hoc story.
    redraw = None
    if steal_pct > 1.5:
        time.sleep(45)
        r_cpu0 = _cpu_counters()
        re_t = _time_queries(registry, names, spark, sf_dir, 2)
        r_cpu1 = _cpu_counters()
        r_dt = max(1, r_cpu1["total"] - r_cpu0["total"])
        redraw = {
            "steal_pct": round(
                100.0 * (r_cpu1["steal"] - r_cpu0["steal"]) / r_dt, 3
            ),
            "common_14_redraw": round(sum(re_t[n] for n in common), 4),
        }
        for n in names:
            timings[n] = min(timings[n], re_t[n])
        total = round(sum(timings.values()), 4)
        common_total = round(sum(timings[n] for n in common), 4)
        band_verdicts = band_verdicts_for(timings, sf)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": REPS,
                # the stable-since-r1 first-14 subset every BENCH_r*.json
                # and idle reference is compared on — precomputed so the
                # cross-round read needs no arithmetic
                "common_14_total": common_total,
                # host load (1/5/15-min) at start (external load — the
                # falsifiability record; round-3's numbers were ~25%
                # inflated by a loaded host) and at end (includes the
                # bench's own 32-thread footprint)
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                # the gate's verdict: "ok" = host was externally quiet at
                # START; steal/psi/idle_confirm below adjudicate the
                # draw itself
                "load_gate": gate,
                # hypervisor-neighbour noise across the whole run: steal%
                # of all jiffies, and PSI 'some' CPU stall time.  psi
                # total_us delta includes the bench's own 32-thread
                # self-contention; compare round-over-round, not to zero.
                "steal_pct": steal_pct,
                "psi_cpu": {
                    "avg10_start": psi0["avg10"],
                    "avg10_end": psi1["avg10"],
                    "stall_sec": round(
                        (psi1["total_us"] - psi0["total_us"]) / 1e6, 2
                    ),
                },
                # same-session re-draw (full set; common-14 delta kept
                # as the cross-round stability signal): |delta| ≲ a few
                # % = the draw is trustworthy as recorded
                "idle_confirm": {
                    "common_14_recheck": confirm_common,
                    "delta_pct": delta_pct,
                    "loadavg": round(os.getloadavg()[0], 2),
                },
                # queries whose min-of-7 session floor still sits
                # >BAND_TOLERANCE× (1.5×, see the calibration note at
                # its definition) the all-time floor (empty = every
                # query at/near its known floor; populated =
                # environment or regression — see IDLE_FLOOR_SEC)
                "band_verdicts": band_verdicts,
                # present only when steal_pct > 1.5 forced a
                # settle-and-redraw pass (floors above already merged)
                "redraw": redraw,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
