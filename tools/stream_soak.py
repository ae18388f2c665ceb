#!/usr/bin/env python
"""Stateful-streaming soak (VERDICT r12 #7): the TWS/streaming surface
was test-gated but had no measured row.  Drives the sessionize stream
(``stream.session_counts_stream``) and the stateful dedup stream over a
~10k-event fixture split into ~100 files (``maxFilesPerTrigger=1`` →
one micro-batch per file), and records what a deployment watches:
per-batch latency (p50/p95/max) and state-store size (rows/bytes peak
and end) from the query's progress events — plus exact stream ≡ batch
equality of the emitted sessions.

Fixture shape: bursts of BURST events 1 min apart; burst b belongs to
user ``b % N_USERS`` and starts at ``base + b hours``, so every burst
is one 30-min-gap session and event time is globally non-decreasing —
sessions finalize (and their state evicts) as the watermark sweeps
forward, which is the bounded-state behavior the soak exists to
demonstrate.  A sentinel event far past the end advances the final
watermark so EVERY real session is emitted: append-mode equality is
exact, not modulo-trailing-allowance.

    python tools/stream_soak.py [--events 10000] [--files 100]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_USERS = 25
BURST = 10  # events per session burst
EVENT_TYPES = ["view", "click", "purchase", "refund"]
#: µs — Jan 1 2026 00:00 UTC, an arbitrary fixed origin
BASE_US = 1_767_225_600_000_000
#: the sentinel flush event: one fake user far past every real session
#: end + watermark, so the final no-data micro-batch emits everything
SENTINEL_USER = 999_999


def gen_soak_fixture(
    out_dir: str,
    n_events: int,
    n_files: int,
    n_users: int = N_USERS,
    burst_len: int = BURST,
) -> None:
    """Deterministic burst-per-session event files (see module doc).

    ``n_users``/``burst_len`` widen the key space (VERDICT r15 task 6):
    the r14 TWS soak adjudicated its ~3 s/batch p50 as per-key socket
    round-trips on a 25-user toy and PREDICTED amortization at real
    cardinality — ``--users 10000 --burst 1`` makes every event its own
    burst/user, so a micro-batch touches ~100 distinct keys instead of
    ~10 and the prediction becomes measurable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    per_file = max(1, n_events // n_files)
    rows_ts, last_ts = [], BASE_US
    for i in range(n_events):
        burst, off = divmod(i, burst_len)
        ts = BASE_US + burst * 3_600_000_000 + off * 60_000_000
        last_ts = max(last_ts, ts)
        rows_ts.append(
            (
                i,
                ts,
                burst % n_users,
                EVENT_TYPES[i % len(EVENT_TYPES)],
                float(i % 100) / 4.0,
                "{}",
            )
        )
    # sentinel: 1 day past the last event — beyond gap + any allowance
    rows_ts.append(
        (n_events, last_ts + 86_400_000_000, SENTINEL_USER, "view", 0.0, "{}")
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    for f in range(0, len(rows_ts), per_file):
        chunk = rows_ts[f : f + per_file]
        tbl = pa.table(
            {
                "event_id": [r[0] for r in chunk],
                "ts": [r[1] for r in chunk],
                "user_id": [r[2] for r in chunk],
                "event_type": [r[3] for r in chunk],
                "value": [r[4] for r in chunk],
                "props": [r[5] for r in chunk],
            },
            schema=schema,
        )
        pq.write_table(tbl, os.path.join(out_dir, f"part-{f:07d}.parquet"))


def _p95(durations: list) -> float | None:
    """Ceiling-rank p95 (ADVICE r14): the old ``int(n*0.95)-1`` floor
    rank reported the p80 element at n=5 and index -1 (the MAX) at n=1
    — understating at exactly this soak's typical micro-batch counts."""
    n = len(durations)
    if not n:
        return None
    return durations[min(n - 1, math.ceil(0.95 * n) - 1)]


def _drain(q, spark, table: str, settle_s: float = 15.0):
    """Run to quiescence: processAllAvailable, then wait out the no-data
    micro-batch that emits sessions finalized by the LAST batch's
    watermark update (watermark advances at end-of-batch; emission
    happens in the following batch)."""
    q.processAllAvailable()
    last, t0 = -1, time.time()
    while time.time() - t0 < settle_s:
        n = spark.table(table).count()
        if n == last:
            break
        last = n
        time.sleep(0.5)
        q.processAllAvailable()


def run_soak(spark, fixture_dir: str, query_name: str) -> dict:
    """Stream the fixture through session_counts_stream; return metrics
    + exact-equality verdict vs the batch twin."""
    from pyspark.sql import functions as F

    from mysqldump_to_parquet_spark.streaming.stream import (
        read_event_stream,
        session_counts_stream,
    )

    events = read_event_stream(spark, fixture_dir)
    q = (
        session_counts_stream(events)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    _drain(q, spark, query_name)
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()

    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.table(query_name).collect()
        if r.user_id != SENTINEL_USER
    }
    batch_df = spark.read.parquet(fixture_dir).where(
        F.col("user_id") != SENTINEL_USER
    )
    batch = {
        (r.user_id, r["w"].start, r["w"].end): (r.n_events, r.sum_value)
        for r in batch_df.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .collect()
    }

    durations = sorted(
        p["batchDuration"] for p in progress if p.get("batchDuration")
    )
    state_rows = [
        so["numRowsTotal"]
        for p in progress
        for so in p.get("stateOperators", [])
    ]
    state_bytes = [
        so["memoryUsedBytes"]
        for p in progress
        for so in p.get("stateOperators", [])
    ]
    n = len(durations)
    return {
        "sessions_emitted": len(got),
        "sessions_batch": len(batch),
        "stream_equals_batch": got == batch,
        "micro_batches": n,
        "batch_ms_p50": durations[n // 2] if n else None,
        "batch_ms_p95": _p95(durations),
        "batch_ms_max": durations[-1] if n else None,
        "state_rows_peak": max(state_rows) if state_rows else None,
        "state_rows_end": state_rows[-1] if state_rows else None,
        "state_bytes_peak": max(state_bytes) if state_bytes else None,
    }


def run_soak_dedup(spark, fixture_dir: str, query_name: str) -> dict:
    """Soak the stateful dedup stream (dropDuplicatesWithinWatermark on
    (user_id, event_type)): state metrics + the two semantic checks a
    deployment cares about — the emitted set COVERS every distinct key
    (nothing lost), and no key repeats within any watermark-length
    window (the operator's actual contract; a key recurring after its
    state evicted legitimately re-emits, so global uniqueness is NOT
    the spec)."""
    from pyspark.sql import functions as F

    from mysqldump_to_parquet_spark.streaming.stream import (
        dedup_stream,
        read_event_stream,
    )

    events = read_event_stream(spark, fixture_dir)
    q = (
        dedup_stream(events, late_allowance="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    _drain(q, spark, query_name)
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()

    emitted = [
        (r.user_id, r.event_type, r.ts)
        for r in spark.table(query_name).collect()
        if r.user_id != SENTINEL_USER
    ]
    batch_keys = {
        (r.user_id, r.event_type)
        for r in spark.read.parquet(fixture_dir)
        .where(F.col("user_id") != SENTINEL_USER)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    emitted_keys = {(u, t) for u, t, _ in emitted}
    # no within-watermark repeat: for each key, successive emitted
    # event times must be > allowance apart
    allowance_us = 2 * 3600 * 1_000_000
    ok_spacing = True
    by_key: dict = {}
    for u, t, ts in emitted:
        by_key.setdefault((u, t), []).append(ts)
    for tss in by_key.values():
        tss = sorted(
            int(ts.timestamp() * 1_000_000) for ts in tss
        )
        for a, b in zip(tss, tss[1:]):
            if b - a <= allowance_us:
                ok_spacing = False

    durations = sorted(
        p["batchDuration"] for p in progress if p.get("batchDuration")
    )
    state_rows = [
        so["numRowsTotal"]
        for p in progress
        for so in p.get("stateOperators", [])
    ]
    n = len(durations)
    return {
        "emitted_rows": len(emitted),
        "distinct_keys": len(batch_keys),
        "covers_all_keys": emitted_keys == batch_keys,
        "no_repeat_within_watermark": ok_spacing,
        "micro_batches": n,
        "batch_ms_p50": durations[n // 2] if n else None,
        "batch_ms_p95": _p95(durations),
        "state_rows_peak": max(state_rows) if state_rows else None,
        "state_rows_end": state_rows[-1] if state_rows else None,
    }


def run_soak_tws(spark, fixture_dir: str, query_name: str) -> dict:
    """Soak the transformWithState processor (VERDICT r13 #4) — the one
    stateful surface without a measured row after sessionize and dedup
    got theirs in r13.  Same burst fixture, REAL cluster wiring:
    RocksDB state store + the JVM state server + ValueState/MapState
    socket round-trips per micro-batch.  Update mode emits a row per
    (user, batch); the LAST update per user (largest cumulative
    n_events) must equal the batch count/sum/countDistinct profile
    EXACTLY — plus the state metrics a deployment watches."""
    from pyspark.sql import functions as F

    from mysqldump_to_parquet_spark.streaming.stateful import (
        user_profile_tws,
    )
    from mysqldump_to_parquet_spark.streaming.stream import (
        read_event_stream,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    events = read_event_stream(spark, fixture_dir)
    q = (
        user_profile_tws(events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()

    # cumulative n_events makes "order by n_events, keep last" = the
    # final update per user (the same idiom the pytest pins)
    latest = {
        r.user_id: (r.n_events, r.total_value, r.n_types)
        for r in spark.table(query_name).orderBy("n_events").collect()
        if r.user_id != SENTINEL_USER
    }
    batch = {
        r.user_id: (r.n, r.total, r.nt)
        for r in spark.read.parquet(fixture_dir)
        .where(F.col("user_id") != SENTINEL_USER)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.countDistinct("event_type").alias("nt"),
        )
        .collect()
    }
    equal = set(latest) == set(batch) and all(
        latest[u][0] == n
        and abs(latest[u][1] - t) < 1e-6
        and latest[u][2] == nt
        for u, (n, t, nt) in batch.items()
    )

    durations = sorted(
        p["batchDuration"] for p in progress if p.get("batchDuration")
    )
    state_rows = [
        so["numRowsTotal"]
        for p in progress
        for so in p.get("stateOperators", [])
    ]
    state_bytes = [
        so["memoryUsedBytes"]
        for p in progress
        for so in p.get("stateOperators", [])
    ]
    n = len(durations)
    return {
        "users_profiled": len(latest),
        "stream_equals_batch": equal,
        "micro_batches": n,
        "batch_ms_p50": durations[n // 2] if n else None,
        "batch_ms_p95": _p95(durations),
        "batch_ms_max": durations[-1] if n else None,
        "state_rows_peak": max(state_rows) if state_rows else None,
        "state_rows_end": state_rows[-1] if state_rows else None,
        "state_bytes_peak": max(state_bytes) if state_bytes else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000)
    ap.add_argument("--files", type=int, default=100)
    ap.add_argument("--users", type=int, default=N_USERS)
    ap.add_argument("--burst", type=int, default=BURST)
    ap.add_argument(
        "--ops",
        default="sessionize,dedup,tws",
        help="comma list of soaks to run (the 10k-user TWS re-run "
        "doesn't need to drag the session/dedup soaks along)",
    )
    ap.add_argument("--fixture-dir", default=None)
    args = ap.parse_args()

    from mysqldump_to_parquet_spark.protoshim import ensure_protobuf
    from mysqldump_to_parquet_spark.session import get_spark

    # BEFORE the SparkSession (the conftest.py discipline): the TWS
    # protocol client runs in Python worker processes, which inherit
    # PYTHONPATH at JVM launch — activating the vendored shim after
    # get_spark() crashes the TWS driver worker on a protobuf-less
    # container ("driver worker exited unexpectedly")
    ensure_protobuf()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="stream-soak",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    ops = {o.strip() for o in args.ops.split(",") if o.strip()}
    fixture = args.fixture_dir or tempfile.mkdtemp(prefix="stream_soak_")
    gen_soak_fixture(
        fixture, args.events, args.files, args.users, args.burst
    )
    base = {
        "events": args.events,
        "files": args.files,
        "users": args.users,
        "burst": args.burst,
        "fixture": fixture,
    }
    if "sessionize" in ops:
        rec = dict(base, op="sessionize")
        rec.update(run_soak(spark, fixture, "soak_sessions"))
        print(json.dumps(rec))
    if "dedup" in ops:
        rec = dict(base, op="dedup")
        rec.update(run_soak_dedup(spark, fixture, "soak_dedup"))
        print(json.dumps(rec))
    if "tws" in ops:
        rec = dict(base, op="tws_profile")
        rec.update(run_soak_tws(spark, fixture, "soak_tws"))
        print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
