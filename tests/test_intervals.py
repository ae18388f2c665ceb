"""Differential + plan-contract tests for operators/intervals.py."""

from __future__ import annotations

import datetime

import pyarrow.parquet as pq

from mysqldump_to_parquet_spark.operators.intervals import interval_concurrency

SF = "/root/testdata/sf0.001"


def _brute_force():
    """Open-interval count at every change date, computed row-at-a-time."""
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    keys = t.column("o_orderkey").to_pylist()
    dates = t.column("o_orderdate").to_pylist()
    deltas: dict[datetime.date, int] = {}
    for k, ts in zip(keys, dates):
        s = ts.date()
        e = s + datetime.timedelta(days=k % 7 + 1)
        deltas[s] = deltas.get(s, 0) + 1
        deltas[e] = deltas.get(e, 0) - 1
    out = {}
    run = 0
    for d in sorted(deltas):
        run += deltas[d]
        out[d] = run
    return out


def test_concurrency_matches_brute_force(spark):
    want = _brute_force()
    got = {r.d: r.open_cnt for r in interval_concurrency(spark, SF).collect()}
    assert got == want


def test_concurrency_final_count_zero(spark):
    """Every interval that opens also closes: the last change date must
    return to zero open intervals (sweep-line bookkeeping balances)."""
    rows = interval_concurrency(spark, SF).collect()
    assert rows[-1].open_cnt == 0
    assert all(r.open_cnt >= 0 for r in rows)


def test_open_interval_counts_randomized(spark):
    """Seeded randomized differential for the reusable sweep-line core:
    random intervals spanning year boundaries, same-day intervals,
    heavy duplicates — must match a per-date brute force exactly."""
    import random

    from mysqldump_to_parquet_spark.operators.intervals import (
        open_interval_counts,
    )

    rng = random.Random(20260814)
    base = datetime.date(2019, 12, 1)
    rows = []
    for _ in range(3000):
        s = base + datetime.timedelta(days=rng.randrange(0, 1500))
        e = s + datetime.timedelta(days=rng.randrange(0, 40))  # 0 = same-day
        rows.append((s, e))
    deltas: dict[datetime.date, int] = {}
    for s, e in rows:
        deltas[s] = deltas.get(s, 0) + 1
        deltas[e] = deltas.get(e, 0) - 1
    want, run = {}, 0
    for d in sorted(deltas):
        run += deltas[d]
        want[d] = run
    iv = spark.createDataFrame(rows, "s date, e date")
    got = {r.d: r.open_cnt for r in open_interval_counts(iv).collect()}
    assert got == want


def test_concurrency_plan_contract(spark):
    """No single-partition window (the whole point of the two-phase
    shape), one parquet scan (explode, not a union of two projections),
    and the cross-year offsets broadcast."""
    df = interval_concurrency(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # all consumers read the persisted net: every FileScan in the plan
    # string sits inside an InMemoryRelation reprint (toString re-embeds
    # the cached subtree at each consumer — once or twice depending on
    # whether the cache is already materialized), never as a live branch
    assert plan.count("InMemoryTableScan") >= 2
    lines = plan.splitlines()
    imr_indent = None
    for line in lines:
        col = line.find("+-")
        if "InMemoryRelation" in line:
            imr_indent = col
        elif "FileScan" in line:
            assert imr_indent is not None and col > imr_indent, line
        elif col != -1 and imr_indent is not None and col <= imr_indent:
            imr_indent = None  # left the cached subtree
    # the single cached subtree reads the file once via explode, not a
    # two-projection union
    assert "Generate explode" in plan
    assert "Union" not in plan
