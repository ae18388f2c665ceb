#!/usr/bin/env python
"""BPE merge-loop wall at realistic merge counts (VERDICT r15 #4).

The declared q_bpe_merges/q_bpe_apply run K=4 rounds (oracle-bound —
the DuckDB twin unrolls the same 4 CTEs); real tokenizers run tens of
thousands of rounds of the identical per-round shape.  The r15 doc
flagged the per-round corpus localCheckpoint cadence as untested beyond
K=4: if lineage or plan depth leaked round-over-round, the per-round
wall would GROW with r and the shape would not survive a real
vocabulary.  This tool mirrors ``bpe._learn``'s incremental loop
(same delta counting, same per-round checkpoint discipline; kept as a
measurement copy so the contract-bound module stays untouched) with a
configurable K and checkpoint cadence, and records per-round walls.

    python tools/bpe_k_sweep.py [--k 100] [--sf-dir /tmp/sf1]
                                [--checkpoint-every 1]

Prints one JSON line: total wall, per-round wall p50/p95/max, the
first/last-decile mean walls (flat ⇒ bounded lineage), and rounds
completed (vocabulary exhaustion breaks early).  ``--checkpoint-every
k`` leaves the corpus replace lazy for k-1 rounds before each
checkpoint — the knob the r15 doc asked to evaluate; the delta filter
then re-evaluates the stacked replaces, so >1 only pays if corpus
materialization dominates re-evaluation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mysqldump_to_parquet_spark.catalog import load_table  # noqa: E402
from mysqldump_to_parquet_spark.llm.bpe import (  # noqa: E402
    BPE_CLOSE,
    BPE_OPEN,
    _bracketed,
    _pairs_of,
)
from mysqldump_to_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--checkpoint-every", type=int, default=1)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="bpe-k-sweep", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, args.sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
        .select(
            F.expr(
                "array_join(transform(sequence(1, length(w)),"
                f" i -> '{BPE_OPEN}' || substr(w, i, 1) || '{BPE_CLOSE}'),"
                " '')"
            ).alias("sym")
        )
        .localCheckpoint()
    )
    counts = (
        _pairs_of(words)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )

    t_start = time.perf_counter()
    walls: list[float] = []
    cur = words
    lazy_depth = 0
    rounds_done = 0
    for r in range(1, args.k + 1):
        t0 = time.perf_counter()
        top = (
            counts.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0].cnt <= 0:
            break
        a, b = top[0].a, top[0].b
        pat, rep = _bracketed(a, b), _bracketed(a + b)
        affected = cur.where(F.col("sym").contains(pat)).localCheckpoint()
        replaced = affected.select(
            F.replace(F.col("sym"), F.lit(pat), F.lit(rep)).alias("sym")
        )
        delta = (
            _pairs_of(replaced)
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("d"))
            .unionByName(
                _pairs_of(affected)
                .groupBy("a", "b")
                .agg((-F.count(F.lit(1))).alias("d"))
            )
            .groupBy("a", "b")
            .agg(F.sum("d").alias("d"))
        )
        counts = (
            counts.join(delta, ["a", "b"], "full")
            .select(
                "a",
                "b",
                (
                    F.coalesce(F.col("cnt"), F.lit(0))
                    + F.coalesce(F.col("d"), F.lit(0))
                ).alias("cnt"),
            )
            .where(F.col("cnt") > 0)
            .localCheckpoint()
        )
        cur = cur.select(
            F.replace(F.col("sym"), F.lit(pat), F.lit(rep)).alias("sym")
        )
        lazy_depth += 1
        if lazy_depth >= args.checkpoint_every:
            cur = cur.localCheckpoint()
            lazy_depth = 0
        walls.append(time.perf_counter() - t0)
        rounds_done = r

    total = time.perf_counter() - t_start
    ws = sorted(walls)
    n = len(ws)
    dec = max(1, n // 10)
    out = {
        "metric": "bpe_k_sweep",
        "sf_dir": args.sf_dir,
        "k_requested": args.k,
        "rounds_done": rounds_done,
        "checkpoint_every": args.checkpoint_every,
        "total_s": round(total, 2),
        "round_p50_s": round(ws[n // 2], 3) if n else None,
        "round_p95_s": round(ws[int(n * 0.95)], 3) if n else None,
        "round_max_s": round(max(ws), 3) if n else None,
        # lineage-leak detector: mean wall of the first vs last decile
        # of rounds — flat ⇒ bounded plan depth round-over-round
        "first_decile_mean_s": round(sum(walls[:dec]) / dec, 3) if n else None,
        "last_decile_mean_s": round(sum(walls[-dec:]) / dec, 3) if n else None,
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
