#!/usr/bin/env python
"""Measure the streaming admission gate (VERDICT r15 task 5).

The gate (``admission_gate_stream``) had exactness tests but no
measured row.  This drains a 1 000-document arrival stream — jittered
copies of sf0.1 corpus vectors under external qids, ``--files``
parquet files at ``maxFilesPerTrigger=1`` so each file is one
micro-batch — against the WRITTEN sf0.1 IVF index, and records:

- per-micro-batch latency p50/p95/max (from StreamingQuery progress);
- bytes/files SELECTED by the layout scan per batch with cell pruning
  ON vs OFF (leaf FileSourceScan metrics on a representative batch —
  the pruning exists for precisely this path), plus the join wall
  both ways;
- checkpoint growth (the gate keeps NO operator state — foreachBatch
  against an external index — so the checkpoint is offsets/commits
  logs only; this records that claim as bytes) and sink growth;
- output integrity: every arrival audited, duplicate split at τ.

Usage: python tools/gate_soak.py [--docs 1000] [--files 20]
Prints one JSON line; paste into SCALING.md beside the other soaks.
Timing row — run on an idle host (steal < 0.5 %).

``--ingest`` (r15) measures the FULL gated-ingest loop instead
(``gated_ingest_stream``): the corpus is COPIED to a tempdir (the
ingest loop writes to its primary store), τ=0.9 so the far-jitter half
is actually admitted, and each epoch lands its admissions in the
primary table and appends them into the index.  Extra fields report
primary/index growth, the post-drain staleness signal, and the same
per-batch latency percentiles for a direct gate-only vs gate+ingest
comparison (the pruning A/B is skipped — identical machinery either
way).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.stream_soak import _p95  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _dir_stats(d: str) -> dict:
    files = 0
    size = 0
    for root, _, fs in os.walk(d):
        for f in fs:
            if f.startswith("."):
                continue
            files += 1
            size += os.path.getsize(os.path.join(root, f))
    return {"files": files, "bytes": size}


def _scan_read(df) -> dict:
    """files/bytes SELECTED by the scan after partition pruning (leaf
    FileSourceScan metrics — the same technique the pruning pytest
    uses, plus the filesSize byte counter)."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    files = size = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numFiles"):
            files += m.apply("numFiles").value()
        if m.contains("filesSize"):
            size += m.apply("filesSize").value()
    return {"files": files, "bytes": size}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1000)
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--ingest", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mysqldump_to_parquet_spark.llm import similarity as S
    from mysqldump_to_parquet_spark.session import get_spark
    from mysqldump_to_parquet_spark.streaming.stream import (
        admission_gate_stream,
        gated_ingest_stream,
        read_query_stream,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="gate-soak", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- arrival fixture: jittered corpus vectors, external qids ----
    # half the arrivals are NEAR-duplicates of indexed vectors (small
    # jitter, should flag), half are far jitters (should pass) — the
    # realistic mixed arrival the gate exists to split
    base = str(tempfile.mkdtemp(prefix="gate_soak_"))
    qdir, out, ckpt = f"{base}/arrivals", f"{base}/flags", f"{base}/ckpt"
    corpus = SF_DIR
    if args.ingest:
        # the ingest loop WRITES to its corpus — soak a private copy
        corpus = f"{base}/corpus"
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").write.parquet(
            f"{corpus}/embeddings.parquet"
        )
    e = spark.read.parquet(f"{corpus}/embeddings.parquet")
    per_file = args.docs // args.files
    shift = 20_000_000_000

    def jitter(x, i, width):
        # per-DIMENSION hash jitter: wide jitter must destroy the
        # direction (a constant per-vector shift leaves cosine ≈ 1)
        h = F.pmod(
            F.hash(F.col("vec_id"), i, F.lit(42)), F.lit(100_000)
        )
        return (x + ((h / 100_000.0) - 0.5) * width).cast("double")

    src = e.limit(args.docs).select("vec_id", "embedding")
    src = src.withColumn(
        "near", (F.col("vec_id") % 2 == 0)
    ).select(
        (F.col("vec_id") + shift).alias("qid"),
        F.when(
            F.col("near"),
            F.transform(
                "embedding", lambda x, i: jitter(x, i, F.lit(0.001))
            ),
        ).otherwise(
            F.transform(
                "embedding", lambda x, i: jitter(x, i, F.lit(6.0))
            ),
        ).alias("qv"),
    )
    rows = src.collect()
    # chunk over ALL rows (review r15: range(files)*per_file silently
    # dropped the docs % files remainder, overstating docs_per_sec) —
    # the actual row count is also what docs_per_sec divides by below
    n_docs = len(rows)
    for i in range(0, n_docs, per_file):
        spark.createDataFrame(
            rows[i : i + per_file], "qid long, qv array<double>"
        ).coalesce(1).write.mode("append").parquet(qdir)

    # ---- build the index BEFORE the stream (deploy shape: the index
    # exists; batch latency must not absorb the one-time build) ----
    t0 = time.perf_counter()
    cells_dir = S._ivf_layout_dir(spark, corpus)
    build_s = round(time.perf_counter() - t0, 2)
    prim_before = e.count()
    idx_before = _dir_stats(cells_dir)

    # ---- drain ----
    t0 = time.perf_counter()
    if args.ingest:
        q = gated_ingest_stream(
            spark, corpus, read_query_stream(spark, qdir),
            out_dir=out, checkpoint_dir=ckpt, tau=0.9,
            query_name="ingest_soak",
        )
    else:
        q = admission_gate_stream(
            spark, corpus, read_query_stream(spark, qdir),
            out_dir=out, checkpoint_dir=ckpt, query_name="gate_soak",
        )
    q.processAllAvailable()
    drain_s = round(time.perf_counter() - t0, 2)
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()

    durations = sorted(
        p["batchDuration"] for p in progress
        if p.get("batchDuration") and p.get("numInputRows")
    )
    n = len(durations)

    flags = spark.read.parquet(out)
    audited = flags.count()
    dups = flags.where("is_dup").count()

    report = {
        "metric": (
            "gated_ingest_soak" if args.ingest else "admission_gate_soak"
        ),
        "sf_dir": SF_DIR,
        "docs": n_docs,
        "files": args.files,
        "index_build_s": build_s,
        "drain_s": drain_s,
        "micro_batches": n,
        "batch_ms_p50": durations[n // 2] if n else None,
        "batch_ms_p95": _p95(durations),
        "batch_ms_max": durations[-1] if n else None,
        "docs_per_sec": round(n_docs / drain_s, 1),
        "audited_rows": audited,
        "flagged_dup": dups,
        "checkpoint": _dir_stats(ckpt),
        "sink": _dir_stats(out),
        "cpus": cpus,
    }

    if args.ingest:
        prim_after = spark.read.parquet(
            f"{corpus}/embeddings.parquet"
        ).count()
        idx_after = _dir_stats(cells_dir)
        st = S.ivf_index_staleness(spark, corpus)
        report.update(
            {
                "admitted": audited - dups,
                "primary_rows_added": prim_after - prim_before,
                "index_files_added": idx_after["files"]
                - idx_before["files"],
                "index_bytes_added": idx_after["bytes"]
                - idx_before["bytes"],
                "staleness": st,
            }
        )
    else:
        # ---- pruning on/off on one representative arrival batch ----
        batch = spark.read.parquet(qdir).limit(per_file)
        routed = S._knn_route_queries(spark, corpus, batch)
        cells = S._knn_batch_cells(routed)
        layout = S._ivf_layout_df(spark, corpus).select(
            "cell", "vec_id", "code"
        )
        read_full = _scan_read(layout)
        read_pruned = _scan_read(S._prune_layout_to_cells(layout, cells))

        def join_wall(prune: bool) -> float:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                S.ivf_knn_join(
                    spark, corpus, batch, k=1, exclude_self=False,
                    prune_cells=prune,
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return round(best, 4)

        report.update(
            {
                "cells_probed_per_batch": len(cells),
                "cells_total": len(S.ivf_centroids(spark, corpus)),
                "layout_read_full": read_full,
                "layout_read_pruned": read_pruned,
                "join_wall_pruned_s": join_wall(True),
                "join_wall_unpruned_s": join_wall(False),
            }
        )

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
