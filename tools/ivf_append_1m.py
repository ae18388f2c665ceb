#!/usr/bin/env python
"""Incremental IVF append at the 1M-distinct-vector geometry (r15).

``ivf_index_append`` ships with fixture-scale pytest pins (append ≡
from-scratch rebuild under the same quantizer, file immutability, skew
refit trigger).  This measures the SCALE story at the same 1M corpus
every other ANN number uses (``tools/ann_fit_ablation.py --out
/tmp/ann1m``):

1. build the layout on the corpus MINUS a ``--slice-mod`` id slice
   (1 % at the default 100 — a realistic admitted-batch/index ratio);
2. land the slice in the primary store, then time ``ivf_index_append``
   (encode + route + per-cell file appends + cache re-stamp);
3. verify the appended rows are IMMEDIATELY probe-visible (self-kNN at
   k=1 → cosine 1.0) and that kNN-join recall@3 for random-direction
   probes against the NumPy exact ground truth of the UNION matches
   the corpus-wide recall record (1.0 at this geometry, BASELINE r14);
4. report the staleness signal at the 1 % uniform append.

    python tools/ivf_append_1m.py [--corpus /tmp/ann1m] [--slice-mod 100]

Run in the background WITHOUT a timeout wrapper (the layout build is
~8–10 min and the tempdir is per-process).  Wall numbers want an idle
host; recall/visibility are load-independent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.knn_join_1m import QID_BASE, random_direction_probes  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/ann1m")
    ap.add_argument("--slice-mod", type=int, default=100)
    ap.add_argument("--probes", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mysqldump_to_parquet_spark.llm import similarity as S
    from mysqldump_to_parquet_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="ivf-append-1m", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="ivf_append_1m_")
    e = spark.read.parquet(f"{args.corpus}/embeddings.parquet")
    held = e.where(F.col("vec_id") % args.slice_mod == 0)
    spine = e.where(F.col("vec_id") % args.slice_mod != 0)
    t0 = time.perf_counter()
    spine.write.parquet(f"{root}/embeddings.parquet")
    spine_s = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    cells_dir = S._ivf_layout_dir(spark, root)
    build_s = round(time.perf_counter() - t0, 1)

    def count_files(d):
        return sum(len(fs) for _, _, fs in os.walk(d))

    files_before = count_files(cells_dir)

    held.write.mode("append").parquet(f"{root}/embeddings.parquet")
    batch = held.select("vec_id", "embedding")
    n_held = batch.count()
    t0 = time.perf_counter()
    res = S.ivf_index_append(spark, root, batch)
    append_s = round(time.perf_counter() - t0, 1)

    # appended rows probe-visible immediately: self-kNN at k=1
    probe_self = held.limit(64).select(
        F.col("vec_id").alias("qid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    got = S.ivf_knn_join(
        spark, root, probe_self, k=1, exclude_self=False
    ).collect()
    visible = sum(
        1 for r in got if r.vec_id == r.qid and r.cosine == 1.0
    )

    # recall@3 of random-direction probes vs NumPy exact over the UNION
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{root}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy()
    dim = 64
    mat = (
        t["embedding"].combine_chunks().flatten().to_numpy()
        .reshape(-1, dim)
    )
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    probes = random_direction_probes(args.probes, dim)
    q = spark.createDataFrame(
        [
            (QID_BASE + i, [float(x) for x in probes[i]])
            for i in range(args.probes)
        ],
        "qid long, qv array<double>",
    )
    t0 = time.perf_counter()
    got = S.ivf_knn_join(spark, root, q, k=3).collect()
    probe_s = round(time.perf_counter() - t0, 1)
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.qid - QID_BASE, []).append(r.vec_id)
    hits = 0
    for i in range(args.probes):
        cos = np.round(unit @ probes[i], 6)
        exact = set(ids[np.lexsort((ids, -cos))[:3]].tolist())
        hits += len(exact & set(by_q.get(i, [])))

    print(
        json.dumps(
            {
                "metric": "ivf_append_1m",
                "corpus_rows": int(len(ids)),
                "appended_rows": res["appended_rows"],
                "spine_write_s": spine_s,
                "layout_build_s": build_s,
                "append_s": append_s,
                "append_rows_per_s": round(n_held / append_s, 0),
                "new_part_files": count_files(cells_dir) - files_before,
                "self_visible": f"{visible}/64",
                "recall_at_3": round(hits / (3 * args.probes), 4),
                "probe_wall_s": probe_s,
                "staleness": res["staleness"],
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
