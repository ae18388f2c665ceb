#!/usr/bin/env python
"""kNN-join recall at the DISCRIMINATING geometry + broadcast crossover.

Two measurements the r13 kNN-join surface shipped without:

* ``--recall`` (VERDICT r13 #2): the join's 0.911 recall@3 was measured
  at 500 fixture rows; the sf1/sf10 decade rows measure WALL on
  replicated corpora whose bit-similar copies make recall trivial
  (BASELINE's own admission).  This mode runs ``ivf_knn_join`` and the
  dedup-against-index gate over the 1M-distinct-vector corpus
  (``tools/ann_fit_ablation.py --out /tmp/ann1m`` geometry: 500
  jittered copies, std 0.1 — genuinely distinct rows) with
  RANDOM-DIRECTION query batches (the adversarial probe kind every
  prior ANN recall number uses), scoring against a NumPy exact ground
  truth.  Reports recall@3 / recall@1 at the deployed nprobe and gate
  flag agreement at both the deployed DEDUP_INDEX_TAU and the
  median-split tau (the threshold where agreement is hardest — at the
  deployed tau the flags can be trivially uniform).

* ``--crossover`` (VERDICT r13 #8): ``broadcast_queries=False`` exists
  for query sets too large to broadcast, but nothing measured WHERE the
  flip pays.  This mode sweeps the query-batch size M (distributed
  hash-jittered corpus rows — no driver materialization) and records
  the wall of both forms through a noop sink, so a deployment has a
  crossover NUMBER, not a flag.

    python tools/knn_join_1m.py --recall [--queries 32]
    python tools/knn_join_1m.py --crossover [--sweep 32,256,2048,16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: query ids start far above any corpus vec_id, so exclude_self is a no-op
QID_BASE = 10_000_000_000


def random_direction_probes(n: int, dim: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def load_numpy(sf_dir: str):
    """(ids, unit rows) of the corpus — the exact-ground-truth side."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy()
    # flatten().to_numpy() stays in Arrow/NumPy — to_pylist() builds
    # 64M Python floats and costs minutes at 1M rows
    emb = t["embedding"].combine_chunks()
    dim = len(emb[0])
    mat = emb.flatten().to_numpy().astype(np.float64).reshape(-1, dim)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat / np.where(norms > 0, norms, 1.0)


def exact_topk(ids, unit, probes, k: int):
    """Per-probe exact top-k (id list, best cosine) — same rounding and
    tie order (cosine desc, vec_id asc) as the Spark join."""
    out = []
    for p in probes:
        cos = np.round(unit @ p, 6)
        order = np.lexsort((ids, -cos))[:k]
        out.append((ids[order].tolist(), float(cos[order[0]])))
    return out


def queries_df(spark, probes):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("qv", T.ArrayType(T.DoubleType())),
        ]
    )
    rows = [
        (QID_BASE + i, [float(x) for x in p]) for i, p in enumerate(probes)
    ]
    return spark.createDataFrame(rows, schema)


def run_recall(spark, sf_dir: str, n_queries: int, k: int) -> dict:
    from mysqldump_to_parquet_spark.llm import similarity as S

    ids, unit = load_numpy(sf_dir)
    probes = random_direction_probes(n_queries, unit.shape[1])
    exact = exact_topk(ids, unit, probes, k)

    q = queries_df(spark, probes)
    t0 = time.perf_counter()
    got = S.ivf_knn_join(spark, sf_dir, q, k=k).collect()
    wall = time.perf_counter() - t0

    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.qid - QID_BASE, []).append((r.vec_id, r.cosine))
    hits = hits1 = 0
    ivf_top1 = {}
    for i, (ex_ids, _best) in enumerate(exact):
        g = by_q.get(i, [])
        hits += len(set(ex_ids) & {v for v, _ in g})
        if g and g[0][0] == ex_ids[0]:
            hits1 += 1
        ivf_top1[i] = g[0][1] if g else -2.0

    # gate flag agreement: deployed tau + the median-split tau (half
    # the exact flags true — where a missed neighbor is LIKELIEST to
    # flip a flag; agreement at a tau far from the cosine distribution
    # is trivially 1.0)
    exact_best = np.array([b for _, b in exact])
    taus = {
        "deployed": S.DEDUP_INDEX_TAU,
        "median_split": float(np.median(exact_best)),
    }
    agreement = {}
    for name, tau in taus.items():
        agree = sum(
            (exact_best[i] >= tau) == (ivf_top1[i] >= tau)
            for i in range(n_queries)
        )
        agreement[name] = {
            "tau": round(tau, 4),
            "agree": int(agree),
            "of": n_queries,
        }
    return {
        "mode": "recall",
        "corpus_rows": int(len(ids)),
        "queries": n_queries,
        "k": k,
        "recall_at_k": round(hits / (k * n_queries), 4),
        "recall_at_1": round(hits1 / n_queries, 4),
        "exact_top1_cos_min_med_max": [
            round(float(f(exact_best)), 4)
            for f in (np.min, np.median, np.max)
        ],
        "gate_flag_agreement": agreement,
        "join_wall_s": round(wall, 2),
    }


def jittered_queries(spark, sf_dir: str, m: int):
    """M distributed query rows: hash-jittered corpus rows (distinct
    cell routes, no driver-side materialization — the shape a real
    admission batch arrives in)."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    idx = spark.range(m).withColumnRenamed("id", "qidx")
    src = e.select(
        F.col("vec_id").alias("src_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("src_v"),
    ).withColumn("join_key", F.col("src_id"))
    width = 0.1 * (12.0 ** 0.5)

    def jitter(x, i):
        h = F.pmod(
            F.hash(F.col("qidx"), i, F.lit(17)), F.lit(100_000)
        )
        return x + ((h / 100_000.0) - 0.5) * width

    return (
        idx.withColumn("join_key", F.col("qidx") % n)
        .join(src, "join_key")
        .select(
            (F.col("qidx") + QID_BASE).alias("qid"),
            F.transform("src_v", jitter).alias("qv"),
        )
    )


def run_crossover(spark, sf_dir: str, sweep: list[int], k: int) -> list:
    """Both arms run with prune_cells=False so the sweep isolates the
    JOIN STRATEGY (hint vs AQE choice) — a jittered batch's probed-cell
    union covers ~every cell by m≈8, so pruning is a pure pre-job cost
    here and measuring it would conflate two variables.  Both forms are
    warmed on a 2-query batch before any timing (codegen + Python
    worker pool)."""
    from mysqldump_to_parquet_spark.llm import similarity as S

    warm = jittered_queries(spark, sf_dir, 2).persist()
    warm.count()
    for bq in (True, False):
        S.ivf_knn_join(
            spark, sf_dir, warm, k=k,
            broadcast_queries=bq, prune_cells=False,
        ).write.format("noop").mode("overwrite").save()
    warm.unpersist()

    out = []
    for m in sweep:
        q = jittered_queries(spark, sf_dir, m)
        q.persist().count()  # build queries once, outside both timings
        rec = {"mode": "crossover", "m": m}
        for label, bq in (("broadcast", True), ("shuffle", False)):
            t0 = time.perf_counter()
            S.ivf_knn_join(
                spark, sf_dir, q, k=k,
                broadcast_queries=bq, prune_cells=False,
            ).write.format("noop").mode("overwrite").save()
            rec[f"{label}_s"] = round(time.perf_counter() - t0, 2)
        q.unpersist()
        rec["winner"] = (
            "broadcast" if rec["broadcast_s"] <= rec["shuffle_s"] else "shuffle"
        )
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/ann1m")
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--recall", action="store_true")
    ap.add_argument("--crossover", action="store_true")
    # the routed broadcast side is M×nprobe rows (≈1000 cells/query at
    # a 4000-cell grid), so the hinted build side grows ~550 B × 1000
    # per query — the sweep spans hundreds of MB of broadcast by M=2048
    ap.add_argument("--sweep", default="32,128,512,2048")
    args = ap.parse_args()

    from mysqldump_to_parquet_spark.llm import similarity as S
    from mysqldump_to_parquet_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="knn-join-1m",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # build once + hold the handles open (the r12 probe discipline)
    S._ivf_layout_df(spark, args.sf_dir)
    S.ivf_centroids(spark, args.sf_dir)

    if args.recall:
        print(
            json.dumps(
                run_recall(spark, args.sf_dir, args.queries, args.k)
            ),
            flush=True,
        )
    if args.crossover:
        run_crossover(
            spark, args.sf_dir, [int(x) for x in args.sweep.split(",")],
            args.k,
        )
    spark.stop()


if __name__ == "__main__":
    main()
