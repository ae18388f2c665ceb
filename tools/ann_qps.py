#!/usr/bin/env python
"""Concurrent-probe (QPS) measurement for the written ANN layouts
(VERDICT r11 #3): every probe number through r11 was a single-query
wall, but a deployed index serves many queries at once.

Runs N ∈ {1, 8, 32} concurrent probes — threads sharing one
SparkSession, each probing a DISTINCT vector (fresh jitter of corpus
rows, so distinct cell sets) — against the written IVF int8 layout and
the IVF-PQ ADC layout.  Records aggregate QPS and per-probe p50/p95.

The probe bodies mirror ``sim_ann_ivf_partitioned`` / ``sim_ann_ivfpq``
phase for phase (pruned code scan → ≤IVF_RERANK survivor collect →
exact re-rank from the source corpus) with the probe vector as a
parameter — the registry functions pin the module PROBE, which is right
for the oracle surface but measures one fixed cell set.  Layout build
and quantizer fits go through the real cached paths
(``_ivf_layout_dir`` / ``ivf_centroids`` / ``pq_codebooks``), so warm
probes hit the lock-free cache exactly as deployed
(similarity.py:_cached_layout).  Serial-equals-concurrent correctness
of the REAL registry probes is pytest-pinned separately
(tests/test_llm.py::test_ann_probes_concurrent_equal_serial).

    python tools/ann_qps.py [--sf-dir /tmp/sf1] [--probes 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOISE_STD = 0.1


def _probe_vectors(sf_dir: str, n: int):
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    base = np.array(t["embedding"].to_pylist()[:n], dtype=np.float64)
    rng = np.random.default_rng(11)
    return base + rng.normal(0.0, NOISE_STD, size=base.shape)


def _probe_cells_for(centroids, probe):
    from mysqldump_to_parquet_spark.llm import similarity as S

    nprobe = max(1, int(round(len(centroids) * S.IVF_SCAN_FRACTION)))
    p_hat = probe / np.linalg.norm(probe)
    d2 = (centroids * centroids).sum(axis=1) - 2.0 * (centroids @ p_hat)
    return [int(c) for c in np.argsort(d2)[:nprobe]], p_hat


def _rerank(spark, sf_dir, ids, probe):
    from pyspark.sql import functions as F

    from mysqldump_to_parquet_spark.catalog import load_table
    from mysqldump_to_parquet_spark.llm import similarity as S

    # ONE SQL string, not isin(list): py4j literal construction cost
    # ~3 s/probe with 4096 ids (r12 profile; same pushed-In plan)
    e = load_table(spark, sf_dir, "embeddings")
    e = (
        e.where(f"vec_id IN ({','.join(str(int(i)) for i in ids)})")
        if ids
        else e.where(F.lit(False))
    )
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pcol = F.array(*[F.lit(float(x)) for x in probe])
    return (
        e.select(
            "vec_id",
            F.round(S.cosine_expr(dbl, pcol), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )


def probe_ivf(spark, sf_dir, layout_df, centroids, probe):
    """sim_ann_ivf_partitioned's two phases, probe-parametric."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from mysqldump_to_parquet_spark.llm import similarity as S

    cells, p_hat = _probe_cells_for(centroids, probe)
    layout = layout_df.where(F.col("cell").isin(cells))
    dim = len(p_hat)

    @pandas_udf("double")
    def _code_cos(cs: pd.Series) -> pd.Series:
        valid, mat = S._masked_rows(cs, dim)
        norm = np.linalg.norm(mat, axis=1)
        cos = (mat @ p_hat) / np.where(norm > 0, norm, 1.0)
        out = np.full(len(cs), -2.0)
        out[valid] = np.where(norm > 0, cos, -2.0)
        return pd.Series(out)

    survivors = (
        layout.select("vec_id", _code_cos(F.col("code")).alias("acos"))
        .orderBy(F.desc("acos"), F.asc("vec_id"))
        .limit(S.IVF_RERANK)
        .collect()
    )
    return _rerank(spark, sf_dir, [r.vec_id for r in survivors], probe)


def probe_ivfpq(spark, sf_dir, layout_df, centroids, books, probe):
    """sim_ann_ivfpq's ADC scan + shared re-rank, probe-parametric."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from mysqldump_to_parquet_spark.llm import similarity as S

    cells, p_hat = _probe_cells_for(centroids, probe)
    layout = layout_df.where(F.col("cell").isin(cells))
    dsub = len(p_hat) // S.PQ_M
    lut = np.einsum("mkd,md->mk", books, p_hat.reshape(S.PQ_M, dsub))
    marange = np.arange(S.PQ_M)

    @pandas_udf("double")
    def _adc(codes: pd.Series) -> pd.Series:
        valid = codes.notna().to_numpy()
        out = np.full(len(codes), -2.0)
        if valid.any():
            mat = np.frombuffer(
                b"".join(codes[valid]), dtype=np.uint8
            ).reshape(-1, S.PQ_M)
            out[valid] = lut[marange[None, :], mat].sum(axis=1)
        return pd.Series(out)

    survivors = (
        layout.select("vec_id", _adc(F.col("pq_code")).alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(S.IVF_RERANK)
        .collect()
    )
    return _rerank(spark, sf_dir, [r.vec_id for r in survivors], probe)


def run_level(fn, probes, concurrency: int) -> dict:
    walls = [None] * len(probes)

    def one(i):
        t0 = time.perf_counter()
        fn(probes[i])
        walls[i] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if concurrency == 1:
        for i in range(len(probes)):
            one(i)
    else:
        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            list(pool.map(one, range(len(probes))))
    total = time.perf_counter() - t0
    ws = sorted(walls)
    return {
        "concurrency": concurrency,
        "probes": len(probes),
        "total_s": round(total, 2),
        "qps": round(len(probes) / total, 2),
        "p50_s": round(ws[len(ws) // 2], 2),
        "p95_s": round(ws[int(len(ws) * 0.95) - 1], 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--probes", type=int, default=32)
    ap.add_argument(
        "--levels", default="1,8,32", help="comma-separated concurrency levels"
    )
    args = ap.parse_args()

    from mysqldump_to_parquet_spark.llm import similarity as S
    from mysqldump_to_parquet_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="ann-qps", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    # build once + hold the file-index handle open (the r12 probe fix)
    layout = S._ivf_layout_df(spark, args.sf_dir)
    centroids = S.ivf_centroids(spark, args.sf_dir)
    books = S.pq_codebooks(spark, args.sf_dir)
    probes = _probe_vectors(args.sf_dir, args.probes)

    variants = {
        "ivf_int8": lambda p: probe_ivf(
            spark, args.sf_dir, layout, centroids, p
        ),
        "ivf_pq": lambda p: probe_ivfpq(
            spark, args.sf_dir, layout, centroids, books, p
        ),
    }
    for name, fn in variants.items():
        fn(probes[0])  # warm the code path (codegen, worker pool)
        for lvl in [int(x) for x in args.levels.split(",")]:
            rec = {"layout": name, "sf_dir": args.sf_dir}
            rec.update(run_level(fn, probes, lvl))
            print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
