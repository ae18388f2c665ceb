#!/usr/bin/env python
"""Sweep the written-LSH OR-construction (L layout copies × flip width)
for the recall-vs-read-cost curve (VERDICT r9 #1).

The written layout's candidate set is granularity-independent by
construction (the exact ``sig IN`` predicate is pushed into the pruned
prefix directories), so recall and read cost are pure functions of
(L, flip) over the corpus signatures — this sweep computes them with
one NumPy pass per corpus, no Spark writes:

* **recall@10**   — |exact top-10 ∩ candidate top-10| / 10
* **cand_frac**   — fraction of corpus rows in the candidate set
* **read_frac**   — fraction of corpus ROWS READ per probe, summed over
  the L copies: each copy is partitioned on the top-p signature bits
  (p = ``_layout_prefix_bits(n)``), a probe reads every row of every
  probed prefix directory.  1.0 = one full corpus-copy's worth of bytes.
* **storage**     — L corpus copies on disk (the OR-construction price).

Usage: python tools/sweep_ann_layout.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysqldump_to_parquet_spark.llm import similarity as S  # noqa: E402


def corpus_state(sf_dir: str):
    """(vec_ids, (n, B) signature matrix, exact top-10 ids, prefix bits)."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    probe = np.array(S.PROBE)
    cos = (mat @ probe) / (
        np.linalg.norm(mat, axis=1) * np.linalg.norm(probe)
    )
    # exact top-10, ties by vec_id ascending (matches sim_topk ordering)
    order = np.lexsort((ids, -np.round(cos, 6)))
    exact = set(ids[order[:10]].tolist())

    planes = np.vstack([S._band_planes(b) for b in range(S.N_BANDS)])
    weights = (1 << np.arange(S.N_PLANES)).astype(np.int64)
    bits = (mat @ planes.T) >= 0
    sigs = bits.reshape(len(mat), S.N_BANDS, S.N_PLANES).astype(np.int64) @ weights
    return ids, cos, sigs, exact, S._layout_prefix_bits(len(ids))


def point(ids, cos, sigs, exact, pbits, L, flip):
    n = len(ids)
    shift = S.N_PLANES - pbits
    cand = np.zeros(n, dtype=bool)
    rows_read = 0
    for b in range(L):
        probe_sigs = np.array(S._probe_sigs_for_band(b, flip), dtype=np.int64)
        cand |= np.isin(sigs[:, b], probe_sigs)
        prefixes = np.unique(probe_sigs >> shift)
        rows_read += int(np.isin(sigs[:, b] >> shift, prefixes).sum())
    cidx = np.flatnonzero(cand)
    order = np.lexsort((ids[cidx], -np.round(cos[cidx], 6)))
    top = set(ids[cidx[order[:10]]].tolist())
    return {
        "L": L,
        "flip": flip,
        "recall": len(exact & top) / 10,
        "cand_frac": round(cand.mean(), 3),
        "read_frac": round(rows_read / n, 3),
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    for sf_dir in dirs:
        ids, cos, sigs, exact, pbits = corpus_state(sf_dir)
        print(f"\n== {sf_dir}  n={len(ids)}  prefix_bits={pbits} ==")
        print(f"{'L':>3} {'flip':>5} {'recall':>7} {'cand_frac':>10} "
              f"{'read_frac':>10} {'storage':>8}")
        for L in (2, 3, 4, 8):
            for flip in (9, 10, 11):
                r = point(ids, cos, sigs, exact, pbits, L, flip)
                print(f"{r['L']:>3} {r['flip']:>5} {r['recall']:>7.1f} "
                      f"{r['cand_frac']:>10.3f} {r['read_frac']:>10.3f} "
                      f"{L:>7}x")


if __name__ == "__main__":
    main()
