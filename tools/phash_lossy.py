#!/usr/bin/env python
"""dHash robustness under the REAL lossy chain (VERDICT r15 task 4).

The r14 phash evidence was exact-by-construction: fixture noise (±5)
cannot flip a ±12-step cell comparison, and BMP/PNG/PPM are lossless
containers — so ``PHASH_HAMMING_MAX = 6`` was a constant, not a
measured knee.  This tool pushes a perturbed-duplicate family through
the repo's own lossy paths — ``encode_jpeg`` at the identity table
(q=8) and genuinely lossy flat tables (q=48/96/128, reconstruction
error ≤ q/16 per pixel), plus the nearest-neighbor ``resize`` path and
a jpeg→resize composition — and measures, per chain:

- the within-chain Hamming distribution of TRUE pairs (same group,
  independent noise) vs CROSS pairs (different base patterns);
- the same-doc Hamming vs the lossless control (the re-encoded-
  duplicate case the operator exists for);
- recall and false-positive rate at the deployed threshold, and the
  knee: the largest threshold with zero false positives vs the
  smallest threshold with full recall.

Geometry: one 144×128 grayscale image per doc — the production
fixture's 9×8 dHash grid rendered at 16 px/cell so every cell is one
constant-color MCU (the repo encoder's unit), with per-CELL SplitMix64
noise in ±5.  Per-cell noise is HARSHER than the production fixture's
per-pixel noise (which averages to ~0 per cell): the worst-case
adjacent-cell margin is 12 − 10 = 2 luma levels, so lossy error starts
flipping comparisons instead of being absorbed — exactly the regime a
threshold measurement needs.

Usage: python tools/phash_lossy.py [--groups 25] [--per-group 20]
Prints one JSON line; paste the table into SCALING.md / BASELINE.md.
No Spark session — this measures the hash + codec functions the
operator's mapInPandas stages call.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysqldump_to_parquet_spark.llm.multimodal import (  # noqa: E402
    PHASH_HAMMING_MAX,
    _phash_base_grid,
    _splitmix64_np,
    decode_image,
    decode_jpeg,
    dhash64,
    encode_bmp,
    encode_jpeg,
)
from mysqldump_to_parquet_spark.llm.multimodal import (  # noqa: E402
    resize_image_batch,
)

CELL = 16  # px per dHash cell == one constant-color MCU
W, H = 9 * CELL, 8 * CELL


def doc_cells(doc: int, groups: int) -> np.ndarray:
    """9×8 cell luminances: the doc's group grid + per-cell ±5 noise
    (SplitMix64 of the global cell index — every doc a different
    image, same construction discipline as _synth_phash_bmps)."""
    grid = np.array(_phash_base_grid(doc % groups), dtype=np.int64)
    idx = np.arange(72, dtype=np.uint64) + np.uint64(doc * 72)
    noise = (_splitmix64_np(idx) % np.uint64(11)).astype(np.int64) - 5
    return np.clip(grid + noise.reshape(8, 9), 0, 255)


def doc_pixel_bmp(doc: int, groups: int, amp: int = 5) -> bytes:
    """144×128 render with per-PIXEL ±amp noise — the production
    fixture's construction at 16 px/cell.  Used for the resize legs:
    nearest-neighbor sampling keeps INDIVIDUAL noisy pixels, so a
    downscaled copy's cell means carry more residual noise the harder
    the downscale (per-CELL noise would make resize trivially exact).
    At the production ±5 a flip is PROVABLY impossible at any resize
    (two cells differ by ≤ 10 < the 12 step); ±8 admits flips at
    extreme downscale, which is where the knee becomes measurable."""
    grid = np.array(_phash_base_grid(doc % groups), dtype=np.int64)
    lum = np.repeat(np.repeat(grid, CELL, axis=0), CELL, axis=1)
    idx = np.arange(H * W, dtype=np.uint64) + np.uint64(doc * H * W)
    span = np.uint64(2 * amp + 1)
    noise = (_splitmix64_np(idx) % span).astype(np.int64) - amp
    lum = np.clip(lum + noise.reshape(H, W), 0, 255).astype(np.uint8)
    return encode_bmp(W, H, np.repeat(lum[:, :, None], 3, axis=2).tobytes())


def bmp_of(cells: np.ndarray) -> bytes:
    lum = np.repeat(np.repeat(cells, CELL, axis=0), CELL, axis=1)
    return encode_bmp(W, H, np.repeat(
        lum.astype(np.uint8)[:, :, None], 3, axis=2
    ).tobytes())


def jpeg_hash(cells: np.ndarray, quant: int) -> int:
    mcus = [
        [(int(cells[my][mx]), 128, 128) for mx in range(9)]
        for my in range(8)
    ]
    data = encode_jpeg(W, H, mcus, quant=quant)
    w, h, planes = decode_jpeg(data)
    y = np.array(planes[0], dtype=np.uint8).reshape(h, w)
    return dhash64(w, h, np.repeat(y[:, :, None], 3, axis=2).tobytes())


def bmp_hash(payload: bytes) -> int:
    w, h, rgb = decode_image(payload)
    return dhash64(w, h, rgb)


def hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray((a ^ b).view(np.uint64))
    return np.unpackbits(x.view(np.uint8)).reshape(-1, 64).sum(axis=1)


_POP16 = np.unpackbits(
    np.arange(65536, dtype=np.uint16).view(np.uint8)
).reshape(-1, 16).sum(axis=1).astype(np.uint8)


def band_min_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-pair MINIMUM Hamming distance across the 4 16-bit bands —
    the operator's candidate condition is ``band_min_dist <= r`` where
    r is the band-probe radius (r=0 is the plain exact-band join; the
    verify threshold only sees BUCKETED pairs, so hash-level recall
    AND this condition together are the OPERATOR's recall).  Pigeonhole
    guarantees candidacy for every pair at Hamming ≤ 4·(r+1)−1."""
    au = np.ascontiguousarray(a).view(np.uint64)
    bu = np.ascontiguousarray(b).view(np.uint64)
    out = np.full(len(au), 255, dtype=np.uint8)
    for i in range(4):
        sh = np.uint64(16 * i)
        mask = np.uint64(0xFFFF)
        x = (((au >> sh) ^ (bu >> sh)) & mask).astype(np.uint16)
        np.minimum(out, _POP16[x], out=out)
    return out


def shares_band(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """True where a pair shares ≥1 band exactly (probe radius 0)."""
    return band_min_dist(a, b) == 0


def _jpeg_hash_task(arg) -> int:
    cells, quant = arg
    return jpeg_hash(cells, quant)


def _jpeg96_bmp_task(c: np.ndarray) -> bytes:
    mcus = [
        [(int(c[my][mx]), 128, 128) for mx in range(9)]
        for my in range(8)
    ]
    w, h, planes = decode_jpeg(encode_jpeg(W, H, mcus, quant=96))
    y = np.array(planes[0], dtype=np.uint8).reshape(h, w)
    return encode_bmp(w, h, np.repeat(y[:, :, None], 3, axis=2).tobytes())


def chain_stats(hashes: np.ndarray, docs: np.ndarray, groups: int,
                control: np.ndarray | None) -> dict:
    """Within-chain true/cross pair Hamming + same-doc drift vs the
    lossless control hash."""
    n = len(hashes)
    ii, jj = np.triu_indices(n, k=1)
    ham = hamming(hashes[ii], hashes[jj])
    bmd = band_min_dist(hashes[ii], hashes[jj])
    true_m = (docs[ii] % groups) == (docs[jj] % groups)
    t, c = ham[true_m], ham[~true_m]
    tb, cb = bmd[true_m], bmd[~true_m]
    thr = PHASH_HAMMING_MAX
    out = {
        "true_pairs": int(true_m.sum()),
        "true_ham_max": int(t.max()),
        "true_ham_mean": round(float(t.mean()), 3),
        "recall_at_thr": round(float((t <= thr).mean()), 4),
        "cross_ham_min": int(c.min()),
        "fp_at_thr": round(float((c <= thr).mean()), 6),
        "min_thr_full_recall": int(t.max()),
        "max_thr_zero_fp": int(c.min()) - 1,
    }
    # the OPERATOR's recall at band-probe radius r: a pair must ALSO
    # have some band within Hamming r to ever be a candidate (r=0 is
    # the plain exact-band join, guaranteed complete only ≤ Hamming 3;
    # pigeonhole guarantees ≤ 4·(r+1)−1).  cand_rate_cross is the cost
    # side of the same knob: the fraction of CROSS pairs the probe
    # radius turns into candidates the bit_count verify must reject.
    for r in (0, 1, 2):
        out[f"operator_recall_r{r}"] = round(
            float(((t <= thr) & (tb <= r)).mean()), 4
        )
        out[f"cand_rate_cross_r{r}"] = round(float((cb <= r).mean()), 6)
    if control is not None:
        drift = hamming(hashes, control)
        dbmd = band_min_dist(hashes, control)
        out["reencode_drift_max"] = int(drift.max())
        out["reencode_drift_mean"] = round(float(drift.mean()), 3)
        out["reencode_recall_at_thr"] = round(
            float((drift <= thr).mean()), 4
        )
        for r in (0, 1, 2):
            out[f"reencode_operator_recall_r{r}"] = round(
                float(((drift <= thr) & (dbmd <= r)).mean()), 4
            )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=25)
    ap.add_argument("--per-group", type=int, default=20)
    args = ap.parse_args()
    groups, per = args.groups, args.per_group
    docs = np.arange(groups * per)

    cells = [doc_cells(int(d), groups) for d in docs]
    bmps = [bmp_of(c) for c in cells]

    import multiprocessing as mp

    import pandas as pd

    chains: dict[str, np.ndarray] = {}
    chains["bmp_lossless"] = np.array(
        [bmp_hash(b) for b in bmps], dtype=np.int64
    )
    # the JPEG decoder is deliberately pure Python (it exists for
    # loud-error conformance, not speed) — fan the measurement out
    with mp.Pool(min(32, os.cpu_count() or 8)) as pool:
        # q=96 is RESONANT with the fixture's 12-step grid (quant/8 =
        # 12, exactly the step): quantization snaps every cell back to
        # the base grid and DENOISES — keep it in the ladder as the
        # documented artifact, and bracket it with non-resonant points
        for q in (8, 48, 72, 96, 112, 128):
            chains[f"jpeg_q{q}"] = np.array(
                pool.map(_jpeg_hash_task, [(c, q) for c in cells]),
                dtype=np.int64,
            )
        # the scraped-corpus composition: lossy re-encode → thumbnail
        jpeg96_bmps = pool.map(_jpeg96_bmp_task, cells)
    # resize legs run on the per-PIXEL-noise renders — nearest-neighbor
    # keeps individual noisy pixels, so this is the leg where downscale
    # actually erodes the per-cell averaging margin (at 9×8 each dHash
    # cell is ONE noisy pixel: margin 12−2·5 = 2, the stress point)
    pix_controls = {}
    for amp in (5, 8):
        pix_bmps = [doc_pixel_bmp(int(d), groups, amp) for d in docs]
        ctrl = np.array([bmp_hash(b) for b in pix_bmps], dtype=np.int64)
        pix_controls[amp] = ctrl
        chains[f"pixelnoise{amp}_lossless"] = ctrl
        for rw, rh in ((36, 32), (18, 16), (9, 8)):
            chains[f"resize{amp}_{rw}x{rh}"] = np.array(
                [
                    bmp_hash(b)
                    for b in resize_image_batch(
                        pd.Series(pix_bmps), rw, rh
                    )
                ],
                dtype=np.int64,
            )
    chains["jpeg_q96_resize_36x32"] = np.array(
        [
            bmp_hash(b)
            for b in resize_image_batch(pd.Series(jpeg96_bmps), 36, 32)
        ],
        dtype=np.int64,
    )

    assert (chains["jpeg_q8"] == chains["bmp_lossless"]).all(), (
        "q=8 must be the identity chain"
    )
    report = {}
    for name, h in chains.items():
        if "lossless" in name:
            ctrl = None
        elif name.startswith("resize"):
            amp = int(name.split("_")[0].removeprefix("resize"))
            ctrl = pix_controls[amp]
        else:
            ctrl = chains["bmp_lossless"]
        report[name] = chain_stats(h, docs, groups, ctrl)
    print(
        json.dumps(
            {
                "metric": "phash_lossy_chain",
                "groups": groups,
                "per_group": per,
                "threshold": PHASH_HAMMING_MAX,
                "cell_margin_worst": 2,
                "chains": report,
            }
        )
    )


if __name__ == "__main__":
    main()
