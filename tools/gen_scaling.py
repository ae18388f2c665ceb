#!/usr/bin/env python
"""Regenerate SCALING.md: headline-operator wall time across the three
fixture scale factors (sf0.001 → sf0.01 → sf0.1, 100× data end to end),
min-of-3 per point on local[32].

    python tools/gen_scaling.py

A scalable plan should grow wall time far slower than data until the
cores saturate (fixed job overhead dominates small inputs), then
approach linear.  Superlinear growth flags a plan that would not survive
the next 100×.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q_agg_groupby",
    "q_join_inner",
    "q_join_broadcast",
    "q_win_rank",
    "q_topk_per_group",
    "q_join_asof",
    "q_dedup_exact",
    "q_dedup_near",
    "q_sim_topk",
    "q_text_stats",
    "q_top_terms",
    "q_split_hash",
    "q_pack_sequences",
    "q_resample_locf",
    "q_decontaminate",
    "q_multimodal_frames",
    "q_join_interval",
    "q_entropy",
    "q_anomaly_mad",
    "q_tpch_q21",
    "q_tpch_q9",
    "q_dedup_chunks",
    "q_source_overlap",
    "q_sample_mixture",
    # round-3 additions
    "q_pagerank",
    "q_multimodal_decode",
    "q_unigram_logprob",
    "q_chunk_tokens",
    "q_agg_histogram_approx",
    "q_pii_redact",
    "q_dedup_url",
    "q_kmeans",
    "q_embed_quantize",
    "q_bm25",
    "q_graph_bfs",
    "q_skyline",
    "q_time_rollup",
    "q_sample_weighted",
    "q_agg_mode",
    "q_win_rolling_corr",
    "q_event_transitions",
    "q_ab_test",
    "q_fn_geo",
    "q_fn_url",
    "q_win_period_over_period",
    "q_win_running_distinct",
    "q_streaks",
    "q_match_pattern",
    "q_oov_rate",
    "q_join_spatial",
    "q_agg_weighted_median",
    "q_agg_weighted_median_approx",
    "q_multimodal_audio",
    "q_multimodal_video",
    "q_multimodal_resize",
    "q_heavy_hitters",
    "q_cdc_apply",
    "q_split_drift",
    "q_bpe_merges",
    "q_attribution_channels",
]

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    from mysqldump_to_parquet_spark.session import get_spark

    import __spark_entry__ as entrypoint

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="gen-scaling", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrypoint.queries()

    # warmup: pay JVM + codegen startup outside the measurements
    registry[QUERIES[0]](spark, "/root/testdata/sf0.01").write.format(
        "noop"
    ).mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        results[name] = {}
        for sf in SFS:
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                registry[name](spark, f"/root/testdata/sf{sf}").write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name][sf] = best

    lines = [
        "# SCALING — wall time vs data size",
        "",
        f"min-of-3 per point, local[{cpus}], clearCache between points.",
        "Regenerate with `python tools/gen_scaling.py`.",
        "",
        "100× more data (sf0.001 → sf0.1) should cost far less than 100× wall:",
        "fixed job overhead dominates the small end, and the plan's parallelism",
        "absorbs growth until cores saturate.  The `×(100× data)` column is the",
        "scale-up factor actually paid.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | ×(100× data) |",
        "|---|---|---|---|---|",
    ]
    for name, r in results.items():
        ratio = r["0.1"] / r["0.001"] if r["0.001"] > 0 else float("nan")
        lines.append(
            f"| {name} | {r['0.001']:.2f}s | {r['0.01']:.2f}s | {r['0.1']:.2f}s "
            f"| {ratio:.1f}× |"
        )
    lines += [
        "",
        "Expected outlier: `q_resample_locf`'s *output* (the gap-filled grid)",
        "grows linearly with users × span, so its wall tracks output size —",
        "still far below the 100× input growth, and it shards cleanly on",
        "user_id.  `q_decontaminate` (round 3) now DF-prunes and broadcasts",
        "the eval side, so the train side never shuffles; its residual",
        "growth is the shingle scan itself.  `q_embed_quantize` runs as",
        "one vectorized Arrow pass (mapInPandas) — the interpreted JVM",
        "array folds it replaced measured 3× superlinear.  Iterative frames",
        "(`q_kmeans`, `q_graph_bfs`, `q_bpe_merges`) pay a fixed per-round",
        "job-scheduling floor that dominates tiny inputs; their",
        "data-dependent cost is the assignment scan / frontier join /",
        "pair-count + merge pass, each shuffle- or map-bounded per round.",
        "Round 4 re-keyed `q_win_rolling_corr` on (user_id, event_type) —",
        "parallelism now follows user cardinality, not the 5-value type",
        "alphabet — and `q_agg_weighted_median` gained its sketch-bucketed",
        "scale primary `q_agg_weighted_median_approx` (per-(flag,bucket)",
        "weight sums replace the per-group sort window; the exact form",
        "remains registered as its ground truth).  `q_win_running_distinct`",
        "keys on user_id (high cardinality — fine as-is).",
    ]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
