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
    # round-5b additions
    "q_dedup_substring",
    "q_src_xml",
    "q_zorder_cluster",
    # round-6 additions
    "q_interval_concurrency",
    "q_embed_covariance",
    "q_embed_pca",
    "q_curation_report",
    "q_dedup_semantic",
]

SFS = ["0.001", "0.01", "0.1"]

#: The heavy tail measured one more decade (synthetic /tmp/sf1 via
#: tools/gen_sf1.py — 10× sf0.1 by key-shifted replication): the queries
#: VERDICT r4 item 7 names as the thinnest part of the 100 TB story.
SF1_QUERIES = [
    "q_dedup_substring",  # round-5b: heaviest new operator
    "q_bpe_merges",
    "q_graph_bfs",
    "q_kmeans",
    "q_agg_weighted_median",
    "q_agg_weighted_median_approx",
    "q_win_running_distinct",
    "q_win_running_distinct_daily",
    "q_win_rolling_corr",
    "q_multimodal_video",
    "q_resample_locf",
    "q_tpch_q21",
    # round-6: data-volume-bound Gram fold, sweep-line pre-agg, and the
    # cell-blocked semantic dedup (pair-count-bound verify kernel)
    "q_embed_covariance",
    "q_interval_concurrency",
    "q_dedup_semantic",
    # round-8: rewritten signature stage (one BLAS matmul per batch) —
    # the at-test-SF plan scans all signatures, so wall should track
    # corpus size ~linearly; at deploy the same matmul runs at write time
    "q_sim_ann_lsh",
    # round-9: the materialized OR-construction layout — first call pays
    # the 2-band write, steady-state probes are pruned reads; sf1 wall is
    # dominated by the one-time layout build at this fixture scale
    "q_sim_ann_partitioned",
]


def run_sf1(spark, registry, sf1_dir: str) -> None:
    """Append/replace the sf1 spot-run section in SCALING.md: min-of-2
    at sf0.1 and sf1 for the heavy tail, with the ×(10×) factor paid."""
    import re

    rows = []
    for name in SF1_QUERIES:
        pts = {}
        for label, d in (("0.1", "/root/testdata/sf0.1"), ("1", sf1_dir)):
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                registry[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            pts[label] = best
        rows.append((name, pts["0.1"], pts["1"]))
        print(f"{name}: sf0.1 {pts['0.1']:.2f}s  sf1 {pts['1']:.2f}s")

    lines = [
        "## sf1 spot-run — the heavy tail, one more decade",
        "",
        "Synthetic sf1 (10× sf0.1 by key-shifted replication,",
        "`tools/gen_sf1.py`; joins stay exactly as selective — copies never",
        "cross-join).  min-of-2, same session.  A plan that survives 100 TB",
        "should pay well under 10× wall for 10× data until cores saturate;",
        "≈10× means compute-bound at full parallelism (acceptable),",
        "materially over 10× flags a superlinear plan.",
        "",
        "| query | sf0.1 | sf1 (10× data) | ×(10×) |",
        "|---|---|---|---|",
    ]
    for name, a, b in rows:
        lines.append(f"| {name} | {a:.2f}s | {b:.2f}s | {b / a:.1f}× |")
    lines += [
        "",
        "Round-9 reading: every scale primary pays ≈2× or less for 10×",
        "data except the named cases below — the iterative frames",
        "(bpe/bfs/kmeans) confirm their sf0.1 cost is scheduling floor,",
        "not data.  `q_dedup_semantic` was the r8 outlier (8.9× — fixed",
        "8-bit blocking let cells grow with the corpus, so within-cell",
        "pair work grew quadratically); adaptive blocking bits",
        "(`_blocking_bits`: expected cell size ~constant) brought it to",
        "~2× — note the sf1 fixture replicates every document 10×, so",
        "the TRUE-duplicate output itself grows ~100×, an output-bound",
        "floor no blocking can remove.  `q_resample_locf` stays the",
        "documented output-bound case (the gap-filled grid is ~10× larger",
        "at sf1 — wall tracks OUTPUT size, sharded on user_id).",
        "`q_embed_covariance` is data-volume-bound by design (one Gram",
        "fold over every vector) — ~1.6× measured; a hotter session once",
        "drew 5.9×, which is cores saturating under load, not a plan",
        "defect.  `q_sim_ann_partitioned`'s wall",
        "is dominated by its ONE-TIME 2-band layout write at this",
        "fixture scale; steady-state probes are pruned reads.",
        "`q_win_running_distinct` exact stays ~2× (user_id keying) with",
        "the day-grain primary lower; `q_agg_weighted_median` EXACT holds",
        "~1× after the r5 distinct-value-grain pre-aggregation.",
    ]
    section = "\n".join(lines) + "\n"
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    text = open(path).read()
    if "## sf1 spot-run" in text:
        text = re.sub(
            r"## sf1 spot-run.*?(?=\n## |\Z)", section, text, flags=re.S
        )
    else:
        text = text.rstrip() + "\n\n" + section
    open(path, "w").write(text)
    print(f"wrote sf1 section to {path}")


def main() -> None:
    from mysqldump_to_parquet_spark.session import get_spark

    import __spark_entry__ as entrypoint

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="gen-scaling", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrypoint.queries()

    if "--sf1" in sys.argv:
        i = sys.argv.index("--sf1")
        sf1_dir = (
            sys.argv[i + 1]
            if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("-")
            else "/tmp/sf1"
        )
        registry[SF1_QUERIES[0]](spark, "/root/testdata/sf0.01").write.format(
            "noop"
        ).mode("overwrite").save()  # warmup
        run_sf1(spark, registry, sf1_dir)
        spark.stop()
        return

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
        "`q_dedup_substring` (round 5b) shuffles one narrow row per token",
        "window by construction (the corpus-wide count needs every",
        "window exactly once), so its wall tracks the window count —",
        "sub-4× for 100× windows here, linear and skew-safe at scale",
        "(see its module docstring), with the sf1 decade below.",
    ]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    # a full regen must not silently drop the --sf1 spot-run section
    # (separately measured — carry the existing one over verbatim)
    sf1_section = ""
    if os.path.exists(path):
        import re

        m = re.search(r"\n## sf1 spot-run.*?(?=\n## |\Z)", open(path).read(), re.S)
        if m:
            sf1_section = m.group(0)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n" + sf1_section)
    print(f"wrote {path}" + (" (sf1 section preserved)" if sf1_section else ""))
    spark.stop()


if __name__ == "__main__":
    main()
