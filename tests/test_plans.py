"""Physical-plan property tests — the scale contract, asserted.

A correct answer with the wrong plan fails these: the point is that at
100 TB the scan reads only needed columns/row-groups, dims broadcast, and
top-k never global-sorts.
"""

from __future__ import annotations

import re

import pytest

from mysqldump_to_parquet_spark.operators import aggregates, relational
from mysqldump_to_parquet_spark.plans.explain import (
    codegen_stage_count,
    formatted_plan,
    has_operator,
    has_pushed_filter,
    read_schema_columns,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    df = relational.project_filter(spark, SF)
    assert has_pushed_filter(df, "l_quantity")
    assert has_pushed_filter(df, "l_shipdate")


def test_column_pruning(spark):
    df = relational.project_filter(spark, SF)
    schemas = read_schema_columns(df)
    assert schemas, "no parquet scan found"
    for cols in schemas:
        # 11-column lineitem must be pruned to just the 6 referenced columns
        assert len(cols) <= 6, f"scan reads too many columns: {cols}"
        assert "l_returnflag" not in cols


def test_flagship_q1_plan(spark):
    df = aggregates.tpch_q1(spark, SF)
    plan = formatted_plan(df)
    assert "HashAggregate" in plan
    # two-phase agg: partial + final
    assert plan.count("HashAggregate") >= 2
    assert has_pushed_filter(df, "l_shipdate")
    # codegen spans appear as *(n) markers in the final (post-AQE) plan
    assert codegen_stage_count(df) >= 2  # scan→partial-agg and final-agg spans


def test_broadcast_join_is_broadcast(spark):
    df = relational.join_broadcast(spark, SF)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan


def test_sort_limit_is_topk_not_global_sort(spark):
    df = relational.sort_limit(spark, SF)
    assert has_operator(df, "TakeOrderedAndProject")


def test_semi_anti_join_operators(spark):
    semi = relational.join_semi(spark, SF)
    anti = relational.join_anti(spark, SF)
    assert "LeftSemi" in formatted_plan(semi)
    assert "LeftAnti" in formatted_plan(anti)


def test_theta_join_broadcasts_tiny_side(spark):
    df = relational.join_theta_range(spark, SF)
    assert has_operator(df, "BroadcastNestedLoopJoin")


def test_salted_agg_distinct_exact(spark):
    """The salted two-phase distinct must equal the plain countDistinct."""
    from pyspark.sql import functions as F

    from mysqldump_to_parquet_spark.operators.skew import salted_agg_distinct

    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = {
        r.l_returnflag: r.n_distinct
        for r in salted_agg_distinct(l, "l_returnflag", "l_partkey").collect()
    }
    want = {
        r.l_returnflag: r.n
        for r in l.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert got == want


def test_pack_sequences_no_global_sort(spark):
    """Sequence packing must window per shard (lang), never collapse to a
    single partition — the 100 TB kill-switch for naive global ordering."""
    from mysqldump_to_parquet_spark.llm.sampling import pack_sequences

    plan = formatted_plan(pack_sequences(spark, SF))
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(lang" in plan, plan


def test_top_terms_partial_aggregation(spark):
    """The (lang, token) document-frequency count must combine map-side
    before the shuffle (partial + final HashAggregate pair)."""
    from mysqldump_to_parquet_spark.llm.textstats import top_terms

    plan = formatted_plan(top_terms(spark, SF))
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_count" in plan, plan


def test_correlated_subquery_decorrelates(spark):
    """The correlated scalar subquery must rewrite to aggregate + join —
    a per-outer-row subquery re-execution would be |outer| passes at scale."""
    from mysqldump_to_parquet_spark.operators.composite import subquery_scalar

    plan = formatted_plan(subquery_scalar(spark, SF))
    assert "Join" in plan, plan
    assert "max(" in plan, plan


def test_tpch_q3_broadcast_and_pushdown(spark):
    """Q3: filtered customer broadcasts; segment/date filters reach scans;
    top-10 is TakeOrderedAndProject, never a global sort."""
    from mysqldump_to_parquet_spark.operators.composite import tpch_q3

    df = tpch_q3(spark, SF)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert has_pushed_filter(df, "c_mktsegment")
    assert has_pushed_filter(df, "l_shipdate")
    assert has_operator(df, "TakeOrderedAndProject")


def test_tpch_q5_single_shuffle_join(spark):
    """Q5's only shuffle join is orders ⋈ lineitem — every dimension
    (customer/supplier/nation/region at this cardinality) broadcasts."""
    from mysqldump_to_parquet_spark.operators.composite import tpch_q5

    df = tpch_q5(spark, SF)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert has_pushed_filter(df, "o_orderdate")


def test_tpch_q18_having_joins_back_broadcast(spark):
    """Q18: the >threshold key set is tiny and must broadcast back into
    orders (no second shuffle of the fact table)."""
    from mysqldump_to_parquet_spark.operators.composite import tpch_q18

    df = tpch_q18(spark, SF)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial+final qty sum


def test_repetition_zero_shuffle(spark):
    """Modal-gram extraction is a per-row run-length fold over the sorted
    gram array — no Exchange anywhere (the naive shape shuffles every
    gram in the corpus twice)."""
    from mysqldump_to_parquet_spark.llm.quality import repetition

    plan = formatted_plan(repetition(spark, SF))
    assert "Exchange" not in plan, plan
    assert "aggregate(" in plan, plan  # the HOF fold


def test_gopher_rules_zero_shuffle(spark):
    """Rule evaluation is pure per-row expression work — no Exchange in
    the plan, so it fuses into whatever stage consumes the keep flag."""
    from mysqldump_to_parquet_spark.llm.quality import gopher_rules

    plan = formatted_plan(gopher_rules(spark, SF))
    assert "Exchange" not in plan, plan


def test_sessionize_single_hash_exchange(spark):
    """Sessionize chains two windows + a group-by over ONE user_id
    shuffle: hashpartitioning(user_id) satisfies the (user_id, session_id)
    clustering, so the only other Exchange is the display orderBy."""
    from mysqldump_to_parquet_spark.operators.temporal import sessionize

    plan = formatted_plan(sessionize(spark, SF))
    assert plan.count("Arguments: hashpartitioning(user_id") == 1, plan
    assert "partial_min" in plan, plan  # session agg combines map-side


def test_merge_upsert_window_group_limit(spark):
    """Changelog compaction must hit the rank-limit pushdown
    (WindowGroupLimit): each map task keeps only its per-key latest row
    before the shuffle, so the exchange carries ~|keys| rows, not the
    full changelog."""
    from mysqldump_to_parquet_spark.operators.temporal import merge_upsert

    plan = formatted_plan(merge_upsert(spark, SF))
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Arguments: hashpartitioning(user_id") == 1, plan


def test_win_time_range_is_range_frame(spark):
    """The trailing-7-day window must be a RangeFrame over the numeric
    event-time key — a RowFrame would silently count rows, not time."""
    from mysqldump_to_parquet_spark.operators.temporal import win_time_range

    plan = formatted_plan(win_time_range(spark, SF))
    assert "RangeFrame" in plan, plan
    assert plan.count("Arguments: hashpartitioning(user_id") == 1, plan


def test_join_dpp_prunes_partitions_at_runtime(spark, tmp_path):
    """The month-partitioned fact scan must carry a dynamicpruning
    PartitionFilter fed by the broadcast dim — runtime partition pruning,
    not a full-fact scan — and prune columns to the aggregate input."""
    from mysqldump_to_parquet_spark.operators.composite import _dpp_joined

    df = _dpp_joined(spark, SF, str(tmp_path / "fact"))
    plan = formatted_plan(df)
    assert "dynamicpruningexpression" in plan, plan
    assert "ReadSchema: struct<l_quantity:double>" in plan, plan


def test_embed_centroids_partial_agg(spark):
    """Vector averaging must partial-aggregate the (label, pos) cells
    map-side and never collapse to a single partition."""
    from mysqldump_to_parquet_spark.llm.vectors import embed_centroids

    plan = formatted_plan(embed_centroids(spark, SF))
    assert "partial_avg" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_dedup_fuzzy_is_blocked_equi_join(spark):
    """The fuzzy join must be an equi-join on the block key (hash or
    sort-merge) — never a nested-loop all-pairs — with levenshtein only
    as a post-join filter."""
    from mysqldump_to_parquet_spark.llm.dedup import dedup_fuzzy

    plan = formatted_plan(dedup_fuzzy(spark, SF))
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "levenshtein" in plan, plan


def test_join_interval_is_binned_equi_join(spark):
    """The interval-overlap join must be an equi join on the time-bin key
    — BroadcastNestedLoopJoin here is the O(|P|·|E|) plan that dies at
    scale.  The exact interval predicate survives as a post-join filter
    (visible as the p_ts/e_ts comparison in the join condition)."""
    from mysqldump_to_parquet_spark.operators.relational import join_interval

    plan = formatted_plan(join_interval(spark, SF))
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "bin" in plan, plan


def test_unpivot_expands_map_side(spark):
    """Unpivot compiles to Expand inside the scan stage; the only
    Exchange in the plan is the 4-group aggregate that follows."""
    from mysqldump_to_parquet_spark.operators.aggregates import agg_unpivot

    import re

    plan = formatted_plan(agg_unpivot(spark, SF))
    assert "Expand" in plan, plan
    # numbered node list: partial→final agg exchange + 4-row sort exchange
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan


def test_lateral_topk_decorrelates_to_window(spark):
    """The LATERAL ORDER BY…LIMIT subquery must decorrelate into a window
    rank + join — not |outer| re-executions of the inner query."""
    from mysqldump_to_parquet_spark.operators.composite import lateral_topk

    plan = formatted_plan(lateral_topk(spark, SF))
    assert "Window" in plan, plan
    assert "Join" in plan, plan


def test_entropy_zero_shuffle(spark):
    """Entropy's sufficient statistics come from a per-row run-length
    fold — no Exchange (the relational shape shuffles every token in the
    corpus twice)."""
    from mysqldump_to_parquet_spark.llm.quality import entropy

    plan = formatted_plan(entropy(spark, SF))
    assert "Exchange" not in plan, plan
    assert "aggregate(" in plan, plan


def test_anomaly_mad_broadcasts_stats(spark):
    """The per-group stats tables join back via broadcast — the events
    side never shuffles for the flagging join."""
    from mysqldump_to_parquet_spark.llm.quality import anomaly_mad

    plan = formatted_plan(anomaly_mad(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_nested_schema_pruning(spark, tmp_path):
    """Projecting two struct subfields must prune the scan's ReadSchema to
    exactly those subfields — meta.lang (and the document text, which is
    not even written) never leaves disk."""
    from pyspark.sql import functions as F

    from mysqldump_to_parquet_spark.catalog import load_table
    from mysqldump_to_parquet_spark.sources.files import _nested_read_agg

    path = str(tmp_path / "documents_nested")
    load_table(spark, SF, "documents").select(
        "doc_id", F.struct("lang", "source", "n_chars").alias("meta")
    ).write.parquet(path)
    plan = formatted_plan(_nested_read_agg(spark, path))
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, plan
    assert "source" in m.group(1) and "n_chars" in m.group(1), m.group(1)
    assert "lang" not in m.group(1), f"struct not pruned: {m.group(1)}"


def test_runtime_bloom_filter_join_pruning(spark):
    """Catalyst's runtime row-level filtering: a selective filter on the
    non-broadcast build side injects bloom_filter_might_contain onto the
    probe side's scan — rows that cannot join are dropped before the
    shuffle (the row-level analog of q_join_dpp's partition pruning).
    The fixture scan is far below the default application-side size
    threshold, so the test lowers it; at 100 TB the defaults fire."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        l = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = formatted_plan(j).lower()
        # the injected runtime filter appears as a bloomFilter-building
        # subquery + a might_contain predicate on the probe side
        assert "bloomfilter" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_pii_redact_spreads_but_never_keys(spark):
    """PII redaction is per-row regex work: the only Exchange allowed is
    the round-robin spread of the under-split fixture scan (a no-op on
    properly-split input) — never a key shuffle."""
    from mysqldump_to_parquet_spark.llm.scrub import pii_redact

    plan = formatted_plan(pii_redact(spark, SF))
    assert "hashpartitioning" not in plan.lower(), plan
    assert codegen_stage_count(pii_redact(spark, SF)) >= 1


def test_dedup_url_single_shuffle(spark):
    """Canonical-URL dedup is canonicalize + ONE hash aggregation: exactly
    one Exchange, keyed on the canonical URL, with a partial aggregate
    before it (map-side combine)."""
    from mysqldump_to_parquet_spark.llm.scrub import dedup_url

    plan = formatted_plan(dedup_url(spark, SF))
    assert plan.count("Arguments: hashpartitioning(canonical_url") == 1, plan
    assert "partial_count" in plan, plan  # map-side combine before the shuffle


def test_skyline_no_global_sort_of_data(spark):
    """Stage 1's per-block windows sort within hash partitions; only the
    tiny candidate set reaches the final single-partition sweep."""
    from mysqldump_to_parquet_spark.operators.relational import skyline

    plan = formatted_plan(skyline(spark, SF))
    # the data-scale exchange is hashpartitioning on the block key; the
    # single-partition exchange exists but consumes only local-skyline
    # survivors (bounded by blocks × frontier size, not |data|)
    assert "hashpartitioning" in plan.lower(), plan


def test_bm25_filters_before_shuffle(spark):
    """The query-term filter must run scan-side: the exploded token
    stream is cut to |query|·N_docs rows before the (doc, term) count
    shuffle ever happens."""
    from mysqldump_to_parquet_spark.llm.terms import bm25

    plan = formatted_plan(bm25(spark, SF))
    assert "array_contains" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sample_weighted_no_data_shuffle(spark):
    """PPS sampling is one tiny max-aggregate broadcast + a per-row
    filter: the documents scan side must not shuffle."""
    from mysqldump_to_parquet_spark.llm.sampling import sample_weighted

    plan = formatted_plan(sample_weighted(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cdc_apply_partial_aggregate_no_sort(spark):
    """Changelog compaction must be a two-phase max_by aggregate — no
    window sort anywhere in the plan, exactly one key exchange."""
    from mysqldump_to_parquet_spark.operators.temporal import cdc_apply

    df = cdc_apply(spark, SF)
    plan = formatted_plan(df)
    # struct-keyed max_by plans as SortAggregate; the contract is the
    # TWO-PHASE shape: a partial_max_by BELOW the exchange so the shuffle
    # carries one candidate row per key, and no Window anywhere
    assert "partial_max_by" in plan
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2
    assert "Window" not in plan


def test_heavy_hitters_semi_join_broadcast(spark):
    """Pass 2 must probe a BROADCAST of the candidate set with a semi
    join — the token stream never shuffles on the term."""
    from mysqldump_to_parquet_spark.llm.terms import heavy_hitters

    plan = formatted_plan(heavy_hitters(spark, SF))
    assert "LeftSemi" in plan
    assert "BroadcastExchange" in plan


def test_skyline_reduces_before_windows(spark):
    """Stage 0's per-qty min must partial-aggregate BEFORE any window —
    the windows then see |distinct qty| rows, not |points|."""
    from mysqldump_to_parquet_spark.operators.relational import skyline

    plan = formatted_plan(skyline(spark, SF))
    # the aggregate appears below the windows in the tree (higher node id
    # = deeper); cheap proxy: both exist and aggregation is two-phase
    assert "HashAggregate" in plan
    assert "Window" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final min(price)


def test_tpch_q21_no_self_join(spark):
    """The conditional-aggregation rewrite must plan exactly one join of
    lineitem (to orders) plus the broadcast supplier join — no semi/anti
    lineitem self-joins."""
    from mysqldump_to_parquet_spark.operators.composite import tpch_q21

    plan = formatted_plan(tpch_q21(spark, SF))
    assert "LeftSemi" not in plan
    assert "LeftAnti" not in plan
    assert "BroadcastExchange" in plan  # supplier display join


def test_substring_dedup_two_data_exchanges(spark):
    """q_dedup_substring's scale contract: the document text never
    shuffles (only hash/pos rows), exactly two data-sized exchanges —
    count-window on win_hash, interval-merge on doc_id — and the two
    downstream groupBys reuse the doc_id partitioning (subset-satisfied,
    no aggregate exchange).  Third allowed Exchange = the tiny output
    orderBy."""
    from mysqldump_to_parquet_spark.llm.substring import dedup_substring

    plan = formatted_plan(dedup_substring(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3, plan
    assert "Cartesian" not in plan, plan
    # the contract itself: no Exchange's input carries the document text
    # or token array — only doc_id/pos/hash-width rows ever shuffle
    for block in plan.split("\n\n"):
        if re.match(r"\(\d+\) Exchange", block):
            assert "text#" not in block and "toks#" not in block, block


def test_zorder_cluster_map_only_until_bucket_agg(spark):
    """q_zorder_cluster: the 1-row bounds aggregate broadcasts; the data
    path is map-only codegen into a partial-aggregated 64-group summary —
    no UDF, no data-sized sort before aggregation."""
    from mysqldump_to_parquet_spark.sources.maintenance import zorder_cluster

    plan = formatted_plan(zorder_cluster(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row bounds side
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_cut_duplicated_spans_stays_jvm_side(spark):
    """The cutting pass is the span frame plus ONE doc_id join and a
    codegen'd token filter — no Python evaluation anywhere."""
    from mysqldump_to_parquet_spark.llm.substring import cut_duplicated_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = formatted_plan(cut_duplicated_spans(docs))
    assert "BatchEvalPython" not in plan and "pythonUDF" not in plan, plan
    assert "Cartesian" not in plan, plan
