"""Dataset profiling: single-pass column statistics and group-skew audits.

The two questions a warehouse operator asks before pointing a 1000-executor
job at a new 100 TB dataset:

* **What is in each column?** (null fraction, cardinality, value range —
  schema-drift and data-quality detection, the input to partition/bucket
  planning).  ``profile_columns`` answers it in ONE scan: every per-column
  metric is an aggregate expression in a single global hash aggregate, and
  the one-row result is unpivoted to per-column rows with ``stack`` — a
  driver-free projection over one row, not a second pass.
* **How skewed are my keys?** (the thing that decides whether a join needs
  salting/AQE skew-split).  ``group_skew`` computes the group-size
  distribution — two cheap aggregates: one shuffle on the key, then a
  global fold over one row per group.

Scale notes: the multi-column COUNT(DISTINCT) in ``profile_columns`` is
exact to satisfy the hash-match contract; Spark plans n distinct aggregates
via Expand (row replication ×n), so at 100 TB the drop-in swap is
``approx_count_distinct`` (HLL sketch, single pass, no Expand) — same
query shape, documented divergence.  No reference counterpart (the
reference has no query surface); net-new per SURVEY §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: Profiled columns of ``orders`` and how their min/max is surfaced:
#: numerics and timestamps as double (timestamp → epoch seconds, exact and
#: format-independent), strings as strings.  NULL pads the other pair.
_PROFILE_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_profile_columns: per-column profile of ``orders`` — row count,
    null count, exact distinct count, min/max — computed in one scan.

    All metrics for all columns are aggregate expressions in ONE global
    aggregate (partial+final, no per-column passes); the single result row
    is then unpivoted with ``stack`` into (column × metrics) rows.  min/max
    are never aggregation-order-sensitive, and counts are exact BIGINTs, so
    every cell hash-matches across engines."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max_num"))
        elif kind == "ts":
            # TIMESTAMP_NTZ has no direct double cast; NTZ→LTZ is identity
            # under the session's pinned UTC zone, then LTZ→double = epoch.
            ep = F.col(c).cast("timestamp_ltz").cast("double")
            aggs.append(F.min(ep).alias(f"{c}__min_num"))
            aggs.append(F.max(ep).alias(f"{c}__max_num"))
        else:
            aggs.append(F.min(c).alias(f"{c}__min_str"))
            aggs.append(F.max(c).alias(f"{c}__max_str"))
    one = o.agg(*aggs)
    stack_args = []
    for c, kind in _PROFILE_COLS:
        num = kind in ("num", "ts")
        stack_args.extend(
            [
                f"'{c}'",
                f"`{c}__nulls`",
                f"`{c}__distinct`",
                f"`{c}__min_num`" if num else "CAST(NULL AS DOUBLE)",
                f"`{c}__max_num`" if num else "CAST(NULL AS DOUBLE)",
                f"`{c}__min_str`" if not num else "CAST(NULL AS STRING)",
                f"`{c}__max_str`" if not num else "CAST(NULL AS STRING)",
            ]
        )
    stacked = one.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {', '.join(stack_args)}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
        ),
    )
    return stacked.select(
        "col_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    ).orderBy("col_name")


def _profile_sql() -> str:
    one_aggs = ["COUNT(*) AS n_rows"]
    selects = []
    for c, kind in _PROFILE_COLS:
        one_aggs.append(f"COUNT(*) - COUNT({c}) AS {c}__nulls")
        one_aggs.append(f"COUNT(DISTINCT {c}) AS {c}__distinct")
        if kind == "num":
            one_aggs.append(f"CAST(MIN({c}) AS DOUBLE) AS {c}__min_num")
            one_aggs.append(f"CAST(MAX({c}) AS DOUBLE) AS {c}__max_num")
        elif kind == "ts":
            one_aggs.append(f"MIN(epoch({c})) AS {c}__min_num")
            one_aggs.append(f"MAX(epoch({c})) AS {c}__max_num")
        else:
            one_aggs.append(f"MIN({c}) AS {c}__min_str")
            one_aggs.append(f"MAX({c}) AS {c}__max_str")
        num = kind in ("num", "ts")
        selects.append(
            f"SELECT '{c}' AS col_name, n_rows, "
            f"{c}__nulls AS n_nulls, {c}__distinct AS n_distinct, "
            + (
                f"{c}__min_num AS min_num, {c}__max_num AS max_num, "
                "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
                if num
                else "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, "
                f"{c}__min_str AS min_str, {c}__max_str AS max_str"
            )
            + " FROM one"
        )
    return (
        "WITH one AS (SELECT " + ", ".join(one_aggs) + " FROM orders)\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY col_name"
    )


PROFILE_COLUMNS_SQL = _profile_sql()


def group_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_group_skew: group-size distribution of lineitem rows per order —
    the skew audit run before choosing a join/agg strategy on a key.

    Two-phase: one shuffle groups by key (map-side partial counts), then a
    global aggregate folds the one-row-per-group table into distribution
    stats.  The p50/p99/max-to-mean ratio directly answer "does this key
    need salting / AQE skew-split?"."""
    l = load_table(spark, sf_dir, "lineitem")
    sizes = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").alias("n_rows"),
        F.avg(F.col("n").cast("double")).alias("avg_size"),
        F.percentile(F.col("n").cast("double"), F.lit(0.5)).alias("p50_size"),
        F.percentile(F.col("n").cast("double"), F.lit(0.99)).alias("p99_size"),
        F.max("n").alias("max_size"),
        (F.max("n") / F.avg(F.col("n").cast("double"))).alias("skew_ratio"),
    )


GROUP_SKEW_SQL = """
WITH sizes AS (
  SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
)
SELECT COUNT(*) AS n_groups,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       AVG(CAST(n AS DOUBLE)) AS avg_size,
       quantile_cont(CAST(n AS DOUBLE), 0.5) AS p50_size,
       quantile_cont(CAST(n AS DOUBLE), 0.99) AS p99_size,
       MAX(n) AS max_size,
       MAX(n) / AVG(CAST(n AS DOUBLE)) AS skew_ratio
FROM sizes
"""


# ---------------------------------------------- constraint validation

#: Value-range rule checked below (dumps encode discounts as fractions).
DISCOUNT_MAX = 0.5


def check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_check_constraints: declarative data-quality checks, one violation
    count per rule — the pre-publication validation job (Deequ-style)
    every pipeline runs before promoting a dataset.

    Rules and their distributed shapes:
    * **pk_unique** (o_orderkey) — duplicate mass from one two-phase
      group-by (Σ(n−1) over groups with n>1);
    * **fk_orders_customer** (o_custkey ⊆ customer) — a LEFT ANTI join,
      count of orphans (never a full outer join);
    * **not_null** (o_totalprice) and **range** (l_discount ∈ [0, max])
      — scan-side predicates, pushed to Parquet.

    Every rule is an exact count so the result hash-checks; all four
    evaluate in one job tree (union of four tiny aggregates) with no
    driver-side looping over rules.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")

    dup_mass = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("n_violations"))
        .select(F.lit("pk_unique_orderkey").alias("check_name"), "n_violations")
    )
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("fk_orders_customer").alias("check_name"), "n_violations")
    )
    nulls = (
        o.where(F.col("o_totalprice").isNull())
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("not_null_totalprice").alias("check_name"), "n_violations")
    )
    ranges = (
        l.where(
            (F.col("l_discount") < 0) | (F.col("l_discount") > DISCOUNT_MAX)
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("range_discount").alias("check_name"), "n_violations")
    )
    return (
        dup_mass.unionByName(orphans)
        .unionByName(nulls)
        .unionByName(ranges)
        .orderBy("check_name")
    )


CHECK_CONSTRAINTS_SQL = f"""
SELECT 'pk_unique_orderkey' AS check_name,
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey
      HAVING COUNT(*) > 1)
UNION ALL
SELECT 'fk_orders_customer', COUNT(*)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'not_null_totalprice', COUNT(*)
FROM orders WHERE o_totalprice IS NULL
UNION ALL
SELECT 'range_discount', COUNT(*)
FROM lineitem WHERE l_discount < 0 OR l_discount > {DISCOUNT_MAX}
ORDER BY check_name
"""


QUERIES = {
    "q_profile_columns": profile_columns,
    "q_group_skew": group_skew,
    "q_check_constraints": check_constraints,
}

ORACLE = {
    "q_profile_columns": PROFILE_COLUMNS_SQL,
    "q_group_skew": GROUP_SKEW_SQL,
    "q_check_constraints": CHECK_CONSTRAINTS_SQL,
}
