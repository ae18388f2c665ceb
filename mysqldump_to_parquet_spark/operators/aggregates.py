"""Aggregation operators: hash aggregate, distinct, approx-distinct,
rollup/cube/grouping-sets, pivot.

The reference implements **no** aggregation (SURVEY.md §2.1 — its only
"aggregate" is the row→columnar pivot at the Parquet write boundary,
/root/reference/src/parquet_writer.rs:120–218).  This module is the §2.2
extension surface, expressed entirely with built-in Catalyst operators:

* ``groupBy().agg()`` compiles to partial (map-side) + final hash
  aggregation — the two-phase plan you want at 100 TB: the shuffle carries
  one row per (group × partition), not per input row.
* ``rollup``/``cube`` compile to a single ``Expand`` + hash aggregate —
  no per-grouping rescan.
* ``approx_count_distinct`` is HyperLogLog++ — constant-size sketch per
  group, mergeable across partitions; the exact ``countDistinct`` variant
  forces a second shuffle on (group, value), which is precisely why the
  approximate form is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

#: Flagship filter date — TPC-H Q1 shape on the synthetic lineitem
#: (l_shipdate spans 1995-01-02 .. 2001-11-04).
Q1_CUTOFF = "1998-09-02"


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (the flagship query).

    Scan → filter (pushed to the Parquet reader) → two-phase hash aggregate
    on a 6-value group key → tiny sort.  At 100 TB the plan is scan-bound;
    the shuffle moves ≤ (#groups × #partitions) rows.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantity sums/avgs are whole-double exact; the price-bearing
            # sums round onto their decimal grid (cross-engine accumulation
            # order), and each avg divides its ROUNDED sum by the exact
            # count — bit-deterministic with no boundary risk
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            (
                F.round(F.sum("l_extendedprice"), 6) / F.count(F.lit(1))
            ).alias("avg_price"),
            (
                F.round(F.sum("l_discount"), 6) / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


TPCH_Q1_SQL = f"""
SELECT l_returnflag,
       l_linestatus,
       SUM(l_quantity)                                         AS sum_qty,
       ROUND(SUM(l_extendedprice), 6)                          AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)       AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       AVG(l_quantity)                                         AS avg_qty,
       ROUND(SUM(l_extendedprice), 6) / COUNT(*)               AS avg_price,
       ROUND(SUM(l_discount), 6) / COUNT(*)                    AS avg_disc,
       COUNT(*)                                                AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per group (expands to a two-shuffle plan)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


AGG_DISTINCT_SQL = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*)                  AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct — the 100 TB path (single shuffle,
    constant-size mergeable sketches).  Approximate ⇒ rows-only check."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"))
        .orderBy("l_returnflag")
    )


def agg_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_sketch_distinct: *mergeable* distinct-count sketches — build
    one HLL sketch per day partition (``hll_sketch_agg``), then union the
    stored sketches (``hll_union_agg``) for the full-period estimate.

    This is the incremental pattern a 100 TB pipeline actually runs: daily
    jobs persist a constant-size sketch column next to the data; any later
    rollup (week, month, ad-hoc) merges sketches without rescanning raw
    rows.  Engine-specific sketch bytes ⇒ rows-only driver check; the
    estimate-vs-exact bound is pytest-asserted."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    return (
        daily.agg(
            F.count(F.lit(1)).alias("n_daily_sketches"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("long")
            .alias("distinct_users_estimate"),
        )
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): one Expand + one aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*)        AS n_rows,
       SUM(l_quantity) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


AGG_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*)        AS n_rows,
       SUM(l_quantity) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Expand-based plan)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*)          AS n_orders,
               SUM(o_totalprice) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


AGG_GSETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*)          AS n_orders,
       SUM(o_totalprice) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
"""

#: Pivot needs the value list up front to keep the plan single-pass; these
#: are the fixture's order statuses (F/O/P).
ORDER_STATUSES = ["F", "O", "P"]


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on o_orderstatus.  Passing explicit values avoids the extra
    distinct-collect job Spark otherwise runs to discover them."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, ORDER_STATUSES)
        .orderBy("o_orderpriority")
    )


AGG_PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


#: Measure columns melted by the unpivot (wide → long inverse of pivot).
_UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): lineitem's four numeric measures → long
    (measure, val) form, then a per-measure profile.

    ``DataFrame.unpivot`` compiles to an Expand node — each input row is
    emitted k times *map-side inside the same stage*, so the only shuffle
    in the plan is the 4-group aggregate that follows (with partial
    map-side combine the exchange carries 4 rows per task, not 4×|rows|).
    The wide→long pivot direction is the inverse of `q_agg_pivot`.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.unpivot(
            ids=[],
            values=_UNPIVOT_MEASURES,
            variableColumnName="measure",
            valueColumnName="val",
        )
        .groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
            # rounded: cross-engine double-sum accumulation order
            F.round(F.sum("val"), 6).alias("sum_val"),
        )
        .orderBy("measure")
    )


AGG_UNPIVOT_SQL = """
SELECT measure, COUNT(*) AS n, MIN(val) AS min_val, MAX(val) AS max_val,
       ROUND(SUM(val), 6) AS sum_val
FROM (
  UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem)
  ON l_quantity, l_extendedprice, l_discount, l_tax
  INTO NAME measure VALUE val
)
GROUP BY measure
ORDER BY measure
"""


def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (sort-based exact path —
    matches DuckDB's quantile_cont bit-for-bit); the sketch-based
    ``percentile_approx``/KLL is the 100 TB path when exactness can yield."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
            F.median("l_quantity").alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )


AGG_QUANTILE_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS median_price,
       quantile_cont(l_extendedprice, 0.9) AS p90_price,
       quantile_cont(l_quantity, 0.5)      AS median_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group statistical moments and a per-group OLS fit: correlation,
    sample/population covariance, stddev, variance, and the slope/intercept
    of extendedprice regressed on quantity.

    All are built-in JVM aggregates with mergeable state (sum, sum-of-
    squares, cross-products), so the plan is the same two-phase hash
    aggregate as any SUM — constant state per (group × partition),
    single shuffle.  ``skewness``/``kurtosis`` are deliberately absent
    from the hash-checked surface: Spark computes population moments,
    DuckDB sample-corrected ones (≈1.5/n relative divergence), so they
    cannot hash-match; the same two-phase plan applies when they're used.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            # moment-state accumulation order is engine-dependent; each
            # output is rounded so its absolute drift (≈ value × 1e-14)
            # sits ≥10⁴ below the rounding boundary — hence scale-aware
            # digits per column (corr ~1e-2 → 9; variance ~1e9 → 0)
            F.round(F.corr("l_quantity", "l_extendedprice"), 9).alias(
                "qty_price_corr"
            ),
            F.round(
                F.covar_samp("l_quantity", "l_extendedprice"), 6
            ).alias("qty_price_covar"),
            F.round(
                F.covar_pop("l_quantity", "l_extendedprice"), 6
            ).alias("qty_price_covar_pop"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
            F.round(F.var_samp("l_extendedprice"), 0).alias("price_var"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 9).alias(
                "fit_slope"
            ),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 4
            ).alias("fit_intercept"),
        )
        .orderBy("l_returnflag")
    )


AGG_STATS_SQL = """
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 9)        AS qty_price_corr,
       ROUND(covar_samp(l_quantity, l_extendedprice), 6)  AS qty_price_covar,
       ROUND(covar_pop(l_quantity, l_extendedprice), 6)   AS qty_price_covar_pop,
       ROUND(stddev_samp(l_extendedprice), 4)             AS price_stddev,
       ROUND(var_samp(l_extendedprice), 0)                AS price_var,
       ROUND(regr_slope(l_extendedprice, l_quantity), 9)  AS fit_slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS fit_intercept
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


#: Histogram bin width over o_totalprice (values span ~[1e3, 5e5]).
HIST_BIN = 50_000.0


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: bucket each row by
    ``floor(x / w) * w`` and count per bucket.

    The bucket expression is a scalar projection (whole-stage codegen), so
    the plan is one scan + one two-phase aggregate on ~#buckets keys — the
    shuffle moves one row per (bucket × partition) no matter the input
    size.  Expressed with arithmetic (not ``width_bucket``) so the same
    text runs on both engines and the bucket edges are bit-identical.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = (F.floor(F.col("o_totalprice") / HIST_BIN) * HIST_BIN).cast("double")
    return (
        o.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_total"),
            F.max("o_totalprice").alias("max_total"),
        )
        .orderBy("bucket_lo")
    )


AGG_HISTOGRAM_SQL = f"""
SELECT CAST(FLOOR(o_totalprice / {HIST_BIN}) * {HIST_BIN} AS DOUBLE) AS bucket_lo,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_total,
       MAX(o_totalprice) AS max_total
FROM orders
GROUP BY 1
ORDER BY bucket_lo
"""


#: Equi-depth bucket count.
HIST_EQ_BUCKETS = 10


def agg_histogram_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_histogram_eq: equi-DEPTH histogram — ntile(10) over the value
    order assigns equal-count buckets; per-bucket (lo, hi, n) are the
    empirical decile boundaries.  This is the statistic range
    partitioners and skew diagnostics actually need (equi-width buckets
    collapse under skew; equi-depth buckets are the quantile sketch).

    The window has no PARTITION BY, so Spark plans it as **Exchange
    SinglePartition** (an empty-spec window demands AllTuples
    distribution) — a deliberate, driver-scale-only choice: exact global
    ntile is inherently a total order through one consumer.  At 100 TB
    you'd compute the boundaries with ``approx_percentile`` on a sample
    (or ``repartitionByRange`` + per-partition counts merged on the
    driver); the exact form here is the hash-checkable ground truth such
    approximations are judged against.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    bucketed = o.select(
        "o_totalprice", F.ntile(HIST_EQ_BUCKETS).over(w).alias("decile")
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("decile")
    )


AGG_HISTOGRAM_EQ_SQL = f"""
SELECT decile,
       COUNT(*)          AS n_orders,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi
FROM (
  SELECT o_totalprice,
         NTILE({HIST_EQ_BUCKETS}) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC)
           AS decile
  FROM orders
)
GROUP BY decile
ORDER BY decile
"""


def agg_histogram_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_histogram_approx: the 100 TB path for equi-depth histograms —
    decile boundaries from ``approx_percentile`` (a mergeable KLL-style
    sketch: two-phase aggregation, NO global sort or single-partition
    exchange), then exact per-bucket counts by range.

    This is the scale twin of :func:`agg_histogram_eq` (exact global
    ntile, inherently single-partition): the sketch pass reads the data
    once with partial aggregation; the bucketing pass is a broadcast of
    10 boundaries folded into a scan-side CASE.  Approximate boundary
    placement ⇒ rows-only driver check; the exact-twin agreement (every
    bucket within sketch tolerance of N/10) is pytest-asserted.
    """
    o = load_table(spark, sf_dir, "orders")
    qs = [i / HIST_EQ_BUCKETS for i in range(1, HIST_EQ_BUCKETS)]
    bounds = o.agg(
        F.percentile_approx(
            "o_totalprice", F.array(*[F.lit(q) for q in qs]), 10_000
        ).alias("bs")
    )
    bucket = F.expr(
        "1 + aggregate(bs, 0, (acc, b) -> acc + CASE WHEN o_totalprice > b "
        "THEN 1 ELSE 0 END)"
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        # no ORDER BY: 10 output rows don't justify even a tiny global
        # sort in the plan contract; consumers sort presentation-side
    )


# ----------------------------------- incremental aggregate maintenance

#: The "delta" month: rows from here on arrive after the base rollup ran.
INCR_CUTOFF = "2001-06-01"


def agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_incremental: incremental rollup maintenance — merge partial
    aggregate *states* from the historical base with a late-arriving
    delta, instead of re-aggregating the full history.

    The mergeable-state discipline every periodic rollup job needs at
    100 TB: keep (sum, count, min, max) per (grain, group) — all
    merge-associative — and each refresh aggregates only the new
    partition, then merges states.  AVG is *derived* (sum/count) at read
    time; storing it would make the state unmergeable.  Exactness: the
    merge is the same partial→final tree Spark's own two-phase
    aggregation builds, so the incremental result equals the full
    recompute (the oracle below IS the full recompute).
    """
    l = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit(INCR_CUTOFF).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        # per-(month, flag) state: the persisted granularity of the rollup
        return df.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
            "l_returnflag",
        ).agg(
            F.sum("l_quantity").alias("s_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )

    base = partials(l.where(F.col("l_shipdate") < cutoff))
    delta = partials(l.where(F.col("l_shipdate") >= cutoff))
    merged = base.unionByName(delta)
    return (
        merged.groupBy("l_returnflag")
        .agg(
            F.sum("s_qty").alias("sum_qty"),
            F.sum("n_rows").alias("n_rows"),
            F.min("min_qty").alias("min_qty"),
            F.max("max_qty").alias("max_qty"),
            (F.sum("s_qty") / F.sum("n_rows")).alias("avg_qty"),
        )
        .orderBy("l_returnflag")
    )


#: Oracle = the full recompute the incremental path must equal exactly.
AGG_INCREMENTAL_SQL = """
SELECT l_returnflag,
       SUM(l_quantity)              AS sum_qty,
       COUNT(*)                     AS n_rows,
       MIN(l_quantity)              AS min_qty,
       MAX(l_quantity)              AS max_qty,
       SUM(l_quantity) / COUNT(*)   AS avg_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ------------------------------------------------- deterministic mode


def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_mode: modal event_type per user — with a DETERMINISTIC
    tiebreak (highest count, then lexicographically smallest type).

    Built-in ``mode()`` returns an *arbitrary* modal value on ties in
    both Spark and DuckDB — useless under a value-hash contract and a
    reproducibility liability in any pipeline.  The portable form is
    count → per-key argmax via min(struct), which is also the better
    scale shape: two partial-aggregated hash shuffles (no window sort),
    keyed on (user_id, event_type) then user_id — skew-bounded by the
    per-user type alphabet, not event volume.
    """
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # argmax via min over (-cnt, event_type): struct ordering gives the
    # highest count, ties broken by the smallest type string
    best = counts.groupBy("user_id").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("event_type").alias("et"))).alias("b"),
        F.sum("cnt").alias("n_events"),
    )
    return best.select(
        "user_id",
        F.col("b.et").alias("modal_type"),
        (-F.col("b.neg")).alias("modal_cnt"),
        "n_events",
    )


AGG_MODE_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS cnt
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       (min(struct_pack(neg := -cnt, et := event_type))).et AS modal_type,
       -(min(struct_pack(neg := -cnt, et := event_type))).neg AS modal_cnt,
       -- BIGINT cast: DuckDB SUM(BIGINT) returns HUGEINT, which its
       -- pandas bridge converts to float64 ('55.0' vs Spark's '55')
       CAST(SUM(cnt) AS BIGINT) AS n_events
FROM counts
GROUP BY user_id
"""


# ------------------------------------------------------ weighted median


def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_weighted_median: quantity-weighted median price per return
    flag — the robust center of a value distribution where each row
    carries a weight (shipment sizes, sample weights, dollar volumes).

    No engine has a weighted-median aggregate; the standard rewrite is
    a cumulative-weight window: sort the group by value, running-sum
    the weights, and take the FIRST value whose cumulative weight
    reaches half the group total.

    Round 5: the window input is pre-aggregated to DISTINCT-VALUE grain
    — ``groupBy(flag, price) → sum(weight)`` — which is result-identical
    (merging equal prices moves the cumulative curve only at points
    between equal values; the crossing PRICE cannot change, and no tie
    columns are needed once prices are distinct) but makes the sort
    window scale with value cardinality instead of row count: the sf1
    spot-run paid 8.0× for 10× rows on the per-row form.  Worst case
    (all-distinct values) is unchanged, so the sketch-bucketed
    ``q_agg_weighted_median_approx`` remains the scale primary and this
    form remains its exact ground truth.  Scale shape: one map-side
    partial agg + one (flag) exchange serving both windows and the
    min-pick; weights are integral-valued doubles, so every cumulative
    sum and the ≥ half-total test stays exact."""
    l = load_table(spark, sf_dir, "lineitem")
    g = l.groupBy("l_returnflag", "l_extendedprice").agg(
        F.sum("l_quantity").alias("w")
    )
    w_ord = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    w_all = Window.partitionBy("l_returnflag")
    cum = g.withColumn(
        "cw",
        F.sum("w").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("tw", F.sum("w").over(w_all))
    return (
        cum.where(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median_price"),
            F.round(F.max("tw"), 2).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


AGG_WEIGHTED_MEDIAN_SQL = """
WITH cum AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey,
                                        l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS weighted_median_price,
       ROUND(MAX(tw), 2)    AS total_weight
FROM cum
WHERE cw * 2 >= tw
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

#: Sketch resolution for the approximate weighted median.
WMED_BUCKETS = 64


def agg_weighted_median_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_weighted_median_approx: the 100 TB path for the weighted
    median — sketch-bucketed cumulative weights instead of a per-group
    sort window.

    The exact twin (:func:`agg_weighted_median`) is correct but its
    cumulative-weight window keys on ``l_returnflag`` — a 3-value
    alphabet, so three window partitions serve the entire corpus
    (measured 3.6× at 100× data).  The scale shape replaces the sort
    with two scan passes and grain-sized state: (1) one mergeable
    ``approx_percentile`` sketch pass yields {WMED_BUCKETS} global
    price boundaries; (2) one partial-aggregated pass sums weight per
    (flag, bucket) — the shuffle carries |flags|×{WMED_BUCKETS} rows,
    never data rows; the half-total crossing bucket is then found by a
    window over that tiny table, and its exact in-bucket price range
    [lo, hi] brackets the true weighted median.  Approximate boundary
    placement ⇒ rows-only driver check; the exact-twin agreement
    (true weighted median ∈ [lo, hi]) is pytest-asserted.

    Bucket assignment is a codegen'd BINARY-SEARCH ``WHEN`` tree over
    the collected boundary literals (the kmeans broadcast-centroid
    pattern: {WMED_BUCKETS}−1 scalars to the driver, size-independent)
    — log₂ comparisons per row inside whole-stage codegen.  The
    interpreted ``aggregate()`` fold over a broadcast boundary array it
    replaced evaluated all {WMED_BUCKETS}−1 CASEs per row and measured
    2.8 s vs 1.0 s at sf0.1 (8.4× vs ~2× at 100× data)."""
    l = load_table(spark, sf_dir, "lineitem")
    qs = [i / WMED_BUCKETS for i in range(1, WMED_BUCKETS)]
    bounds = l.agg(
        F.percentile_approx(
            "l_extendedprice", F.array(*[F.lit(q) for q in qs]), 10_000
        ).alias("bs")
    ).collect()[0].bs  # 63 scalars — the sketch state, never data

    def bucket_of(col, lo: int, hi: int):
        """1-based bucket via balanced binary search of bounds[lo:hi]."""
        if lo == hi:
            return F.lit(lo + 1)
        mid = (lo + hi) // 2
        return F.when(
            col > float(bounds[mid]), bucket_of(col, mid + 1, hi)
        ).otherwise(bucket_of(col, lo, mid))

    per_bucket = (
        l.select(
            "l_returnflag",
            bucket_of(F.col("l_extendedprice"), 0, len(bounds)).alias(
                "bucket"
            ),
            "l_extendedprice",
            "l_quantity",
        )
        .groupBy("l_returnflag", "bucket")
        .agg(
            F.sum("l_quantity").alias("w"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )
    w_ord = Window.partitionBy("l_returnflag").orderBy("bucket")
    w_all = Window.partitionBy("l_returnflag")
    cum = per_bucket.select(
        "l_returnflag",
        "bucket",
        "lo",
        "hi",
        F.sum("w").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    return (
        cum.where(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min_by("lo", "bucket").alias("median_lo"),
            F.min_by("hi", "bucket").alias("median_hi"),
            F.round(F.max("tw"), 2).alias("total_weight"),
        )
        # no ORDER BY: 3 output rows don't justify a global sort in the
        # plan contract; consumers sort presentation-side
    )


# ------------------------------------------------------ Welch's t-test


def ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ab_test: Welch's unequal-variance t-test between every pair of
    event types on ``value`` — the A/B-experiment readout (t statistic +
    Welch–Satterthwaite degrees of freedom + a 5% two-sided flag).

    Scale shape: ONE two-phase aggregate reduces the data to a
    |types|-row moment table; the pair join is over that tiny table
    (broadcast, |types|² bounded by the alphabet, not the data).  This
    is the always-right way to run statistical tests on an engine: tests
    consume sufficient statistics, never rows.  Exactness: the moments
    are rounded at source (engine-dependent accumulation), so both twins
    evaluate the identical formula on identical inputs."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.avg("value"), 6).alias("m"),
        F.round(F.var_samp("value"), 6).alias("s2"),
    )
    a, b = stats.alias("a"), stats.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.event_type") < F.col("b.event_type")
    )
    se1 = F.col("a.s2") / F.col("a.n")
    se2 = F.col("b.s2") / F.col("b.n")
    t = (F.col("a.m") - F.col("b.m")) / F.sqrt(se1 + se2)
    dof = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (F.col("a.n") - 1) + se2 * se2 / (F.col("b.n") - 1)
    )
    return pairs.select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.n").cast("long").alias("n_a"),
        F.col("b.n").cast("long").alias("n_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 4).alias("dof"),
        (F.abs(t) > 1.96).alias("significant_5pct"),
    )


AB_TEST_SQL = """
WITH stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE)    AS n,
         ROUND(AVG(value), 6)        AS m,
         ROUND(var_samp(value), 6)   AS s2
  FROM events GROUP BY event_type
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       ROUND((a.m - b.m) / sqrt(a.s2 / a.n + b.s2 / b.n), 6) AS t_stat,
       ROUND((a.s2 / a.n + b.s2 / b.n) * (a.s2 / a.n + b.s2 / b.n)
             / ((a.s2 / a.n) * (a.s2 / a.n) / (a.n - 1)
                + (b.s2 / b.n) * (b.s2 / b.n) / (b.n - 1)), 4) AS dof,
       abs((a.m - b.m) / sqrt(a.s2 / a.n + b.s2 / b.n)) > 1.96
         AS significant_5pct
FROM stats a JOIN stats b ON a.event_type < b.event_type
"""


QUERIES = {
    # never driver-checked (new in r2) → first, inside the bounded window
    "q_ab_test": ab_test,
    "q_agg_weighted_median": agg_weighted_median,
    "q_agg_weighted_median_approx": agg_weighted_median_approx,  # rows-only (sketch)
    "q_agg_mode": agg_mode,
    "q_agg_sketch_distinct": agg_sketch_distinct,
    "q_agg_incremental": agg_incremental,
    "q_agg_unpivot": agg_unpivot,
    "q_agg_stats": agg_stats,
    "q_agg_histogram": agg_histogram,
    "q_agg_histogram_eq": agg_histogram_eq,
    "q_agg_histogram_approx": agg_histogram_approx,  # rows-only (sketch)
    "q_agg_groupby": tpch_q1,
    "q_agg_quantile": agg_quantile,
    "q_agg_distinct": agg_distinct,
    "q_agg_approx_distinct": agg_approx_distinct,
    "q_agg_rollup": agg_rollup,
    "q_agg_cube": agg_cube,
    "q_agg_gsets": agg_grouping_sets,
    "q_agg_pivot": agg_pivot,
}

ORACLE = {
    "q_ab_test": AB_TEST_SQL,
    "q_agg_weighted_median": AGG_WEIGHTED_MEDIAN_SQL,
    "q_agg_mode": AGG_MODE_SQL,
    "q_agg_incremental": AGG_INCREMENTAL_SQL,
    "q_agg_unpivot": AGG_UNPIVOT_SQL,
    "q_agg_stats": AGG_STATS_SQL,
    "q_agg_histogram": AGG_HISTOGRAM_SQL,
    "q_agg_histogram_eq": AGG_HISTOGRAM_EQ_SQL,
    "q_agg_groupby": TPCH_Q1_SQL,
    "q_agg_quantile": AGG_QUANTILE_SQL,
    "q_agg_distinct": AGG_DISTINCT_SQL,
    # q_agg_approx_distinct: approximate — rows-only check (no oracle).
    "q_agg_rollup": AGG_ROLLUP_SQL,
    "q_agg_cube": AGG_CUBE_SQL,
    "q_agg_gsets": AGG_GSETS_SQL,
    "q_agg_pivot": AGG_PIVOT_SQL,
}
