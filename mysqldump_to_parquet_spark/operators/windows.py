"""Window-function operators: ranking, analytic (lag/lead), frames.

Absent from the reference (SURVEY.md §2.1 "explicitly absent").  Windows in
Spark shuffle once on ``partitionBy`` and sort within partitions; all four
queries below share that single-shuffle shape.  Every ORDER BY carries a
unique tiebreaker so ranks/offsets are deterministic under the driver's
value-hash comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank over orders per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 5)
    )


WIN_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER w AS rn,
         RANK()       OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
) t
WHERE rn <= 5
"""


def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each customer's order history (time series step)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w)).alias("delta_prev"),
    )


WIN_LAG_LEAD_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       LAG(o_totalprice, 1)  OVER w AS prev_price,
       LEAD(o_totalprice, 1) OVER w AS next_price,
       o_totalprice - LAG(o_totalprice, 1) OVER w AS delta_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total: ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        # rounded: running-frame double accumulation is engine-dependent
        F.round(F.sum("o_totalprice").over(w), 6).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_orders"),
    )


WIN_RUNNING_SUM_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(SUM(o_totalprice) OVER w, 6) AS running_total,
       COUNT(*)          OVER w AS running_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average: ROWS BETWEEN 2 PRECEDING AND CURRENT ROW."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        # rounded-sum / exact-count: Spark's sliding frame accumulates
        # incrementally (add/remove), DuckDB recomputes — the raw avg's
        # low bits are engine-dependent
        (
            F.round(F.sum("o_totalprice").over(w), 6)
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_3"),
    )


WIN_MOVING_AVG_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(SUM(o_totalprice) OVER w, 6) / COUNT(*) OVER w AS moving_avg_3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def win_ntile_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing + first_value/last_value over a running frame."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.first_value("o_totalprice").over(wf).alias("first_price"),
        F.last_value("o_totalprice").over(wf).alias("latest_price"),
        (F.col("o_totalprice") / F.first_value("o_totalprice").over(wf)).alias(
            "vs_first"
        ),
    )


WIN_NTILE_SQL = """
SELECT o_custkey, o_orderkey,
       NTILE(4) OVER w                   AS quartile,
       FIRST_VALUE(o_totalprice) OVER wf AS first_price,
       LAST_VALUE(o_totalprice) OVER wf  AS latest_price,
       o_totalprice / FIRST_VALUE(o_totalprice) OVER wf AS vs_first
FROM orders
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def win_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_win_cume: distribution window functions — percent_rank /
    cume_dist (empirical CDF position of each order's price within its
    priority class).  Same single-shuffle shape as the other window ops:
    one exchange on the partition key, one sort within partitions; the
    unique o_orderkey tiebreak makes every rank deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


WIN_CUME_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


def win_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_win_ratio: percent-of-total (ratio_to_report) — each nation's
    share of its region's customer balance, via an unbounded window over
    the group.

    The grouped-sum-over-window shape: one exchange on the partition key
    serves both the per-nation aggregate and the region total (the
    region window's partition key is a prefix of the group-by's
    clustering, so no second shuffle).  The naive alternative — aggregate
    then join back to a totals table — costs an extra shuffle and an
    extra join at every scale."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    per_nation = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        # rounded onto the cent grid: group-sum accumulation order is
        # engine-dependent; the window total below is re-rounded so the
        # share is a ratio of two deterministic doubles (bit-identical)
        .agg(F.round(F.sum("c_acctbal"), 6).alias("nation_bal"))
    )
    w = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        "nation_bal",
        (
            F.col("nation_bal") / F.round(F.sum("nation_bal").over(w), 6)
        ).alias("share_of_region"),
    ).orderBy("r_name", "n_name")


WIN_RATIO_SQL = """
SELECT r_name, n_name, nation_bal,
       nation_bal / ROUND(SUM(nation_bal) OVER (PARTITION BY r_name), 6)
         AS share_of_region
FROM (
  SELECT r_name, n_name, ROUND(SUM(c_acctbal), 6) AS nation_bal
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
ORDER BY r_name, n_name
"""


# ------------------------------------------------------ rolling correlation

#: Rolling frame width (rows) for the windowed co-moment statistics.
ROLL_CORR_ROWS = 20


def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_win_rolling_corr: rolling autocorrelation — corr(value, lag-1
    value) over the trailing 20 events per (user, event_type) series,
    the windowed co-moment statistic behind rolling beta /
    regime-change detection.

    Two stacked windows over ONE (user_id, event_type) exchange: the
    lag and the rolling corr share partitioning and ordering, so Spark
    plans a single sort.  The composite key is the 100 TB shape —
    parallelism follows user cardinality, not the 5-value event_type
    alphabet (keying on event_type alone measured 5.0× at 100× data:
    five window partitions serve the whole corpus).  Rows before the
    3rd of each partition are cut in both twins (fewer than 2 lag
    pairs: the zero/one-pair corr is an engine-dependent NULL-vs-NaN
    edge, excluded from the contract).  Frames are ≤20 values, so the
    rounded-to-6 corr is drift-safe."""
    e = load_table(spark, sf_dir, "events")
    order = [F.asc("ts"), F.asc("event_id")]
    wo = Window.partitionBy("user_id", "event_type").orderBy(*order)
    wf = wo.rowsBetween(-(ROLL_CORR_ROWS - 1), Window.currentRow)
    lagged = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        F.lag("value").over(wo).alias("prev_value"),
        F.row_number().over(wo).alias("rn"),
    )
    return (
        lagged.withColumn(
            "roll_corr", F.round(F.corr("value", "prev_value").over(wf), 6)
        )
        .where(F.col("rn") >= 3)
        .select("event_id", "user_id", "event_type", "value", "roll_corr")
    )


WIN_ROLLING_CORR_SQL = f"""
WITH lagged AS (
  SELECT event_id, user_id, event_type, ts, value,
         lag(value) OVER (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) AS prev_value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_id, user_id, event_type, value,
       ROUND(corr(value, prev_value) OVER (
         PARTITION BY user_id, event_type ORDER BY ts, event_id
         ROWS BETWEEN {ROLL_CORR_ROWS - 1} PRECEDING AND CURRENT ROW), 6)
         AS roll_corr
FROM lagged
QUALIFY rn >= 3
"""


# ------------------------------------------------- period-over-period


def win_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_win_period_over_period: month-over-month revenue change per
    order priority — the BI trend primitive (aggregate to the period
    grain, then lag across periods for absolute and % deltas).

    Scale shape: the raw data collapses in ONE two-phase aggregate to a
    (priority × month) table; the lag window runs over that aggregate,
    partitioned by priority — window input is grain-sized, never
    row-sized, and the aggregate's exchange already clusters by the
    window key's prefix.  `mom_pct` is a ratio of two at-source-rounded
    sums: deterministic."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "o_orderpriority",
        "month",
        "revenue",
        (F.col("revenue") - prev).alias("mom_delta"),
        F.round((F.col("revenue") - prev) / prev * 100, 6).alias("mom_pct"),
    )


WIN_PERIOD_OVER_PERIOD_SQL = """
WITH monthly AS (
  SELECT o_orderpriority,
         strftime(o_orderdate, '%Y-%m') AS month,
         ROUND(SUM(o_totalprice), 4) AS revenue
  FROM orders
  GROUP BY o_orderpriority, strftime(o_orderdate, '%Y-%m')
)
SELECT o_orderpriority, month, revenue,
       revenue - lag(revenue) OVER (PARTITION BY o_orderpriority
                                    ORDER BY month) AS mom_delta,
       ROUND((revenue - lag(revenue) OVER (PARTITION BY o_orderpriority
                                           ORDER BY month))
             / lag(revenue) OVER (PARTITION BY o_orderpriority
                                  ORDER BY month) * 100, 6) AS mom_pct
FROM monthly
"""


# ---------------------------------------------- running distinct count


def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_win_running_distinct: running count of distinct users per event
    type over event time — the "cumulative unique visitors" curve.

    COUNT(DISTINCT) OVER a running frame is either unsupported or a
    per-frame set rebuild; the scalable rewrite is the first-seen-flag
    trick: one window marks each (type, user)'s first event, a second
    running-sums the flags.  Both windows order the same way; the flag
    window's (type, user) clustering is a refinement of the outer
    (type) partitioning, so AQE plans the second sort off the first
    exchange.  Integer-exact, tiebreak (ts, event_id).

    Scale note: the running-sum window parallelizes only across
    event_type (5 here) — fine while one type's history fits an
    executor's sort spill.  The 100 TB escape is a segmented scan:
    local running sums within (type, day) chunks + a broadcast prefix
    of per-chunk totals added back — parallelism becomes days×types.
    Measured at sf0.1 the extra agg+join stages cost more than the
    5-way window saves (0.72 s vs 0.57 s), so this exact form stays
    the deployed plan at bench scale and the segmented rewrite is the
    documented escape hatch, not the default."""
    e = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "event_id",
        "event_type",
        "ts",
        "user_id",
        F.when(F.row_number().over(w_first) == 1, 1)
        .otherwise(0)
        .alias("first_seen"),
    )
    return flagged.select(
        "event_id",
        "event_type",
        F.sum("first_seen").over(w_run).alias("running_distinct_users"),
    )


def win_running_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_win_running_distinct_daily: cumulative distinct users per event
    type at DAY grain — the scale primary for the "cumulative unique
    visitors" curve (VERDICT r4 item 5).

    The per-event exact form (q_win_running_distinct) running-sums
    first-seen flags inside a window that parallelizes only across
    event_type — 4.0×/100× in SCALING.md because one type's full event
    history must sort in one task.  At day grain the plan inverts into
    aggregation shapes that scale arbitrarily:

    1. ``groupBy(type, user) → min(day)`` — each user's first active day
       (map-side partial agg, one shuffle on high-cardinality keys);
    2. ``groupBy(type, first_day) → count`` — new users per day (tiny);
    3. running sum over days per type — a window over |days|×|types|
       rows (thousands), negligible at any corpus size.

    The exact per-event form remains registered as ground truth; a
    differential pytest pins day-end agreement between the two."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("event_type", "user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = firsts.groupBy("event_type", "first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("first_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_day.select(
        "event_type",
        F.col("first_day").alias("day"),
        F.sum("new_users").over(w).cast("bigint").alias(
            "running_distinct_users"
        ),
    )


WIN_RUNNING_DISTINCT_DAILY_SQL = """
WITH firsts AS (
  SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY event_type, user_id
), per_day AS (
  SELECT event_type, first_day, COUNT(*) AS new_users
  FROM firsts GROUP BY event_type, first_day
)
SELECT event_type, first_day AS day,
       CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY first_day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS running_distinct_users
FROM per_day
"""


WIN_RUNNING_DISTINCT_SQL = """
WITH flagged AS (
  SELECT event_id, event_type, ts, user_id,
         CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, event_type,
       CAST(SUM(first_seen) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS running_distinct_users
FROM flagged
"""


QUERIES = {
    "q_win_running_distinct": win_running_distinct,
    "q_win_running_distinct_daily": win_running_distinct_daily,
    "q_win_period_over_period": win_period_over_period,
    "q_win_rolling_corr": win_rolling_corr,
    "q_win_cume": win_cume,
    "q_win_ratio": win_ratio,
    "q_win_rank": win_rank,
    "q_win_ntile": win_ntile_firstlast,
    "q_win_lag_lead": win_lag_lead,
    "q_win_running_sum": win_running_sum,
    "q_win_moving_avg": win_moving_avg,
}

ORACLE = {
    "q_win_running_distinct": WIN_RUNNING_DISTINCT_SQL,
    "q_win_running_distinct_daily": WIN_RUNNING_DISTINCT_DAILY_SQL,
    "q_win_period_over_period": WIN_PERIOD_OVER_PERIOD_SQL,
    "q_win_rolling_corr": WIN_ROLLING_CORR_SQL,
    "q_win_cume": WIN_CUME_SQL,
    "q_win_ratio": WIN_RATIO_SQL,
    "q_win_rank": WIN_RANK_SQL,
    "q_win_ntile": WIN_NTILE_SQL,
    "q_win_lag_lead": WIN_LAG_LEAD_SQL,
    "q_win_running_sum": WIN_RUNNING_SUM_SQL,
    "q_win_moving_avg": WIN_MOVING_AVG_SQL,
}
