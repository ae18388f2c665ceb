"""Interval analytics: distributed sweep-line concurrency (SURVEY §2.2
extension surface — temporal/interval operators).

The classic "how many intervals are open at time t" query (concurrent
sessions, open orders, active connections) is a sweep-line: +1 at each
start, -1 at each end, running sum over time.  The naive distributed
formulation is a global-order window — an Exchange SinglePartition that
funnels every event through one consumer.  This module implements the
scalable two-phase shape instead:

1. **date-grain pre-aggregation**: deltas collapse to one net row per
   distinct date (map-side partial combine does most of the work), so
   everything downstream is bounded by the *calendar*, not the data —
   a century of dates is ~36.5k rows no matter how many billions of
   intervals;
2. **partitioned running sum**: a window partitioned by year (≤366 rows
   per partition, calendar-bounded state);
3. **cross-year offsets**: cumulative totals of whole years via a tiny
   triangle join over |years| rows (broadcast, no single-partition
   window), added back to each year's local running sum.

At 100 TB: phase 1 is the only stage that touches data volume, and it
is a partial-aggregated shuffle on the date key; phases 2–3 operate on
calendar-bounded row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_interval_concurrency: number of open order-fulfillment windows
    at every change date.

    Interval per order: [o_orderdate, o_orderdate + (o_orderkey % 7 + 1)
    days) — a deterministic synthetic duration so the fixture has real
    overlap structure.  Output: one row per date where the open count
    changes, with the count after that date's changes apply.
    """
    o = load_table(spark, sf_dir, "orders")
    days = (F.col("o_orderkey") % 7 + 1).cast("int")
    iv = o.select(
        F.to_date("o_orderdate").alias("s"),
        F.date_add("o_orderdate", days).alias("e"),
    )
    return open_interval_counts(iv)


def open_interval_counts(iv: DataFrame) -> DataFrame:
    """The reusable sweep-line core: ``iv`` is any DataFrame with date
    columns ``s`` (interval opens, inclusive) and ``e`` (interval
    closes — the first date it no longer counts as open).  Returns one
    row per change date with the open count after that date applies.
    Rows with a NULL endpoint are not intervals and are dropped (the
    filter is a plain column predicate — it pushes to the scan).
    See the module docstring for the two-phase distributed shape."""
    iv = iv.where(F.col("s").isNotNull() & F.col("e").isNotNull())
    # both deltas from ONE scan (an unionAll of two projections would
    # read the interval table twice — 2× the scan volume at 100 TB)
    pair = F.array(
        F.struct(F.col("s").alias("d"), F.lit(1).alias("delta")),
        F.struct(F.col("e").alias("d"), F.lit(-1).alias("delta")),
    )
    deltas = iv.select(F.explode(pair).alias("x")).select("x.d", "x.delta")
    # phase 1: date-grain net change — the only data-volume stage.
    # Persisted: three consumers (running sum, year totals, year keys)
    # would otherwise each re-run the full-volume aggregate; the cached
    # result is calendar-bounded (one row per distinct date).
    net = (
        deltas.groupBy("d")
        .agg(F.sum("delta").cast("long").alias("nd"))
        .persist()
    )
    # phase 2: running sum within each year (≤366 rows of state)
    w_year = (
        Window.partitionBy(F.year("d"))
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = net.withColumn("run_local", F.sum("nd").over(w_year))
    # phase 3: whole-year totals, cumulated by a |years|² triangle join
    # (broadcast both sides — no single-partition window anywhere)
    totals = net.groupBy(F.year("d").alias("y")).agg(
        F.sum("nd").cast("long").alias("ytot")
    )
    prev = totals.select(F.col("y").alias("py"), F.col("ytot").alias("ptot"))
    offsets = (
        totals.join(F.broadcast(prev), F.col("py") < F.col("y"), "left")
        .groupBy("y")
        .agg(F.coalesce(F.sum("ptot"), F.lit(0)).cast("long").alias("off"))
    )
    return (
        local.join(F.broadcast(offsets), F.year("d") == F.col("y"))
        .select("d", (F.col("run_local") + F.col("off")).alias("open_cnt"))
        .orderBy("d")
    )


INTERVAL_CONCURRENCY_SQL = """
WITH iv AS (
  SELECT o_orderdate::DATE AS s,
         (o_orderdate + INTERVAL (o_orderkey % 7 + 1) DAY)::DATE AS e
  FROM orders
),
deltas AS (
  SELECT s AS d, 1 AS delta FROM iv
  UNION ALL
  SELECT e AS d, -1 AS delta FROM iv
),
net AS (
  SELECT d, CAST(SUM(delta) AS BIGINT) AS nd FROM deltas GROUP BY d
)
SELECT d, CAST(SUM(nd) OVER (ORDER BY d) AS BIGINT) AS open_cnt
FROM net
ORDER BY d
"""


QUERIES = {
    "q_interval_concurrency": interval_concurrency,
}

ORACLE = {
    "q_interval_concurrency": INTERVAL_CONCURRENCY_SQL,
}
