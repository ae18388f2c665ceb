"""Event-sequence analytics: ordered funnels and cohort retention.

The two product-analytics queries every event warehouse runs daily; both
are pure composition of groupBy/join/window — no Python, no explode.

* **Funnel** — users progressing view → click → purchase IN ORDER.  Each
  stage's entry time is the earliest qualifying event strictly after the
  previous stage's entry, so a purchase before a click does not count.
  Plan: one conditional aggregate per stage on the same ``user_id``
  grouping key, chained through joins that stay co-partitioned on that
  key — three aggregates, but one logical shuffle partitioning reused
  end-to-end (the sort-merge exchanges after the first reuse its layout;
  per-user state is two timestamps, never the event list).
* **Cohort retention** — users bucketed by first-seen week, counted
  distinct per (cohort, weeks-since).  Two aggregates: first-seen per
  user (shuffle on user), then the (cohort × offset) count shuffle whose
  key space is weeks² — tiny regardless of corpus size.

At 100 TB: both shuffle raw events once on ``user_id``; everything after
operates on one-row-per-user tables (|users| ≪ |events|).  Skewed power
users bound per-task work only through their own event count — the same
bound sessionization (temporal.py) has.  No reference counterpart (the
reference has no query surface); net-new per SURVEY §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

#: Ordered funnel stages over ``events.event_type``.
FUNNEL_STAGES = ("view", "click", "purchase")


def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_funnel: strictly-ordered three-stage funnel over ``events`` —
    per-stage user counts and step conversion rates.

    Stage n's entry time is ``min(ts)`` over events of stage n's type
    with ``ts`` strictly after the user's stage n-1 entry; users who
    perform stages out of order are counted only up to where the order
    breaks.  All three stage aggregates group on ``user_id``, so the
    chained joins never reshuffle a different key."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        e.where(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == FUNNEL_STAGES[1])
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == FUNNEL_STAGES[2])
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n_stage1"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_stage2")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_stage3")))
    )
    return counts.select(
        "n_stage1",
        "n_stage2",
        "n_stage3",
        (F.col("n_stage2").cast("double") / F.col("n_stage1")).alias("conv_1_2"),
        (F.col("n_stage3").cast("double") / F.col("n_stage2")).alias("conv_2_3"),
        (F.col("n_stage3").cast("double") / F.col("n_stage1")).alias("conv_1_3"),
    )


FUNNEL_SQL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT n_stage1, n_stage2, n_stage3,
       CAST(n_stage2 AS DOUBLE) / n_stage1 AS conv_1_2,
       CAST(n_stage3 AS DOUBLE) / n_stage2 AS conv_2_3,
       CAST(n_stage3 AS DOUBLE) / n_stage1 AS conv_1_3
FROM (SELECT COUNT(*) AS n_stage1 FROM s1),
     (SELECT COUNT(*) AS n_stage2 FROM s2),
     (SELECT COUNT(*) AS n_stage3 FROM s3)
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_cohort_retention: weekly retention triangle — users grouped by
    first-seen week, distinct-counted per weeks-since-cohort.

    First aggregate pins each user's cohort week (min ts, truncated to
    Monday); the join back to events stays on ``user_id``; the final
    distinct-count shuffles (cohort_week, week_no, user) — bounded by
    |users| × weeks, not by event volume."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        e.join(first, "user_id")
        .select(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_no"),
            "user_id",
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_no")
    )


COHORT_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
       CAST(date_diff('day', CAST(f.cohort_week AS DATE),
                      CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS BIGINT)
         AS week_no,
       COUNT(DISTINCT e.user_id) AS n_active
FROM events e JOIN first f ON e.user_id = f.user_id
GROUP BY 1, 2
ORDER BY cohort_week, week_no
"""


# ------------------------------------------------- transition matrix


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_event_transitions: first-order Markov transition matrix over
    per-user event sequences — (from_type → to_type) counts and row-
    normalized probabilities, the sequence-mining primitive behind
    next-action prediction and anomalous-flow detection.

    Scale shape: ONE (user_id) exchange feeds the lead window (ordered
    by ts with event_id tiebreak — timestamps collide); the pair count
    is a two-phase hash aggregate on the tiny (from, to) alphabet; the
    row totals come from a second window over that aggregate (no join).
    Probability = exact-integer ratio — one division, deterministic, no
    rounding needed."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(wo).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wrow = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double") / F.sum("n").over(wrow).cast("double")
        ).alias("p"),
    )


EVENT_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)
         AS p
FROM counts
"""


QUERIES = {
    "q_funnel": funnel,
    "q_cohort_retention": cohort_retention,
    "q_event_transitions": event_transitions,
}

ORACLE = {
    "q_funnel": FUNNEL_SQL,
    "q_cohort_retention": COHORT_RETENTION_SQL,
    "q_event_transitions": EVENT_TRANSITIONS_SQL,
}
