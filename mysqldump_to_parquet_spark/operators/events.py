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


# ---------------------------------------------------- gaps and islands


def streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_streaks: per-user consecutive-active-day streaks — the classic
    gaps-and-islands rewrite (engagement streaks, uptime runs).

    ``date − row_number`` is constant within a consecutive run, so the
    island id falls out of one window over the deduped (user, day)
    grid — no self-join, no recursion.  Scale shape: dedup to the
    (user, day) grain (two-phase aggregate), ONE user-keyed window, one
    (user, island) count, one per-user rollup; every stage keys on
    user_id, so a single exchange's clustering serves the window and
    both aggregates.  Integer/date-exact throughout."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), islands AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS island
  FROM days
), runs AS (
  SELECT user_id, island, COUNT(*) AS len
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       COUNT(*)                 AS n_streaks,
       MAX(len)                 AS longest_streak
FROM runs
GROUP BY user_id
"""


# ------------------------------------------- sequence pattern matching

#: Pattern window: an 'error' followed by a 'purchase' within this many
#: subsequent events of the same user.
PATTERN_LOOKAHEAD = 3


def match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_match_pattern: MATCH_RECOGNIZE-lite — find every 'error' event
    followed by a 'purchase' within the user's next 3 events, emitting
    the anchor and how many steps the recovery took (the
    error-then-converts sequence every funnel-debugging session asks
    for).

    Spark has no MATCH_RECOGNIZE; bounded-lookahead patterns compile to
    lead() columns over ONE user-keyed window — per-row JVM work after a
    single exchange, no self-join against the sequence.  (Unbounded
    patterns become a sessionized aggregation instead; the bounded form
    is the common fast path.)  Deterministic: (ts, event_id) ordering,
    integer steps."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    leads = e.select(
        "event_id",
        "user_id",
        "event_type",
        *[
            F.lead("event_type", i).over(w).alias(f"t{i}")
            for i in range(1, PATTERN_LOOKAHEAD + 1)
        ],
    )
    steps = F.when(F.col("t1") == "purchase", 1)
    for i in range(2, PATTERN_LOOKAHEAD + 1):
        steps = steps.when(F.col(f"t{i}") == "purchase", i)
    return (
        leads.where(F.col("event_type") == "error")
        .select(
            "event_id",
            "user_id",
            steps.alias("steps_to_purchase"),
        )
        .where(F.col("steps_to_purchase").isNotNull())
    )


MATCH_PATTERN_SQL = """
WITH leads AS (
  SELECT event_id, user_id, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         lead(event_type, 3) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CASE WHEN t1 = 'purchase' THEN 1
            WHEN t2 = 'purchase' THEN 2
            WHEN t3 = 'purchase' THEN 3 END AS steps_to_purchase
FROM leads
WHERE event_type = 'error'
  AND (t1 = 'purchase' OR t2 = 'purchase' OR t3 = 'purchase')
"""


# --------------------------------------------------- conversion latency


def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_conversion_latency: per-user view→purchase latency — each
    purchase paired with the user's MOST RECENT preceding view (the
    within-table as-of pattern: ``last(…, ignorenulls)`` over one user
    window, no self-join), then per-user conversion count and median
    latency.

    Scale shape: ONE user_id exchange; the carry-forward window and the
    final aggregate share its clustering.  Latencies are exact integer
    microsecond differences; the median interpolates exact integers with
    the same lower+frac·(upper−lower) formula in both engines, rounded
    to 6 per repo convention."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    last_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(wo)
    conv = (
        e.withColumn("last_view_ts", last_view)
        .where(
            (F.col("event_type") == "purchase")
            & F.col("last_view_ts").isNotNull()
        )
        .select(
            "user_id",
            (
                F.unix_micros("ts") - F.unix_micros("last_view_ts")
            ).alias("latency_us"),
        )
    )
    return conv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(
            F.percentile("latency_us", F.lit(0.5)) / 1_000_000.0, 6
        ).alias("median_latency_s"),
    )


CONVERSION_LATENCY_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_view_ts
  FROM events
), conv AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(last_view_ts) AS latency_us
  FROM marked
  WHERE event_type = 'purchase' AND last_view_ts IS NOT NULL
)
SELECT user_id,
       COUNT(*) AS n_conversions,
       ROUND(quantile_cont(latency_us, 0.5) / 1000000.0, 6)
         AS median_latency_s
FROM conv
GROUP BY user_id
"""


# ----------------------------------------- multi-touch channel attribution

#: Attribution window and channel count (channel derives from the JSON
#: ``props.k`` — deterministic in both engines).
ATTR_WINDOW_HOURS = 6
ATTR_CHANNELS = 4


def attribution_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_attribution_channels: LINEAR multi-touch attribution — every
    purchase splits one unit of credit equally across the user's
    view/click touches in the preceding {ATTR_WINDOW_HOURS} h, rolled up
    per marketing channel (the JSON ``props.k`` mod {ATTR_CHANNELS} —
    exercising JSON extraction inside an analytic pipeline).

    Complements q_stream_attribution (per-purchase touch counts — the
    stream-stream join twin): this is the *marketing* rollup a spend
    optimizer consumes.  Plan: one user-keyed equi-join with the time
    bound as a residual, a per-purchase count window that reuses the
    join's exchange, then a tiny per-channel aggregate.  Credit
    fractions are exact single divisions; the channel sum is rounded to
    6 per the repo's float-sum oracle convention."""
    e = load_table(spark, sf_dir, "events")
    touches = e.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.pmod(
            F.get_json_object("props", "$.k").cast("int"), ATTR_CHANNELS
        ).alias("channel"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    joined = touches.join(
        purchases,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("t_ts"))
        & (
            F.col("p_ts")
            <= F.col("t_ts") + F.expr(f"INTERVAL {ATTR_WINDOW_HOURS} HOURS")
        ),
    )
    w = Window.partitionBy("purchase_id")
    credited = joined.withColumn(
        "credit", F.lit(1.0) / F.count(F.lit(1)).over(w)
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("purchase_id").alias("n_purchases"),
            F.round(F.sum("credit"), 6).alias("credit"),
        )
        .orderBy("channel")
    )


ATTRIBUTION_CHANNELS_SQL = f"""
WITH touches AS (
  SELECT user_id AS t_user, ts AS t_ts,
         CAST(json_extract_string(props, '$.k') AS INTEGER)
           % {ATTR_CHANNELS} AS channel
  FROM events WHERE event_type IN ('view', 'click')
), purchases AS (
  SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
), joined AS (
  SELECT channel, purchase_id,
         1.0 / COUNT(*) OVER (PARTITION BY purchase_id) AS credit
  FROM touches JOIN purchases
    ON t_user = p_user
   AND p_ts >= t_ts
   AND p_ts <= t_ts + INTERVAL {ATTR_WINDOW_HOURS} HOUR
)
SELECT channel,
       COUNT(*)                     AS n_touches,
       COUNT(DISTINCT purchase_id)  AS n_purchases,
       ROUND(SUM(credit), 6)        AS credit
FROM joined
GROUP BY channel
ORDER BY channel
"""


QUERIES = {
    "q_attribution_channels": attribution_channels,
    "q_funnel": funnel,
    "q_cohort_retention": cohort_retention,
    "q_event_transitions": event_transitions,
    "q_streaks": streaks,
    "q_match_pattern": match_pattern,
    "q_conversion_latency": conversion_latency,
}

ORACLE = {
    "q_attribution_channels": ATTRIBUTION_CHANNELS_SQL,
    "q_funnel": FUNNEL_SQL,
    "q_cohort_retention": COHORT_RETENTION_SQL,
    "q_event_transitions": EVENT_TRANSITIONS_SQL,
    "q_streaks": STREAKS_SQL,
    "q_match_pattern": MATCH_PATTERN_SQL,
    "q_conversion_latency": CONVERSION_LATENCY_SQL,
}
