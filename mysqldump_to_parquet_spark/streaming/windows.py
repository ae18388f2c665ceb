"""Event-time window aggregations over the ``events`` table.

``F.window`` / ``F.session_window`` evaluate identically in batch and
streaming — the batch forms here are the DuckDB-checkable twins of the
true Structured Streaming pipelines in ``stream.py`` (same expressions,
plus watermark).  SURVEY.md §2.2 "Streaming".

Scale: tumbling/sliding windows are plain hash aggregates on
(window, keys) — two-phase, shuffle carries one row per group.  Session
windows shuffle on user_id and sort within partition (Spark's
UpdatingSessionsExec); the DuckDB oracle is the classic gap-islands SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts per event type."""
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # rounded: cross-engine double-sum accumulation order
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


STREAM_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts)                   AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       COUNT(*)   AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event in 4 windows)."""
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "15 minutes")
    return (
        e.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


STREAM_SLIDING_SQL = """
WITH slid AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes'
           AS window_start
  FROM events, generate_series(0, 3) AS k(k)
)
SELECT window_start,
       window_start + INTERVAL '1 hour' AS window_end,
       COUNT(*) AS n_events
FROM slid
GROUP BY 1, 2
"""


def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user.

    Spark session semantics: start = first event, end = last event + gap;
    the oracle derives the same via lag() gap-islands.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # rounded: cross-engine double-sum accumulation order
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


STREAM_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         -- >= : Spark's session end (last event + gap) is EXCLUSIVE, so an
         -- event exactly gap-after its predecessor starts a new session
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts)                         AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*)                        AS n_events,
       ROUND(SUM(value), 6)            AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup shape: first-seen per (user_id, event_type).

    Projected to the dedup keys so the result is deterministic (which
    physical row survives ``dropDuplicates`` is not); the streaming form is
    ``dropDuplicates`` + watermark in ``stream.py``.
    """
    e = load_table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )


STREAM_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""


# ------------------------------------------------- resample + gap fill


def resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_resample_locf: regularize each user's event stream onto an hourly
    grid with last-observation-carried-forward — the hypertable
    rollup/gap-fill operator time-series stores ship natively
    (TimescaleDB ``time_bucket_gapfill`` + ``locf``).

    Shape: (1) hourly aggregate — two-phase, one row per (user, bucket);
    (2) per-user grid via ``explode(sequence(t0, t1, 1h))`` — rows
    proportional to the span, generated map-side after a tiny per-user
    min/max agg; (3) left join grid↔hourly — both sides repartitioned on
    ``user_id`` ALONE, which satisfies the join's clustering requirement
    (a subset of the equi-keys) and, crucially, is exactly the LOCF
    window's partitioning, so (4) the running ``last(ignorenulls)``
    reuses the join exchange instead of re-shuffling the full grid.
    No global sort, no skew beyond per-user event volume (AQE splits
    hot users).
    The grid starts at each user's first event, so bucket 0 is never null
    and LOCF needs no leading-edge default."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        # rounded: double sum accumulation order is engine-dependent, and
        # LOCF carries the value forward across the whole grid
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    span = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    ).repartition("user_id")
    joined = grid.join(hourly.repartition("user_id"), ["user_id", "bucket"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("sum_value", ignorenulls=True).over(w).alias("value_locf"),
    )


RESAMPLE_LOCF_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS t0,
         date_trunc('hour', max(ts)) AS t1
  FROM events GROUP BY user_id
), grid AS (
  SELECT user_id,
         unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS bucket
  FROM span
)
SELECT g.user_id, g.bucket,
       COALESCE(h.n_events, 0) AS n_events,
       last_value(h.sum_value IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.bucket
               ROWS UNBOUNDED PRECEDING) AS value_locf
FROM grid g LEFT JOIN hourly h USING (user_id, bucket)
"""


def stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_stream_attribution: the batch twin of the stream-stream interval
    join (``streaming/stream.py::interval_join_stream``) — each purchase
    matched to the same user's views in the preceding 6 hours, counted
    per purchase.

    This is the exact computation the watermarked streaming version must
    emit (asserted row-for-row in tests/test_streaming.py); registering
    the batch form gives the attribution semantics a hash-checked driver
    row.  Plan: both sides equi-join on user_id (one co-partitioned
    shuffle) with the time bounds as a residual — at 100 TB the bin-
    blocked form (q_join_interval) replaces the residual when per-user
    fan-in is large."""
    from ..catalog import load_table
    from .stream import split_views_purchases

    views, purchases = split_views_purchases(load_table(spark, sf_dir, "events"))
    return (
        views.join(
            purchases,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 6 HOURS")),
        )
        .groupBy(F.col("p_user").alias("user_id"), "purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_attributed_views"),
            F.min("view_id").alias("first_view_id"),
        )
        .orderBy("user_id", "purchase_id")
    )


STREAM_ATTRIBUTION_SQL = """
SELECT p.user_id, p.event_id AS purchase_id,
       COUNT(*)        AS n_attributed_views,
       MIN(v.event_id) AS first_view_id
FROM events p
JOIN events v
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 6 HOUR
WHERE p.event_type = 'purchase'
GROUP BY p.user_id, p.event_id
ORDER BY p.user_id, purchase_id
"""


QUERIES = {
    # never driver-checked (new in r2) → first, inside the bounded window
    "q_resample_locf": resample_locf,
    "q_stream_attribution": stream_attribution,
    "q_stream_tumbling": stream_tumbling,
    "q_stream_sliding": stream_sliding,
    "q_stream_session": stream_session,
    "q_stream_dedup": stream_dedup,
}

ORACLE = {
    "q_stream_tumbling": STREAM_TUMBLING_SQL,
    "q_stream_sliding": STREAM_SLIDING_SQL,
    "q_stream_session": STREAM_SESSION_SQL,
    "q_stream_dedup": STREAM_DEDUP_SQL,
    "q_resample_locf": RESAMPLE_LOCF_SQL,
    "q_stream_attribution": STREAM_ATTRIBUTION_SQL,
}
