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
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
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
       SUM(value) AS sum_value
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
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
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
       SUM(value)                      AS sum_value
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


QUERIES = {
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
}
