"""Temporal / changelog operators over the events stream.

The reference engine is a batch dump converter with no notion of time
(/root/reference/src/main.rs handles DATETIME only as a cast target);
these are the event-time operators every warehouse built *on top of* such
ingested data needs: gap-based sessionization, changelog compaction
(upsert materialization), slowly-changing-dimension history, and
time-range windowed aggregation.

Scale shapes — all four are single-shuffle-per-key designs:
* Every operator partitions by ``user_id`` once; sessionize chains two
  window functions over the *same* partitioning (Catalyst reuses the sort
  and exchange — one shuffle, not three), then feeds the session group-by
  which is co-partitioned.
* Changelog compaction is the canonical CDC pattern: ``row_number() = 1``
  over (key, desc order) — one shuffle of the changelog, never a
  self-join against max(ts).
* The time-range window orders by event-time *microseconds* so the frame
  is computed on a monotone long — RangeFrame needs a numeric sort key,
  and microseconds matches the engines' shared timestamp precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

# ------------------------------------------------------------- sessionize

#: Gap threshold that closes a session (median inter-event gap in the
#: fixture stream is ~7.7 h, so 6 h yields a non-trivial session mix).
SESSION_GAP_HOURS = 6
_GAP_MICROS = SESSION_GAP_HOURS * 3600 * 1_000_000


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sessionize: batch gap-based sessionization.

    A new session opens when the gap since the user's previous event
    exceeds the threshold; session ids are the running count of session
    opens.  Both windows and the final group-by share the user_id
    partitioning, so the whole operator is one shuffle.
    """
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]  # event_id breaks equal-ts ties
    w = Window.partitionBy("user_id").orderBy(*order)
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(w)
    opens = F.when(gap.isNull() | (gap > _GAP_MICROS), 1).otherwise(0)
    sessions = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "session_id"
        ),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # Exact: decimal addition is associative, so the sum is
            # accumulation-order-independent in both engines (rounding a
            # double sum is not — it flaked twice at a .5e-6 boundary).
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


SESSIONIZE_SQL = f"""
WITH gapped AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_HOURS} HOUR
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS opens
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id, value,
         -- BIGINT cast: DuckDB's windowed SUM(int) returns HUGEINT,
         -- which its pandas bridge converts to float64 ('1.0' vs the
         -- Spark bigint's '1' — the actual round-2/3 hash red).
         CAST(SUM(opens) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM gapped
)
SELECT user_id, session_id,
       MIN(ts)  AS session_start,
       MAX(ts)  AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# ------------------------------------------------- changelog compaction

def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_merge_upsert: compact a changelog to its latest row per key (the
    materialized state an UPSERT/MERGE sink would hold).

    row_number over (key, time desc) then rank = 1: one shuffle of the
    changelog on the key.  At 100 TB with a date-partitioned changelog
    this runs incrementally per partition and merges against the previous
    snapshot — the full-history form here is the backfill path.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.select(
            "user_id",
            "ts",
            "event_type",
            "value",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("latest_ts"),
            F.col("event_type").alias("latest_type"),
            F.col("value").alias("latest_value"),
        )
    )


MERGE_UPSERT_SQL = """
SELECT user_id, ts AS latest_ts, event_type AS latest_type, value AS latest_value
FROM (
  SELECT user_id, ts, event_type, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
"""


# ------------------------------------------------------------------ SCD2

def scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_scd2: slowly-changing-dimension type-2 history — each event
    opens a validity interval that the user's next event closes.

    lead() over the same (user, time) window; open intervals carry a NULL
    valid_to plus an is_current flag.  One shuffle on the key; appending a
    day of new events only rewrites each key's current row.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


SCD2_SQL = """
SELECT user_id, event_id, event_type AS state,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
         AS is_current
FROM events
"""


# ------------------------------------------------------ time-range window

RANGE_DAYS = 7
_RANGE_MICROS = RANGE_DAYS * 86400 * 1_000_000


def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_win_time_range: per-event trailing-7-day aggregate over event
    time — a RANGE frame (time interval), not a ROWS frame (count), so
    irregular event spacing is handled correctly.

    The frame orders by unix microseconds (RangeFrame needs a numeric,
    monotone sort key); equal-timestamp peers are frame-mates on both
    engines by RANGE semantics.  Window outputs are named ``win_*`` so the
    unique ``event_id`` is the alphabetically-first column — differential
    harnesses that order rows by sorted column name then align
    positionally stay deterministic even though the sums are floats.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_RANGE_MICROS, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.count(F.lit(1)).over(w).alias("win_n_7d"),
        # sum rounded (frame accumulation order is engine-dependent); the
        # avg divides the ROUNDED sum by the exact count, so it is a
        # ratio of two deterministic values — bit-identical by itself
        F.round(F.sum("value").over(w), 6).alias("win_sum_7d"),
        (
            F.round(F.sum("value").over(w), 6) / F.count(F.lit(1)).over(w)
        ).alias("win_avg_7d"),
    )


WIN_TIME_RANGE_SQL = f"""
SELECT user_id, event_id, ts, value,
       COUNT(*)   OVER w AS win_n_7d,
       ROUND(SUM(value) OVER w, 6) AS win_sum_7d,
       ROUND(SUM(value) OVER w, 6) / COUNT(*) OVER w AS win_avg_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL {RANGE_DAYS} DAY PRECEDING AND CURRENT ROW)
"""


# ----------------------------------------------------------------- EWMA

#: Smoothing factor: y_t = (1-α)·y_{t-1} + α·x_t, seeded y_1 = x_1
#: (pandas ``ewm(alpha, adjust=False)`` semantics).
EWMA_ALPHA = 0.2


def ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ewma: per-user exponentially-weighted moving average of event
    values over event time — the canonical *recursive* per-key stream
    statistic no Spark window frame can express (each output depends on
    the previous output, not on a frame of inputs).

    This is the sanctioned escape hatch used correctly: ``applyInPandas``
    per user, vectorized inside the batch by pandas' C ``ewm`` scan —
    one shuffle on the key, O(rows/key) memory, no per-row Python.  The
    oracle computes the same recursion in closed form
    (y_t = (1-α)^(t-1)·x_1 + Σ α·(1-α)^(t-k)·x_k); both results are
    rounded to 6 decimals — the iterative and closed forms differ in
    float accumulation order by construction, and values are O(100) so
    drift (~1e-12) sits far below the 5e-7 rounding boundary.
    """
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )

    def _ewma_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf["ewma_value"] = (
            pdf["value"].ewm(alpha=EWMA_ALPHA, adjust=False).mean().round(6)
        )
        return pdf[["user_id", "event_id", "ts", "ewma_value"]]

    return e.groupBy("user_id").applyInPandas(
        _ewma_group,
        "user_id long, event_id long, ts timestamp, ewma_value double",
    )


EWMA_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT o.user_id, o.event_id, o.ts,
       ROUND((SELECT SUM(x.value * CASE WHEN x.rn = 1
                                        THEN pow(1 - {EWMA_ALPHA}, o.rn - 1)
                                        ELSE {EWMA_ALPHA} * pow(1 - {EWMA_ALPHA}, o.rn - x.rn)
                                   END)
              FROM ordered x
              WHERE x.user_id = o.user_id AND x.rn <= o.rn), 6) AS ewma_value
FROM ordered o
"""


# -------------------------------------------- hierarchical time rollup


def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_time_rollup: multi-resolution time-bucket rollup — hour, day,
    month, and grand-total grains of the events stream in ONE pass, the
    hypertable "continuous aggregate" ladder (TimescaleDB / Druid
    rollup) expressed as ROLLUP over nested ``date_trunc`` grains.

    One Expand + one partial-aggregated hash shuffle computes all four
    grains; at 100 TB this is the nightly rollup-maintenance job, and
    the per-grain sums are mergeable states (see q_agg_incremental for
    the delta-merge discipline).  ``sum_value`` is rounded (events.value
    is a 2-decimal double — accumulation order is engine-dependent);
    counts and bucket keys are exact."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.date_trunc("month", "ts").alias("bucket_month"),
            F.date_trunc("day", "ts").alias("bucket_day"),
            F.date_trunc("hour", "ts").alias("bucket_hour"),
            "value",
        )
        .rollup("bucket_month", "bucket_day", "bucket_hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


TIME_ROLLUP_SQL = """
SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_month,
       CAST(date_trunc('day', ts) AS TIMESTAMP)   AS bucket_day,
       date_trunc('hour', ts)                     AS bucket_hour,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY ROLLUP (CAST(date_trunc('month', ts) AS TIMESTAMP),
                 CAST(date_trunc('day', ts) AS TIMESTAMP),
                 date_trunc('hour', ts))
"""


# ------------------------------------------------------------- CDC apply

#: Deterministic tombstone rule for the synthetic changelog: every 20th
#: event_id is a DELETE, the rest are UPSERTs.  Integer modulo — both
#: engines derive the identical op column.
CDC_DELETE_MOD = 20


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_cdc_apply: materialize the current state from an ordered CDC
    changelog with delete tombstones — the Debezium-feed → lakehouse-
    table primitive (events = the changelog, user_id = the key, every
    {CDC_DELETE_MOD}th event a DELETE).

    Unlike q_merge_upsert's window form, compaction here is a PARTIAL
    AGGREGATE: ``max_by(struct(op, ts, value), struct(ts, event_id))``
    reduces each map task to one candidate row per key before the
    shuffle, so the exchange carries |keys| rows instead of the full
    changelog (struct-typed max_by plans as SortAggregate — the map-side
    sort is on the grouping key only, and the two-phase shape, asserted
    in tests/test_plans.py, is what lets a 100 TB changelog compact
    through a cores-bounded shuffle).  Keys
    whose final op is the tombstone drop AFTER the aggregate (a deleted
    key must still consume its earlier versions).  (ts, event_id) is a
    unique ordering per key, so the selected row — and its pass-through
    stored double — is deterministic, bit-exact in both engines.  The
    DuckDB twin is the independent row_number-desc formulation."""
    e = load_table(spark, sf_dir, "events")
    ch = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_id") % CDC_DELETE_MOD == 0, "D")
        .otherwise("U")
        .alias("op"),
    )
    latest = ch.groupBy("user_id").agg(
        F.max_by(
            F.struct("op", "ts", "value"), F.struct("ts", "event_id")
        ).alias("last")
    )
    return latest.where(F.col("last.op") != "D").select(
        "user_id",
        F.col("last.ts").alias("last_ts"),
        F.col("last.value").alias("last_value"),
    )


CDC_APPLY_SQL = f"""
SELECT user_id, ts AS last_ts, value AS last_value
FROM (
  SELECT user_id, ts, value,
         CASE WHEN event_id % {CDC_DELETE_MOD} = 0 THEN 'D' ELSE 'U' END AS op,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1 AND op <> 'D'
"""


QUERIES = {
    "q_cdc_apply": cdc_apply,
    "q_sessionize": sessionize,
    "q_time_rollup": time_rollup,
    "q_merge_upsert": merge_upsert,
    "q_scd2": scd2,
    "q_win_time_range": win_time_range,
    "q_ewma": ewma,
}

ORACLE = {
    "q_cdc_apply": CDC_APPLY_SQL,
    "q_sessionize": SESSIONIZE_SQL,
    "q_time_rollup": TIME_ROLLUP_SQL,
    "q_merge_upsert": MERGE_UPSERT_SQL,
    "q_scd2": SCD2_SQL,
    "q_win_time_range": WIN_TIME_RANGE_SQL,
    "q_ewma": EWMA_SQL,
}
