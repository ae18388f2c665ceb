"""As-of (temporal) join — a first-class operator Spark lacks natively.

Semantics: for each left row, attach the *latest* right row with the same
key whose timestamp is ≤ the left row's timestamp (backward as-of, inclusive
— the shape DuckDB's ``ASOF JOIN`` and pandas ``merge_asof`` implement).

Naive formulations explode: an inequality join ``l.key = r.key AND r.ts <=
l.ts`` produces O(|matches|) intermediate rows before the per-left max.
This implementation is the scalable distributed form:

1. tag both inputs and union them (no join at all),
2. one shuffle: window partitioned by key, ordered by (ts, side),
3. ``last(value, ignorenulls=True)`` over the unbounded-preceding frame
   carries the most recent right-side values forward onto left rows.

Cost: exactly one shuffle of |L| + |R| rows and one in-partition sort —
the same lower bound a sort-merge equi-join pays.  Skewed keys are handled
by AQE; at 100 TB both sides can also be pre-bucketed by key to make the
shuffle a no-op.

An ``applyInPandas``/``merge_asof`` per-key variant was considered and
rejected for the default path: it moves every row through Arrow into Python
and back for an operation the JVM window operator already expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns all ``left`` columns plus ``value_cols`` from the latest
    ``right`` row per key with ``right_ts <= left_ts`` (NULLs when no such
    row).  ``tiebreak`` (a right-side column, e.g. its unique id) makes the
    choice among equal-timestamp right rows deterministic.
    """
    right_value_types = {f.name: f.dataType for f in right.schema.fields}
    left_types = {f.name: f.dataType for f in left.schema.fields}
    left_only = [c for c in left.columns if c not in on]

    order_cols = [_TS, _SIDE] + ([f"__tb_{tiebreak}"] if tiebreak else [])

    l2 = left.select(
        *on,
        *[F.col(c) for c in left_only],
        *[
            F.lit(None).cast(right_value_types[c]).alias(f"__v_{c}")
            for c in value_cols
        ],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *(
            [F.lit(None).cast(right_value_types[tiebreak]).alias(f"__tb_{tiebreak}")]
            if tiebreak
            else []
        ),
    )
    r2 = right.select(
        *on,
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_only],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *([F.col(tiebreak).alias(f"__tb_{tiebreak}")] if tiebreak else []),
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(*[F.col(c).asc_nulls_first() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l2.unionByName(r2).select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    return (
        carried.where(F.col(_SIDE) == 1)
        .select(
            *on,
            *left_only,
            *[F.col(f"__asof_{c}").alias(f"{c}_asof") for c in value_cols],
        )
    )


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_join_asof: for each purchase event, the latest click by the same
    user at or before the purchase (classic attribution query)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.col("value").alias("click_value")
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_id", "click_value"],
        tiebreak="click_id",
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.col("click_id_asof").alias("last_click_id"),
        F.col("click_value_asof").alias("last_click_value"),
    )


JOIN_ASOF_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, event_id AS click_id, value AS click_value
  FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.event_id, p.ts,
       (SELECT c.click_id FROM clicks c
        WHERE c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.click_id DESC LIMIT 1) AS last_click_id,
       (SELECT c.click_value FROM clicks c
        WHERE c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.click_id DESC LIMIT 1) AS last_click_value
FROM purchases p
"""


# ------------------------------------------- nearest (bidirectional) as-of

#: Match tolerance for the nearest-event join (µs): a candidate farther
#: than this in either direction is no match.
NEAREST_TOL_US = 6 * 3600 * 1_000_000


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_join_asof_nearest: for each purchase, the click by the same user
    NEAREST in time (either direction) within a 6 h tolerance — the
    bidirectional variant kdb's ``wj`` / pandas ``merge_asof
    (direction='nearest')`` implement, which Spark lacks natively.

    Same union-and-window shape as the backward as-of — ONE shuffle of
    |L|+|R| rows — with two in-partition sorts over the same exchange:
    an ascending scan carries the latest click ≤ ts forward, a descending
    scan carries the earliest click ≥ ts backward, and a row-local CASE
    picks the closer candidate (ties prefer the backward match; equal-ts
    clicks break on click_id — every choice selects an *element*, so the
    result hash-checks exactly with no float surface).
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    l2 = purchases.select(
        "user_id",
        "event_id",
        F.col("ts").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__cid"),
    )
    r2 = clicks.select(
        "user_id",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("__ts"),
        F.lit(0).alias("__side"),
        F.col("click_id").alias("__cid"),
    )
    u = l2.unionByName(r2)
    us = F.unix_micros("__ts")
    # ascending scan: at equal ts the click (side 0) precedes the purchase
    # (backward-inclusive); among equal-ts clicks the LAST scanned wins in
    # last(), so ordering clicks by __cid ASC makes the max id the carried
    # one — mirrored in the oracle's ORDER BY ... ts DESC, click_id DESC
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__cid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # descending scan: at equal ts the click still precedes the purchase
    # (forward-inclusive); among equal-ts clicks __cid DESC makes the MIN
    # id the carried one — mirrored by ORDER BY ts ASC, click_id ASC
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__ts").desc(), F.col("__side").asc(), F.col("__cid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cid = F.when(F.col("__side") == 0, F.col("__cid"))
    cts = F.when(F.col("__side") == 0, us)
    scanned = u.select(
        "user_id",
        "event_id",
        "__ts",
        "__side",
        F.last(cid, ignorenulls=True).over(wb).alias("__b_id"),
        F.last(cts, ignorenulls=True).over(wb).alias("__b_us"),
        F.last(cid, ignorenulls=True).over(wf).alias("__f_id"),
        F.last(cts, ignorenulls=True).over(wf).alias("__f_us"),
    )
    p = scanned.where(F.col("__side") == 1)
    db = us - F.col("__b_us")
    df_ = F.col("__f_us") - us
    b_ok = F.col("__b_us").isNotNull() & (db <= NEAREST_TOL_US)
    f_ok = F.col("__f_us").isNotNull() & (df_ <= NEAREST_TOL_US)
    pick_b = b_ok & (~f_ok | (db <= df_))
    return p.select(
        "user_id",
        "event_id",
        F.col("__ts").alias("ts"),
        F.when(pick_b, F.col("__b_id"))
        .when(f_ok, F.col("__f_id"))
        .alias("nearest_click_id"),
        F.when(pick_b, db).when(f_ok, df_).alias("delta_us"),
        F.when(pick_b, F.lit("backward"))
        .when(f_ok, F.lit("forward"))
        .alias("direction"),
    )


JOIN_ASOF_NEAREST_SQL = f"""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, event_id AS click_id
  FROM events WHERE event_type = 'click'
), cand AS (
  SELECT p.user_id, p.event_id, p.ts,
         (SELECT c.click_id FROM clicks c
          WHERE c.user_id = p.user_id AND c.ts <= p.ts
          ORDER BY c.ts DESC, c.click_id DESC LIMIT 1) AS b_id,
         (SELECT epoch_us(c.ts) FROM clicks c
          WHERE c.user_id = p.user_id AND c.ts <= p.ts
          ORDER BY c.ts DESC, c.click_id DESC LIMIT 1) AS b_us,
         (SELECT c.click_id FROM clicks c
          WHERE c.user_id = p.user_id AND c.ts >= p.ts
          ORDER BY c.ts ASC, c.click_id ASC LIMIT 1) AS f_id,
         (SELECT epoch_us(c.ts) FROM clicks c
          WHERE c.user_id = p.user_id AND c.ts >= p.ts
          ORDER BY c.ts ASC, c.click_id ASC LIMIT 1) AS f_us
  FROM purchases p
)
SELECT user_id, event_id, ts,
       CASE WHEN b_us IS NOT NULL AND epoch_us(ts) - b_us <= {NEAREST_TOL_US}
                 AND (f_us IS NULL OR f_us - epoch_us(ts) > {NEAREST_TOL_US}
                      OR epoch_us(ts) - b_us <= f_us - epoch_us(ts))
            THEN b_id
            WHEN f_us IS NOT NULL AND f_us - epoch_us(ts) <= {NEAREST_TOL_US}
            THEN f_id END AS nearest_click_id,
       CASE WHEN b_us IS NOT NULL AND epoch_us(ts) - b_us <= {NEAREST_TOL_US}
                 AND (f_us IS NULL OR f_us - epoch_us(ts) > {NEAREST_TOL_US}
                      OR epoch_us(ts) - b_us <= f_us - epoch_us(ts))
            THEN epoch_us(ts) - b_us
            WHEN f_us IS NOT NULL AND f_us - epoch_us(ts) <= {NEAREST_TOL_US}
            THEN f_us - epoch_us(ts) END AS delta_us,
       CASE WHEN b_us IS NOT NULL AND epoch_us(ts) - b_us <= {NEAREST_TOL_US}
                 AND (f_us IS NULL OR f_us - epoch_us(ts) > {NEAREST_TOL_US}
                      OR epoch_us(ts) - b_us <= f_us - epoch_us(ts))
            THEN 'backward'
            WHEN f_us IS NOT NULL AND f_us - epoch_us(ts) <= {NEAREST_TOL_US}
            THEN 'forward' END AS direction
FROM cand
"""


QUERIES = {
    "q_join_asof": join_asof,
    "q_join_asof_nearest": join_asof_nearest,
}
ORACLE = {
    "q_join_asof": JOIN_ASOF_SQL,
    "q_join_asof_nearest": JOIN_ASOF_NEAREST_SQL,
}
