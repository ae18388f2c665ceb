"""Custom stateful streaming operator via ``applyInPandasWithState``.

Per-user running session stats that survive across micro-batches: state =
(n_events, total_value, last_ts); emits one updated row per user per
batch.  This is the §2.2 "custom stateful operator" slot — the pattern any
bespoke accumulator (fraud counters, rate limits, CDC folding) follows.

State sizing: keyed by user_id, a fixed-width tuple per key.  For
production replays enable ``evict_idle=True``: idle keys time out via
ProcessingTimeTimeout and are removed, keeping the state store finite.
(Timeout ticks continuously schedule micro-batches, so finite drive-to-
completion tests — ``processAllAvailable`` — run with eviction off.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_ts timestamp"

IDLE_TIMEOUT_MS = 3600 * 1000


def _make_update_fn(evict_idle: bool):
    def update_user(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if evict_idle and state.hasTimedOut:
            state.remove()
            return
        n, total, last_ts = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((n, total, last_ts))
        if evict_idle:
            state.setTimeoutDuration(IDLE_TIMEOUT_MS)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last_ts],
            }
        )

    return update_user


def user_running_stats(events: DataFrame, evict_idle: bool = False) -> DataFrame:
    """Attach the stateful operator to an event stream (update mode)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(evict_idle),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
