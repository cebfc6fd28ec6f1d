"""Streaming aggregation operators: watermarked windowed aggregates and
a custom stateful sessionizer.

The ingest stage (streaming/ingest.py) wires extraction into
``foreachBatch`` for exactly-once sink commits; these operators cover
the other two Structured Streaming shapes the engine needs at corpus
scale:

- :func:`windowed_event_counts` — classic ``withWatermark`` + window
  aggregate. Late rows within the watermark revise their window; rows
  later than the watermark are dropped and their window's state is
  evicted (bounded state — the property that matters on an unbounded
  10^12-doc ingest feed).
- :func:`sessionize_stream` — the M1 continuation-merge analog over an
  unbounded stream: per-key sessions split on inactivity gaps,
  implemented with ``applyInPandasWithState`` (custom state = the open
  session; closed sessions emit downstream). Event-time-ordered within
  each micro-batch; the open session survives in ``GroupState``
  across batches and restarts (checkpointed).

Both operators are pure plan builders: they accept any streaming
DataFrame, so tests drive them with a file stream and availableNow
triggers.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800  # M1/sessionize convention: 30-minute gap


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "30 minutes",
    watermark: str = "1 hour",
    key_col: str = "event_type",
) -> DataFrame:
    """Per-(window, key) event counts + value sum with late-data
    handling: rows later than ``watermark`` behind the max seen event
    time are dropped, which bounds aggregation state on an unbounded
    stream. Output (append mode) emits a window only once it can no
    longer change."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("win"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000)).alias("value_milli"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "value_milli",
        )
    )


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, value_milli long"
)
_STATE_SCHEMA = "start long, last long, n int, value_milli long"


def _sessionize_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this key's new events (event-time order) into the open
    session; emit every session closed by a >gap inactivity or by the
    processing-time timeout firing with no new data."""
    user_id = key[0]

    if state.hasTimedOut:
        if state.exists:
            start, last, n, vm = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start, unit="s"),
                        "session_end": pd.Timestamp(last, unit="s"),
                        "n_events": n,
                        "value_milli": vm,
                    }
                ]
            )
        return

    events: list[tuple[int, int]] = []  # (epoch, value_milli)
    for b in batches:
        epochs = (b["ts"].astype("int64") // 1_000_000_000).tolist()
        millis = [int(v * 1000 // 1) for v in b["value"]]
        events.extend(zip(epochs, millis))
    events.sort()

    start, last, n, vm = state.get if state.exists else (None, None, 0, 0)
    closed = []
    for epoch, milli in events:
        if start is None:
            start, last, n, vm = epoch, epoch, 1, milli
        elif epoch - last > SESSION_GAP_SECONDS:
            closed.append((start, last, n, vm))
            start, last, n, vm = epoch, epoch, 1, milli
        else:
            last, n, vm = epoch, n + 1, vm + milli
    if start is not None:
        state.update((start, last, n, vm))
        # flush the open session if no new event arrives for one gap
        state.setTimeoutDuration(SESSION_GAP_SECONDS * 1000)

    if closed:
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(s, unit="s"),
                    "session_end": pd.Timestamp(e, unit="s"),
                    "n_events": cnt,
                    "value_milli": v,
                }
                for s, e, cnt, v in closed
            ]
        )


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
) -> DataFrame:
    """Custom stateful operator: per-user session assembly over an
    unbounded event stream (the streaming counterpart of the batch
    ``m1_sessionize_window`` query). State = the open session per user
    (4 longs — bounded by distinct active users, not by history);
    closed sessions append downstream. Processing-time timeout flushes
    sessions idle for one gap."""
    return events.groupBy(user_col).applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
