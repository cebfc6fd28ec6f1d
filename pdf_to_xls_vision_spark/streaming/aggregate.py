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
  implemented with ``applyInPandasWithState`` (custom state = the
  per-user session list; closed sessions emit downstream).

**Event-time semantics (round 3).** The sessionizer is purely
event-time driven: a session is emitted only once the watermark has
passed ``session_end + gap`` — the point after which no admissible
event (every event is >= watermark) could extend or bridge it. Until
then it is held in state, so

- *when* a session closes depends only on event times and watermark
  progression, never on wall clock (``EventTimeTimeout``, not
  ``ProcessingTimeTimeout``);
- a replay of the same input produces the identical set of session
  rows regardless of micro-batch boundaries (batching shifts *which
  batch* emits a row, not its values);
- late events within the watermark merge into — and may bridge —
  existing sessions (``last = max(last, epoch)``; an event landing
  between two held sessions within one gap of both fuses them).

State is bounded: sessions are held only while
``last + gap >= watermark``, i.e. at most ``ceil(watermark_delay /
gap) + 1`` sessions per active user, each 4 longs.

Both operators are pure plan builders: they accept any streaming
DataFrame, so tests drive them with a file stream and availableNow
triggers.
"""

from __future__ import annotations

from collections.abc import Iterator
from zoneinfo import ZoneInfo

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800  # M1/sessionize convention: 30-minute gap

#: Default watermark: how long the sessionizer waits (in event time)
#: for stragglers before a session becomes final. One gap is the
#: natural choice — an on-time event stream then finalizes each
#: session as soon as the stream moves one gap past it.
SESSION_WATERMARK = "30 minutes"


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
#: Held sessions as parallel arrays (sorted by start): bounded by the
#: watermark-lag-over-gap ratio per user, not by history.
_STATE_SCHEMA = (
    "starts array<long>, lasts array<long>, ns array<long>, vms array<long>"
)


def merge_events_into_sessions(
    sessions: list[tuple[int, int, int, int]],
    events: list[tuple[int, int]],
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> list[tuple[int, int, int, int]]:
    """Pure event-time session merge (unit-testable, no Spark).

    ``sessions`` are (start, last, n, value_milli) intervals whose
    internal events chain with gaps <= ``gap_seconds``; ``events``
    are (epoch, value_milli) points. Returns the merged session list
    sorted by start: each event either extends a session (late events
    included — ``last`` only ever grows via max), bridges two sessions
    into one, or opens a new singleton.
    """
    merged = sorted(sessions) + sorted(
        (e, e, 1, vm) for e, vm in events
    )
    merged.sort()
    out: list[tuple[int, int, int, int]] = []
    for s in merged:
        if out and s[0] - out[-1][1] <= gap_seconds:
            p = out[-1]
            out[-1] = (p[0], max(p[1], s[1]), p[2] + s[2], p[3] + s[3])
        else:
            out.append(s)
    return out


def _sessionize_group_fn(tz: str, gap_seconds: int = SESSION_GAP_SECONDS):
    """Build the stateful function with the session timezone and gap in
    the closure (Arrow hands the worker tz-naive *session-local* wall
    times; watermark / emitted rows need true epochs)."""
    zone = ZoneInfo(tz)

    def to_epoch(ts: pd.Series) -> list[int]:
        # DST edges of a zone like America/New_York make some local wall
        # times ambiguous (fall-back hour maps to two instants) or
        # nonexistent (spring-forward hour maps to none). The naive
        # local times Arrow hands us have already lost which instant
        # Spark meant, so resolve deterministically instead of raising
        # mid-stream: ambiguous -> standard time (the later instant),
        # nonexistent -> shifted forward past the DST jump. Replays make
        # the identical choice, preserving replay determinism.
        import numpy as np

        loc = ts.dt.tz_localize(
            zone,
            ambiguous=np.zeros(len(ts), dtype=bool),
            nonexistent="shift_forward",
        )
        return (loc.dt.tz_convert("UTC").astype("int64") // 1_000_000_000).tolist()

    def from_epoch(epoch: int) -> pd.Timestamp:
        return (
            pd.Timestamp(epoch, unit="s", tz="UTC")
            .tz_convert(zone)
            .tz_localize(None)
        )

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        sessions: list[tuple[int, int, int, int]] = []
        if state.exists:
            starts, lasts, ns, vms = state.get
            sessions = list(zip(starts, lasts, ns, vms))

        if not state.hasTimedOut:
            events: list[tuple[int, int]] = []
            for b in batches:
                epochs = to_epoch(b["ts"])
                millis = [int(v * 1000 // 1) for v in b["value"]]
                events.extend(zip(epochs, millis))
            sessions = merge_events_into_sessions(
                sessions, events, gap_seconds
            )

        # A session is final once the watermark passes last + gap: any
        # future admissible event has epoch >= watermark > last + gap,
        # so it can neither extend nor bridge into the session.
        wm_sec = state.getCurrentWatermarkMs() // 1000
        closed = [s for s in sessions if s[1] + gap_seconds < wm_sec]
        held = [s for s in sessions if s[1] + gap_seconds >= wm_sec]

        if held:
            state.update(tuple(list(col) for col in zip(*held)))
            # wake when the watermark passes the earliest held session's
            # finalization point (margin keeps it strictly > watermark)
            state.setTimeoutTimestamp(
                (min(s[1] for s in held) + gap_seconds) * 1000 + 1000
            )
        elif state.exists:
            state.remove()

        if closed:
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": from_epoch(s),
                        "session_end": from_epoch(e),
                        "n_events": n,
                        "value_milli": vm,
                    }
                    for s, e, n, vm in closed
                ]
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = SESSION_WATERMARK,
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> DataFrame:
    """Custom stateful operator: per-user session assembly over an
    unbounded event stream (the streaming counterpart of the batch
    ``m1_sessionize_window`` query), fully event-time driven.

    ``withWatermark`` bounds lateness (older rows are dropped by the
    engine) and drives ``EventTimeTimeout``: a session row is emitted
    exactly when the watermark passes ``session_end + gap`` — never on
    a wall clock, so replaying the same input yields identical session
    rows whatever the micro-batch boundaries.

    ``gap_seconds`` (inactivity split) and ``watermark`` (how long, in
    event time, to wait for stragglers) are the two deployment knobs;
    state per active user is bounded by ``ceil(watermark / gap) + 1``
    sessions of 4 longs each.
    """
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    tz = events.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    ) or "UTC"
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            _sessionize_group_fn(tz, gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
