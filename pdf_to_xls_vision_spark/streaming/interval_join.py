"""Stream-stream interval (time-range) join.

The fifth standard streaming shape after ingest / windowed agg /
stateful sessionize / watermarked dedup / stream-static enrich: join
two UNBOUNDED streams on a key where the right event's time falls in a
bounded window after the left event's time — view→purchase attribution,
error→retry correlation, impression→click funnels.

Scale design (this is the one join whose state grows without bound if
mis-specified):

- **both sides carry a watermark** — Spark derives each side's state
  eviction horizon from the other side's watermark plus the time-range
  condition, so a left row is dropped from state exactly when no
  future right row can still match it. Without the range condition the
  state is infinite; this operator refuses to build such a join.
- **the range is explicit** (``lower_seconds``/``upper_seconds`` offsets
  of the right time relative to the left), so per-key state is bounded
  by ``watermark + window`` worth of events regardless of stream rate;
- ``how`` is restricted to ``inner`` — stream-stream outer joins emit
  nulls only as the watermark passes, which makes availableNow batch
  parity depend on micro-batch boundaries; the outer variants are a
  deliberate non-goal until they can be oracled deterministically.

Replay parity contract (what the registered query verifies): with a
watermark wider than the input's full time span, no state is evicted
and an availableNow replay over files emits exactly the batch
inner-join result — match-set equality, the same evidence pattern as
``streaming_dedup_docs``. Production deployments tighten the watermark
to the business lateness bound; matches beyond it are dropped by
design (documented at-most-once boundary on very-late data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = 0,
    upper_seconds: int = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join two streams on ``key`` where ``right_ts`` lies in
    ``[left_ts + lower_seconds, left_ts + upper_seconds]``.

    Column names must already be disjoint apart from ``key`` (rename
    before joining); ``left_ts``/``right_ts`` name each side's
    event-time column after any rename. Both sides get
    ``withWatermark`` on their time column with the same ``watermark``
    lateness bound.
    """
    if not (left.isStreaming and right.isStreaming):
        raise ValueError("interval_join_streams requires two streaming sides")
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    overlap = set(left.columns) & set(right.columns) - {key}
    if overlap:
        raise ValueError(
            f"ambiguous columns {sorted(overlap)}: rename before joining"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (
            F.col(right_ts)
            >= F.col(left_ts) + F.expr(f"INTERVAL {lower_seconds} SECONDS")
        )
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper_seconds} SECONDS")
        )
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
