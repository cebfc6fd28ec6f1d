"""Streaming token heavy-hitters: trending terms per event-time window.

The ingest-side "what is suddenly frequent" view (trending vocabulary,
spam-burst detection, template outbreaks) a document feed needs next to
its dedup pass: explode tokens map-side into a watermarked windowed
count, and emit only the terms whose FINAL per-window count clears a
threshold.

Semantics and scale shape:

- The explode is map-only (flatMap shape) — token rows never carry the
  document payload, only (ts, word).
- One watermarked hash aggregate on (window, word): partial
  (map-side) aggregation absorbs each micro-batch's token burst before
  the shuffle; state is bounded by watermark eviction, not history.
- Append mode + the threshold filter AFTER the aggregate means a term
  is emitted exactly once per window, with its exact final count, only
  when the watermark proves the window closed — no retractions, no
  approximate counts (this is the exact-threshold form of "heavy
  hitters"; the sketch-based alternative for when even (window, word)
  state is too large is the batch count-min in functions/sketches.py).
- Threshold semantics are GLOBAL per (window, word) — identical to the
  batch ``GROUP BY ... HAVING count(*) >= T``, which is exactly what
  the registered availableNow parity query proves cross-engine.

No reference counterpart (the reference is a sequential file
converter); part of the training-data-pipeline streaming family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    min_count: int = 100,
) -> DataFrame:
    """Exact per-window heavy hitters over a streaming document feed.

    Returns ``(window_start, window_end, word, n)`` for every token
    whose final count within its event-time window is ``>= min_count``.
    Pure plan builder (tests and the parity query drive it with a file
    stream + availableNow).
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    words = F.explode(
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    ).alias("word")
    return (
        docs.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), words)
        .groupBy(F.window(ts_col, window_duration).alias("win"), "word")
        .agg(F.count("*").cast("long").alias("n"))
        .where(F.col("n") >= min_count)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "word",
            "n",
        )
    )
