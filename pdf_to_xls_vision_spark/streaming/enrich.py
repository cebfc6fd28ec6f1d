"""Stream-static enrichment join.

The fourth standard streaming shape after ingest / windowed agg /
stateful sessionize / watermarked dedup: enrich an unbounded event
stream with a bounded dimension table (user registry, domain
reputation, language allowlist). Spark supports stream-static joins
natively; the operator's value is pinning the *scale-right* plan:

- the static side is wrapped in ``broadcast()`` — a stream-static join
  that shuffles the stream side repartitions every micro-batch on the
  join key, while a broadcast dim costs one executor-local hash table
  per batch and leaves the stream partitioning untouched;
- the static side is re-read every micro-batch by Spark's semantics
  (a restarted dim table picks up dimension updates without restarting
  the query) — callers with a slowly-changing dim get that for free,
  callers with a hot path should persist the dim relation themselves;
- ``how`` is restricted to the modes Spark allows for stream-left
  static-right joins (``inner``/``left``), so misuse fails at plan
  build, not at query start.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALLOWED = ("inner", "left")


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: Column | list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Join a streaming DataFrame against a static dimension with the
    dimension broadcast. ``on`` is any Spark join spec (column names
    or a join Column). The stream side must be the left side."""
    if how not in _ALLOWED:
        raise ValueError(
            f"how must be one of {_ALLOWED} for a stream-static join, "
            f"got {how!r}"
        )
    if not stream.isStreaming:
        raise ValueError("left side must be a streaming DataFrame")
    if dim.isStreaming:
        raise ValueError("dimension side must be a static DataFrame")
    return stream.join(F.broadcast(dim), on, how)
