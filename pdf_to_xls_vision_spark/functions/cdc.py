"""CDC / MERGE-INTO: apply a keyed change stream to a base table.

The Delta ``MERGE INTO`` / Iceberg upsert analog as a batch operator:
a change set of ``(key, seq, op, payload...)`` rows — ``op='u'``
upsert, ``op='d'`` delete, later ``seq`` wins per key — folds into a
keyed base table to produce the next snapshot. This is the op behind
every incremental-ingest pipeline (and the batch complement of the
streaming ingest sink's per-bucket overwrite commits,
``sink/checkpoint.py``).

Scale shape: ONE hash-aggregate collapses the change stream to its
last-writer row per key (``max_by`` on ``seq`` — all partial-agg,
map-side combined, so a hot key's churn never becomes a one-reducer
window), then ONE full-outer shuffle join with the base on the key.
Nothing driver-side, nothing all-pairs; both shuffles are on the same
key. Deterministic by contract: ``seq`` must be unique per key (CDC
streams carry an LSN/offset that is).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    seq: str,
    op: str = "op",
    payload_cols: Sequence[str],
) -> DataFrame:
    """Fold ``changes`` into ``base``; returns the next snapshot with
    columns ``(key, *payload_cols)``.

    Per key, the change row with the greatest ``seq`` decides:
    ``'d'`` drops the key, ``'u'`` writes its payload (an upsert —
    inserting when the base has no row, exactly MERGE's
    when-not-matched-then-insert arm). Keys without changes pass
    through.
    """
    last = changes.groupBy(key).agg(
        F.max_by(F.col(op), F.col(seq)).alias("_op"),
        *[
            F.max_by(F.col(c), F.col(seq)).alias(f"_c_{c}")
            for c in payload_cols
        ],
    )
    # an unknown op code (a typo'd 'U', an upstream 'i' insert code)
    # must raise, not silently fall through the keep predicate below
    # as a delete — that is data loss with no error
    last = last.withColumn(
        "_op",
        F.when(F.col("_op").isin("u", "d"), F.col("_op")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("cdc_apply: unknown op code (expected "),
                    F.lit("'u' or 'd'): "),
                    F.coalesce(F.col("_op"), F.lit("NULL")),
                )
            ).cast("string")
        ),
    )
    joined = base.join(last, key, "full_outer")
    kept = joined.where(F.col("_op").isNull() | (F.col("_op") == "u"))
    return kept.select(
        key,
        *[
            F.when(F.col("_op") == "u", F.col(f"_c_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload_cols
        ],
    )
