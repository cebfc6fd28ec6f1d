"""Single-pass table profiling: per-column stats and histograms.

The ``ANALYZE TABLE``-shaped operators a pipeline runs before
planning a 100 TB job — null rates, exact distinct counts, ranges,
and value histograms — expressed so ONE scan of the fact table
profiles every requested column (the naive per-column loop reads the
table once per column; at 100 TB that multiplies the scan bill by the
column count).

Exactness: distinct counts are exact (``count(distinct)``), min/max
are selections (no float accumulation), and histogram bucketing uses
``floor(value / width)`` — a single IEEE double division + floor that
every engine computes identically (the shipping-priority float lesson:
never *accumulate* doubles across engines; single-expression
transforms are safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile ``(col_name, n_rows, n_null, n_distinct,
    min_val, max_val)`` for numeric columns, in ONE pass.

    The table is melted — each row explodes into one ``(col_name,
    value)`` pair per requested column (values cast to double) — and a
    single aggregate keyed by ``col_name`` computes every stat. One scan,
    one shuffle whose key cardinality is ``len(cols)``; map-side
    combine reduces each map partition to ``len(cols)`` partial rows,
    so the melt's row multiplication never reaches the exchange.
    ``n_distinct`` is exact and excludes NULLs (both engines' DISTINCT
    semantics).
    """
    if not cols:
        raise ValueError("cols must name at least one column")
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(c).cast("double").alias("value"),
            )
            for c in cols
        ]
    )
    melted = df.select(F.explode(pairs).alias("p")).select("p.*")
    return melted.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("value")).alias("n_null"),
        F.count_distinct("value").alias("n_distinct"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
    )


def numeric_histogram(
    df: DataFrame, col: str, width: float
) -> DataFrame:
    """Equi-width histogram of a numeric column: ``(bucket, lo, n,
    bucket_min, bucket_max)`` where ``bucket = floor(value / width)``
    and ``lo = bucket * width`` is the bucket's left edge. NULLs are
    excluded. One map-side-combined aggregate; bucket count is bounded
    by the value range, not the row count, so the shuffle carries
    metadata-scale rows at any corpus size.
    """
    if width <= 0:
        raise ValueError("width must be positive")
    b = F.floor(F.col(col).cast("double") / F.lit(float(width)))
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min(F.col(col).cast("double")).alias("bucket_min"),
            F.max(F.col(col).cast("double")).alias("bucket_max"),
        )
        .select(
            "bucket",
            (F.col("bucket") * F.lit(float(width))).alias("lo"),
            "n",
            "bucket_min",
            "bucket_max",
        )
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    *,
    buckets: int = 8,
    quant_scale: int = 1000,
) -> DataFrame:
    """Equi-depth (equi-height) histogram — the optimizer-statistics
    companion of :func:`numeric_histogram`'s equi-width buckets: bucket
    edges are DISCRETE percentiles of the data (actual values, integer-
    quantized, so the edges are cross-engine exact), and each bucket
    holds ~1/``buckets`` of the rows (exactly equal only when values
    are distinct; ties land in the lower bucket, the ANSI
    percentile_disc convention).

    Scale shape: ONE percentile aggregate produces the ``buckets - 1``
    cut points as a single metadata row (broadcast by construction);
    bucket assignment is a map-only sum of boundary comparisons; final
    counts are one hash aggregate on the bucket id. Never a global
    sort, never a per-value shuffle beyond the count aggregate.

    Returns ``(bucket, n_rows, lo_q, hi_q)`` — lo/hi are the observed
    quantized min/max inside each bucket.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    vq = F.floor(F.col(value_col) * quant_scale).cast("long")
    base = df.select(vq.alias("vq")).where(F.col("vq").isNotNull())
    cuts = base.agg(
        *[
            F.expr(
                f"percentile_disc({i / buckets}) WITHIN GROUP (ORDER BY vq)"
            )
            .cast("long")
            .alias(f"c{i}")
            for i in range(1, buckets)
        ]
    )
    bucket = None
    for i in range(1, buckets):
        step = F.when(F.col("vq") > F.col(f"c{i}"), 1).otherwise(0)
        bucket = step if bucket is None else bucket + step
    return (
        base.join(F.broadcast(cuts))
        .select(bucket.cast("int").alias("bucket"), "vq")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("vq").alias("lo_q"),
            F.max("vq").alias("hi_q"),
        )
    )


def winsorize_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    lo_eighths: int = 1,
    hi_eighths: int = 7,
) -> DataFrame:
    """Per-group winsorization report — clip a numeric column to its
    group's [lo, hi] discrete percentiles and report how much mass
    moved (the numeric-feature hygiene pass run before a value column
    feeds training: sensor spikes / fat-finger amounts get pinned to
    robust bounds instead of dropped).

    Cut fractions are eighths (``lo_eighths/8``, ``hi_eighths/8``) so
    every boundary probability is an exact binary double and the
    engines' ``cume_dist >= p`` comparisons agree bit-for-bit (the
    equidepth-histogram / quality-ensemble convention);
    ``percentile_disc`` picks ACTUAL data values, so bounds and
    clipped sums stay integer-exact end to end (values enter as
    floor-milli integers).

    Scale shape: one per-group ``percentile_disc`` aggregate (group
    cardinality rows — metadata scale for real group keys), broadcast
    back on the group key, map-only clipping, one final per-group hash
    aggregate. Never a global sort or rank window over the fact rows.

    Returns per group: ``(group, n_rows, lo_bound_milli,
    hi_bound_milli, n_clipped_lo, n_clipped_hi, sum_milli,
    sum_winsorized_milli)``.
    """
    if not 0 <= lo_eighths < hi_eighths <= 8:
        raise ValueError("need 0 <= lo_eighths < hi_eighths <= 8")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.floor(F.col(value_col) * 1000).cast("long").alias("v_milli"),
    )
    bounds = base.groupBy("grp").agg(
        F.expr(
            f"percentile_disc({lo_eighths}/8) WITHIN GROUP (ORDER BY v_milli)"
        ).alias("lo_b"),
        F.expr(
            f"percentile_disc({hi_eighths}/8) WITHIN GROUP (ORDER BY v_milli)"
        ).alias("hi_b"),
    )
    w = F.greatest("lo_b", F.least("hi_b", F.col("v_milli")))
    return (
        base.join(F.broadcast(bounds), "grp")
        .select(
            "grp",
            "v_milli",
            "lo_b",
            "hi_b",
            w.alias("w_milli"),
        )
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("lo_b").cast("long").alias("lo_bound_milli"),
            F.min("hi_b").cast("long").alias("hi_bound_milli"),
            F.sum((F.col("v_milli") < F.col("lo_b")).cast("long"))
            .cast("long")
            .alias("n_clipped_lo"),
            F.sum((F.col("v_milli") > F.col("hi_b")).cast("long"))
            .cast("long")
            .alias("n_clipped_hi"),
            F.sum("v_milli").cast("long").alias("sum_milli"),
            F.sum("w_milli").cast("long").alias("sum_winsorized_milli"),
        )
    )
