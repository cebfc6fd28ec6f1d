"""Group-wise top-k without the single-reducer-per-group trap.

The textbook ``row_number() OVER (PARTITION BY g ORDER BY v)``+filter
plan funnels EVERY row of a group through one task; with few, huge
groups (5 market segments × 10^12 rows) that is a guaranteed straggler.
:func:`topk_per_group` runs the standard two-phase rewrite instead:
salt → local top-k per (group, salt) shard → exact top-k over the
``k·n_salt`` survivors. Phase 2 sorts at most ``k·n_salt`` rows per
group regardless of input size, so the plan survives a 100× scale-up.

No reference counterpart (the reference has no ranking operator at
all); part of the SURVEY.md §2.12 relational-breadth family.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
    n_salt: int = 16,
    rank_col: str = "rk",
) -> DataFrame:
    """Exact top-``k`` rows per group by ``order_col`` (ties broken by
    ``tiebreak_col``, which callers set to a unique id so the result is
    deterministic), with the two-phase salted plan described above.

    The salt is ``pmod(hash(tiebreak_col), n_salt)`` — deterministic,
    uniform, and independent of row order. Correctness: the global
    top-k of a group is a subset of the union of its per-shard top-k
    for any disjoint sharding, so phase 2 over the survivors is exact.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if n_salt <= 0:
        raise ValueError("n_salt must be positive")
    if tiebreak_col is None:
        raise ValueError(
            "tiebreak_col is required: without a unique tie-break the "
            "k-th rank is nondeterministic under equal order_col values"
        )

    def _order() -> list[Column]:
        lead = F.col(order_col).desc() if descending else F.col(order_col).asc()
        return [lead, F.col(tiebreak_col).asc()]

    salted = df.withColumn(
        "__salt", F.pmod(F.hash(F.col(tiebreak_col)), F.lit(n_salt))
    )
    w_local = Window.partitionBy(*group_cols, "__salt").orderBy(*_order())
    survivors = (
        salted.withColumn("__lrk", F.row_number().over(w_local))
        .filter(F.col("__lrk") <= k)
        .drop("__salt", "__lrk")
    )
    w_final = Window.partitionBy(*group_cols).orderBy(*_order())
    return (
        survivors.withColumn(rank_col, F.row_number().over(w_final))
        .filter(F.col(rank_col) <= k)
    )
