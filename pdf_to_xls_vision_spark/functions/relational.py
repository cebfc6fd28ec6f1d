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


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_bits: int = 4032,
    k: int = 3,
    salt: str = "bloomjoin",
    how: str = "inner",
) -> DataFrame:
    """Inner/semi join of ``fact`` to ``dim`` on ``key`` with an
    explicit Bloom-filter pre-filter on the fact side — the pattern
    behind Spark's runtime row-level bloom join
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``), built here
    from the repo's verified portable bloom (functions/sketches.py) so
    the pruning structure itself is deterministic and testable.

    Result is EXACTLY the plain join: the bloom has no false
    negatives, and false positives only survive the pre-filter to be
    dropped by the real join — so the DuckDB oracle is the join itself.

    When it pays: dim is too big to broadcast as rows (so the join
    must shuffle BOTH sides) but its bloom fits in memory — n_bits of
    filter summarize any number of dim keys. The fact side then sheds
    non-matching rows BEFORE its shuffle, cutting exchange volume by
    the non-match fraction. At toy scale Spark would broadcast dim
    anyway; the operator exists for the 10^12-row fact / 10^8-row dim
    regime.

    The built filter words are collected to the driver (``<= n_bits/63``
    longs — metadata by the repo's rule, same as k-means centroids)
    and inlined as a small literal array (64 longs at the default
    sizing — nowhere near the round-4 large-codebook regime).

    Round 6: the ``k`` bit positions derive from native ``xxhash64``
    via Kirsch–Mitzenmacher double hashing — ``pos_i = (h1 + i·h2)
    mod n_bits`` — on BOTH build and probe sides. The bloom's
    internal hash needs only build/probe consistency (the result is
    the exact join either way, which is what the oracle checks), so
    the portable-but-expensive md5→conv chain is not required here;
    xxhash64 is ~50x cheaper per row, which also makes the
    optimizer's habit of duplicating pushed-down filter expressions
    harmless. The round-5 form additionally attached the words as a
    one-row broadcast relation, which planned as a
    BroadcastNestedLoopJoin whose (non-codegen) join condition
    re-evaluated every md5 twice — 6 md5+conv per probed row; the
    literal-array + xxhash64 form is a plain codegen Filter at the
    scan. Measured 12.0 → 0.6 executor-s on the sf0.1 probe.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError("bloom_prefilter_join supports inner/left_semi")

    def _h12(col):
        # Kirsch–Mitzenmacher double hashing from two native xxhash64
        # draws, each pre-reduced mod n_bits so position arithmetic
        # can never overflow int64 under ANSI mode. The bloom's
        # internal hash needs only build/probe consistency (the
        # result is the exact join either way), so the portable-but-
        # expensive md5 chain is not required here — xxhash64 is
        # ~50x cheaper per row, which makes the optimizer's habit of
        # duplicating pushed-down filter expressions harmless.
        h1 = F.pmod(F.xxhash64(col), F.lit(n_bits))
        h2 = F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(n_bits))
        return h1, h2

    h1, h2 = _h12(F.col(key))
    build_pos = F.explode(
        F.array(
            *[(h1 + F.lit(i) * h2) % F.lit(n_bits) for i in range(k)]
        )
    ).alias("pos")
    words = (
        dim.select(key)
        .distinct()
        .select(build_pos)
        .select(
            F.expr("pos div 63").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 63 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    sparse = {int(r["word_idx"]): int(r["word"]) for r in words.collect()}
    dense = [sparse.get(i, 0) for i in range(n_bits // 63)]
    arr_sql = "array(" + ",".join(f"{w}L" for w in dense) + ")"
    h1_sql = f"pmod(xxhash64({key}), {n_bits})"
    h2_sql = f"pmod(xxhash64({key}, '{salt}')," f" {n_bits})"
    pos_sql = [f"(({h1_sql} + {i} * {h2_sql}) % {n_bits})" for i in range(k)]
    cond = " AND ".join(
        f"(element_at({arr_sql}, cast({p} div 63 as int) + 1) "
        f"& shiftleft(1L, cast({p} % 63 as int))) != 0"
        for p in pos_sql
    )
    return fact.where(F.expr(cond)).join(dim, on=key, how=how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: every fact key — hot or not — is spread
    across ``n_salt`` reducers by salting the join key, with the dim
    side replicated ``n_salt``x so every (key, salt) shard still finds
    its match. Result is EXACTLY the plain join (salting only changes
    row placement), so the oracle is the join itself.

    When to reach for it: a shuffled join whose fact side has celebrity
    keys. AQE's skew-join splitting solves this at runtime for
    sort-merge joins; the explicit form is deterministic, auditable in
    the static plan, and applies to shuffled-hash joins too. Cost: the
    dim side ships ``n_salt`` copies — use it when dim is far smaller
    than the hot-key row mass (else broadcast the dim and no salt is
    needed at all).

    The fact salt is content-derived (xxhash64 over the whole row, mod
    ``n_salt``) — deterministic across retries/replays, no
    monotonically_increasing_id nondeterminism; duplicate rows co-lying
    on one salt is harmless (they would co-lie under any per-key
    scheme that keeps replay determinism).
    """
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    fact_s = fact.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salt)
        ).cast("int"),
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return fact_s.join(dim_s, on=[key, "_salt"], how=how).drop("_salt")
