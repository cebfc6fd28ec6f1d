"""Temporal relational operators Spark lacks as built-ins: as-of join,
banded range join, and ordered-funnel aggregation.

The reference has no temporal operators (its only time-adjacent logic is
the page-order merge, ``excel_writer.py:28-112``), but a training-data
pipeline over event/session/order streams needs them constantly; they
round out SURVEY.md §2.12's "relational categories the reference does
not implement".

Every operator here is a composition of built-in DataFrame ops — no
Python UDFs — so the whole family stays inside whole-stage codegen and
scales by partitioning:

* :func:`asof_join` — ONE shuffle on the join key (the union trick);
  never an inequality join, never a per-key collect.
* :func:`banded_count_join` — inequality-range semantics rewritten as a
  bucket equi-join (explode ≤ ``2 + band/bucket`` candidate buckets per
  probe), so Catalyst plans a hash join instead of a broadcast-nested-
  loop cartesian.
* :func:`funnel_stages` — chained conditional-min aggregations, all
  shuffles on the same user key so co-partitioning is preserved.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each ``left`` row, attach the payload of the
    nearest admissible ``right`` row within the same ``key`` (NULL
    payload when none exists). ``direction='backward'`` (default)
    admits ``right_ts <= left_ts`` and picks the greatest;
    ``direction='forward'`` admits ``right_ts >= left_ts`` and picks
    the smallest.

    Tie-break: among right rows sharing the nearest admissible
    ``right_ts``, backward picks the greatest ``payload_cols`` tuple
    and forward the smallest (lexicographic struct order) — callers
    put a unique id first for determinism.

    Implementation is the union trick: tag both inputs, sort each key
    partition by ``(ts, tag, payload)`` and carry the last non-null
    payload forward with a running window. That is ONE hash shuffle on
    ``key`` + a partition-local sort — the same cost as a groupBy — vs
    the O(|L|·|R|) broadcast-nested-loop plan Catalyst would pick for
    the naive ``l.ts >= r.ts`` inequality join. At 10^12 rows the key
    shuffle is the only viable shape; skewed keys salt exactly like any
    groupBy key.

    The forward direction is the same machinery mirror-image: sort
    descending on ts ("later rows first") so the running
    ``last(ignorenulls)`` picks the SMALLEST admissible ``right_ts``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    pay = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        pay.alias("__p"),
    )
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__tag").asc(), F.col("__p").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__tag").asc(), F.col("__p").desc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # right rows (tag 0) sort strictly before left rows at equal ts, so
    # the equal-ts case is inclusive in both directions; peer left rows
    # all carry null __p and cannot perturb last(ignorenulls) — the
    # result is deterministic even though ROWS-frame peer order is not.
    out = (
        u.withColumn("__asof", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    return out.select(
        *lcols,
        *[F.col(f"__asof.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )


def banded_count_join(
    probes: DataFrame,
    facts: DataFrame,
    *,
    probe_epoch: str,
    fact_epoch: str,
    band_seconds: int,
    bucket_seconds: int,
    out_count: str = "n_in_band",
) -> DataFrame:
    """For every probe row, count fact rows with
    ``|fact_epoch - probe_epoch| <= band_seconds`` (no key equality — a
    pure temporal range join). Both inputs carry epoch-seconds LONG
    columns (callers derive them from NTZ wall-clock fields so the
    result is session-timezone-independent, like the sessionizer).

    The naive formulation is an inequality theta-join → broadcast
    nested loop, O(|P|·|F|). Instead each fact maps to ONE time bucket
    of width ``bucket_seconds`` and each probe explodes to the
    ``⌈band/bucket⌉+1``-ish candidate buckets its window can touch; the
    join becomes a bucket equi-join (hash, shuffle on the bucket key)
    followed by the exact band filter. Each (probe, fact) pair meets at
    most once because a fact lives in exactly one bucket. Bucket width
    tunes the fan-out/selectivity trade: ``bucket ≈ band`` gives ≤3
    candidate buckets per probe and ~3× over-read, the classic banded
    range-join rewrite (Spark's own range-join hints on Databricks do
    the same thing under the hood).
    """
    if band_seconds <= 0 or bucket_seconds <= 0:
        raise ValueError("band_seconds and bucket_seconds must be positive")
    p_epoch = F.col(probe_epoch).cast("long")
    f_epoch = F.col(fact_epoch).cast("long")
    f = facts.select(
        f_epoch.alias("__fe"),
        F.floor(f_epoch / bucket_seconds).alias("__bucket"),
    )
    pcols = probes.columns
    p = probes.select(
        *pcols,
        p_epoch.alias("__pe"),
        F.explode(
            F.sequence(
                F.floor((p_epoch - band_seconds) / bucket_seconds),
                F.floor((p_epoch + band_seconds) / bucket_seconds),
            )
        ).alias("__bucket"),
    )
    joined = p.join(f, "__bucket").filter(
        F.abs(F.col("__fe") - F.col("__pe")) <= band_seconds
    )
    return (
        joined.groupBy(*pcols)
        .agg(F.count("*").alias(out_count))
    )


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel aggregation: per user, the timestamp at which each
    step was first reached, where step k counts only at
    ``ts >= reach(k-1)`` (strictly sequential conversion, the standard
    product-analytics funnel).

    Output: ``(user, t_<step0>, ..., t_<stepN-1>, funnel_depth)`` with
    one row per user that reached step 0; ``t_<stepK>`` is NULL beyond
    the reached depth.

    Shape: step 0 is a conditional-min groupBy; each later step joins
    the (small, per-user) frontier back to the events of that type only
    and takes the min admissible ts. Every shuffle is on ``user_col``,
    so AQE/co-partitioning reuses the exchange; events are filtered to
    one step's type before each join (column/predicate pushdown to the
    scan). No window over all of a user's events, so a power-user with
    10^7 events costs the same as anyone else per stage.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    by_type = {
        s: events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        for s in steps
    }
    reach = (
        by_type[steps[0]]
        .groupBy("__u")
        .agg(F.min("__ts").alias(f"t_{steps[0]}"))
    )
    for prev, cur in zip(steps, steps[1:]):
        nxt = (
            by_type[cur]
            .join(reach.select("__u", f"t_{prev}"), "__u")
            .filter(F.col("__ts") >= F.col(f"t_{prev}"))
            .groupBy("__u")
            .agg(F.min("__ts").alias(f"t_{cur}"))
        )
        reach = reach.join(nxt, "__u", "left")
    depth = sum(
        F.when(F.col(f"t_{s}").isNotNull(), 1).otherwise(0) for s in steps
    )
    return reach.select(
        F.col("__u").alias(user_col),
        *[F.col(f"t_{s}") for s in steps],
        depth.alias("funnel_depth"),
    )


def scd2_from_changelog(
    df: DataFrame,
    *,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Build an SCD type-2 history (the Delta/Iceberg MERGE-into-dim
    pattern) from an append-only change log: collapse consecutive
    identical ``attr`` values per ``key`` into validity intervals
    ``(key, attr, valid_from, valid_to, is_current)`` with
    ``valid_to`` = the next interval's ``valid_from`` (NULL while
    current).

    ``tiebreak`` must make ``(ts, tiebreak)`` a total order within
    each key (e.g. a unique change id) — with duplicate timestamps in
    the log the run structure is otherwise engine-dependent.

    Plan shape: two window passes (change detection, interval close),
    both partitioned by ``key`` — ONE exchange total, no groupBy;
    state per task is bounded by one key's change rows, the
    gaps-and-islands shape that holds at any key cardinality.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    marked = df.select(key, attr, ts, tiebreak).withColumn(
        "_prev", F.lag(attr).over(w)
    )
    starts = marked.where(
        F.col("_prev").isNull() | (F.col(attr) != F.col("_prev"))
    )
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    return starts.select(
        key,
        attr,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
    tolerance: int | None = None,
) -> DataFrame:
    """Nearest as-of join: for each ``left`` row, attach the payload of
    the ``right`` row (same ``key``) whose timestamp is CLOSEST in
    either direction — optionally within ``|right_ts - left_ts| <=
    tolerance`` — with NULL payload when none qualifies. Both ts
    columns must be integer epochs (derive with the epoch-of-wall-clock
    idiom); distances are exact integer arithmetic.

    Tie rules (all deterministic): equal distance on both sides prefers
    the backward (earlier-or-equal) row; among backward rows sharing
    the nearest ts the greatest ``payload_cols`` tuple wins, among
    forward rows the smallest (callers put a unique id first).

    Scale shape: the same union trick as :func:`asof_join` — ONE hash
    shuffle on ``key``, then TWO partition-local sorts (ascending for
    the backward running-last, descending for the forward one; Catalyst
    reuses the exchange across both Window operators since the
    partitioning is identical). Never an inequality join, never a
    per-key collect; skewed keys salt exactly like any groupBy key.
    """
    pay = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).cast("long").alias("__t"),
        F.lit(0).alias("__tag"),
        pay.alias("__p"),
    )
    r = r.select("__k", "__t", "__tag", F.struct("__t", "__p").alias("__tp"))
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(key).alias("__k"),
        F.col(left_ts).cast("long").alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__tp"].dataType).alias("__tp"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__tag").asc(), F.col("__tp").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").desc(), F.col("__tag").asc(), F.col("__tp").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # right rows sort before left rows at equal __t in BOTH directions
    # (tag asc), so an exactly-equal timestamp is admissible both ways
    # (distance 0 -> backward wins by the tie rule); peer left rows
    # carry null __tp and cannot perturb last(ignorenulls).
    scored = (
        u.withColumn("__b", F.last("__tp", ignorenulls=True).over(wb))
        .withColumn("__f", F.last("__tp", ignorenulls=True).over(wf))
        .filter(F.col("__tag") == 1)
    )
    db = F.col("__t") - F.col("__b.__t")
    df_ = F.col("__f.__t") - F.col("__t")
    if tolerance is not None:
        b_ok = F.col("__b").isNotNull() & (db <= F.lit(int(tolerance)))
        f_ok = F.col("__f").isNotNull() & (df_ <= F.lit(int(tolerance)))
    else:
        b_ok = F.col("__b").isNotNull()
        f_ok = F.col("__f").isNotNull()
    pick_forward = f_ok & (~b_ok | (df_ < db))
    chosen = (
        F.when(pick_forward, F.col("__f"))
        .when(b_ok, F.col("__b"))
        .otherwise(F.lit(None).cast(scored.schema["__b"].dataType))
    )
    out = scored.withColumn("__c", chosen)
    return out.select(
        *lcols,
        *[
            F.col(f"__c.__p.{c}").alias(f"{prefix}{c}")
            for c in payload_cols
        ],
        F.abs(F.col("__c.__t") - F.col("__t")).cast("long").alias(f"{prefix}distance"),
    )


def forward_fill(
    df: DataFrame,
    key_col: str,
    order_col: str,
    fill_cols: Sequence[str],
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward (LOCF) gap fill — per key,
    replace NULLs in ``fill_cols`` with the most recent non-null value
    in ``order_col`` order (the standard sparse-sensor / feature-store
    hygiene pass before a time series feeds training; interpolation
    would fabricate values, LOCF only repeats observed ones).

    One window per key (``last(..., ignorenulls=True)`` over the
    unbounded-preceding frame) — a SINGLE shuffle on the key shared by
    every filled column; rows with no prior observation stay NULL (no
    backfill — that would leak the future into features). Pass
    ``tiebreak_col`` when ``order_col`` can tie (equal timestamps
    otherwise make the carried value partitioning-dependent).

    Returns the input columns with each ``c`` in ``fill_cols`` filled
    and a ``c + '_filled'`` flag (1 where LOCF supplied the value).
    """
    from pyspark.sql.window import Window

    order = [F.col(order_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in fill_cols:
        carried = F.last(F.col(c), ignorenulls=True).over(w)
        out = out.withColumn(
            f"{c}_filled",
            (F.col(c).isNull() & carried.isNotNull())
            .cast("long"),
        ).withColumn(c, carried)
    return out
