"""Edge semantics of the temporal/ranking operators
(functions/temporal.py, functions/relational.py). The registry parity
tests cover them end-to-end vs DuckDB; these pin the boundary rules."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from pdf_to_xls_vision_spark.functions.relational import topk_per_group
from pdf_to_xls_vision_spark.functions.temporal import (
    asof_join,
    banded_count_join,
    funnel_stages,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------

def _asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "lid int, k int, lt timestamp")
    right = spark.createDataFrame(right_rows, "k int, rt timestamp, rid int")
    out = asof_join(
        left, right, key="k", left_ts="lt", right_ts="rt", payload_cols=["rid"]
    )
    return {r["lid"]: r["asof_rid"] for r in out.collect()}


def test_asof_picks_latest_on_or_before(spark):
    got = _asof(
        spark,
        [(1, 7, _ts("2024-01-01T10:00:00")), (2, 7, _ts("2024-01-01T12:00:00"))],
        [
            (7, _ts("2024-01-01T09:00:00"), 100),
            (7, _ts("2024-01-01T11:00:00"), 200),
            (7, _ts("2024-01-01T13:00:00"), 300),
        ],
    )
    assert got == {1: 100, 2: 200}


def test_asof_equal_ts_is_inclusive(spark):
    got = _asof(
        spark,
        [(1, 7, _ts("2024-01-01T10:00:00"))],
        [(7, _ts("2024-01-01T10:00:00"), 100)],
    )
    assert got == {1: 100}


def test_asof_tie_on_ts_takes_max_payload(spark):
    got = _asof(
        spark,
        [(1, 7, _ts("2024-01-01T10:00:00"))],
        [
            (7, _ts("2024-01-01T09:00:00"), 150),
            (7, _ts("2024-01-01T09:00:00"), 151),
        ],
    )
    assert got == {1: 151}


def test_asof_no_match_is_null_and_other_keys_ignored(spark):
    got = _asof(
        spark,
        [(1, 7, _ts("2024-01-01T10:00:00")), (2, 8, _ts("2024-01-01T10:00:00"))],
        [
            (7, _ts("2024-01-01T11:00:00"), 100),  # after the probe
            (9, _ts("2024-01-01T09:00:00"), 200),  # different key
        ],
    )
    assert got == {1: None, 2: None}


# ---------------------------------------------------------------------------
# banded_count_join
# ---------------------------------------------------------------------------

def test_banded_count_band_edges_inclusive(spark):
    probes = spark.createDataFrame([(1, 1000)], "pid int, pe long")
    facts = spark.createDataFrame(
        [(880,), (1120,), (879,), (1121,), (1000,)], "fe long"
    )
    out = banded_count_join(
        probes, facts, probe_epoch="pe", fact_epoch="fe",
        band_seconds=120, bucket_seconds=50,
    ).collect()
    # 880, 1120, 1000 are in [1000-120, 1000+120]; 879/1121 are out;
    # each in-band fact counted exactly once despite multi-bucket explode
    assert [(r["pid"], r["n_in_band"]) for r in out] == [(1, 3)]


def test_banded_count_rejects_bad_params(spark):
    probes = spark.createDataFrame([(1, 0)], "pid int, pe long")
    with pytest.raises(ValueError):
        banded_count_join(
            probes, probes, probe_epoch="pe", fact_epoch="pe",
            band_seconds=0, bucket_seconds=10,
        )


# ---------------------------------------------------------------------------
# funnel_stages
# ---------------------------------------------------------------------------

def _funnel(spark, rows):
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    out = funnel_stages(df, ["a", "b", "c"])
    return {
        r["user_id"]: (r["t_a"], r["t_b"], r["t_c"], r["funnel_depth"])
        for r in out.collect()
    }


def test_funnel_requires_order(spark):
    t = _ts
    got = _funnel(
        spark,
        [
            # u1: b before a → that b must NOT count; later b does
            (1, t("2024-01-01T09:00:00"), "b"),
            (1, t("2024-01-01T10:00:00"), "a"),
            (1, t("2024-01-01T11:00:00"), "b"),
            (1, t("2024-01-01T10:30:00"), "c"),  # c before reach(b) → depth 2
            # u2: full ordered funnel, same-ts step counts (>=)
            (2, t("2024-01-01T10:00:00"), "a"),
            (2, t("2024-01-01T10:00:00"), "b"),
            (2, t("2024-01-01T12:00:00"), "c"),
            # u3: never does step a → absent from output
            (3, t("2024-01-01T10:00:00"), "b"),
        ],
    )
    assert got[1] == (
        t("2024-01-01T10:00:00"), t("2024-01-01T11:00:00"), None, 2
    )
    assert got[2] == (
        t("2024-01-01T10:00:00"), t("2024-01-01T10:00:00"),
        t("2024-01-01T12:00:00"), 3,
    )
    assert 3 not in got


def test_funnel_empty_steps_rejected(spark):
    df = spark.createDataFrame([], "user_id int, ts timestamp, event_type string")
    with pytest.raises(ValueError):
        funnel_stages(df, [])


# ---------------------------------------------------------------------------
# topk_per_group
# ---------------------------------------------------------------------------

def test_topk_exact_vs_single_window(spark):
    import random

    rng = random.Random(7)
    rows = [
        (rng.randrange(4), i, float(rng.randrange(50))) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g int, id int, v double")
    got = topk_per_group(
        df, group_cols=["g"], order_col="v", k=5, tiebreak_col="id", n_salt=8
    )
    naive = {}
    for g, i, v in rows:
        naive.setdefault(g, []).append((-v, i))
    expect = set()
    for g, items in naive.items():
        for rk, (_nv, i) in enumerate(sorted(items)[:5], 1):
            expect.add((g, rk, i))
    assert {(r["g"], r["rk"], r["id"]) for r in got.collect()} == expect


def test_topk_requires_tiebreak(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], "g int, id int, v double")
    with pytest.raises(ValueError):
        topk_per_group(df, group_cols=["g"], order_col="v", k=1, tiebreak_col=None)
