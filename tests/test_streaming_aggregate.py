"""Watermarked windowed aggregation + stateful sessionizer tests.

Each scenario drives the streaming plan with a file source, appending
files between availableNow runs that share one checkpoint — the same
resume discipline as the ingest tests."""

import os
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

T0 = datetime(2024, 1, 1, 10, 0, 0)


def _write_events(path, rows):
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path)


def _stream(spark, in_dir):
    return (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_type string, value double"
        ).parquet(in_dir)
    )


def _run(spark, df, out_dir, ckpt):
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)


def test_windowed_counts_drop_too_late_rows(spark, tmp_path):
    from pdf_to_xls_vision_spark.streaming.aggregate import windowed_event_counts

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)

    # run 1: two 10:00-10:30 events and one 11:30 event (advances the
    # watermark to 10:30 on the NEXT trigger)
    _write_events(
        f"{in_dir}/f1.parquet",
        [
            (1, T0, "click", 1.0),
            (2, T0 + timedelta(minutes=10), "click", 2.0),
            (3, T0 + timedelta(minutes=90), "click", 4.0),
        ],
    )
    _run(spark, windowed_event_counts(_stream(spark, in_dir)), out_dir, ckpt)

    # run 2: a too-late row (9:05 — behind the 10:30 watermark, must be
    # DROPPED) and a 13:00 row that pushes the watermark to 12:00 so
    # every earlier window finalizes
    _write_events(
        f"{in_dir}/f2.parquet",
        [
            (4, T0 - timedelta(minutes=55), "click", 100.0),
            (5, T0 + timedelta(hours=3), "click", 8.0),
        ],
    )
    _run(spark, windowed_event_counts(_stream(spark, in_dir)), out_dir, ckpt)
    # run 3: empty trigger-advancer so 13:00's own window can finalize
    _write_events(
        f"{in_dir}/f3.parquet", [(6, T0 + timedelta(hours=5), "click", 0.5)]
    )
    _run(spark, windowed_event_counts(_stream(spark, in_dir)), out_dir, ckpt)

    got = {
        (r.window_start.isoformat(), r.n_events, r.value_milli)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert ("2024-01-01T10:00:00", 2, 3000) in got  # NOT 3 — late row dropped
    assert ("2024-01-01T11:30:00", 1, 4000) in got
    assert ("2024-01-01T13:00:00", 1, 8000) in got
    assert not any(s.startswith("2024-01-01T09") for s, _, _ in got)


def test_sessionize_stream_closes_on_gap_across_batches(spark, tmp_path):
    from pdf_to_xls_vision_spark.streaming.aggregate import sessionize_stream

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)

    # run 1: two events 10 minutes apart -> one OPEN session, nothing emitted
    _write_events(
        f"{in_dir}/f1.parquet",
        [(7, T0, "click", 1.5), (7, T0 + timedelta(minutes=10), "click", 2.25)],
    )
    _run(spark, sessionize_stream(_stream(spark, in_dir)), out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 0

    # run 2: an event 60 minutes later (> 30-min gap) closes session 1;
    # state survived the restart via the checkpoint
    _write_events(
        f"{in_dir}/f2.parquet", [(7, T0 + timedelta(minutes=70), "click", 9.0)]
    )
    _run(spark, sessionize_stream(_stream(spark, in_dir)), out_dir, ckpt)

    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 7
    assert r.session_start == T0
    assert r.session_end == T0 + timedelta(minutes=10)
    assert r.n_events == 2
    assert r.value_milli == 1500 + 2250
