"""Watermarked streaming exact-dedup (streaming/dedup.py).

Each scenario drives the plan with a file source, appending files
between availableNow runs that share one checkpoint — duplicates
therefore genuinely cross micro-batch (and restart) boundaries, which
is the property batch ``dropDuplicates`` cannot give a stream.
"""

import os
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_to_xls_vision_spark.streaming.dedup import dedup_stream

T0 = datetime(2024, 1, 1, 10, 0, 0)


def _write_rows(path, rows):
    pq.write_table(
        pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        ),
        path,
    )


def _stream(spark, in_dir):
    return (
        spark.readStream.schema("key long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def _run(spark, df, out_dir, ckpt):
    q = (
        df.select("key")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)


def _keys(spark, out_dir):
    return sorted(r.key for r in spark.read.parquet(out_dir).collect())


@pytest.mark.slow
def test_duplicates_dropped_across_batches_and_restarts(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)

    # run 1, two single-file micro-batches: key 1 twice (second file's
    # copy crosses a micro-batch boundary), key 2 once
    _write_rows(f"{in_dir}/f1.parquet", [(1, T0), (2, T0 + timedelta(minutes=1))])
    _write_rows(f"{in_dir}/f2.parquet", [(1, T0 + timedelta(minutes=2))])
    plan = dedup_stream(_stream(spark, in_dir), ["key"], watermark="1 hour")
    _run(spark, plan, out_dir, ckpt)
    assert _keys(spark, out_dir) == [1, 2]

    # run 2 (same checkpoint — a restart): another copy of key 1 within
    # the watermark is still dropped; new key 3 passes through
    _write_rows(
        f"{in_dir}/f3.parquet",
        [(1, T0 + timedelta(minutes=3)), (3, T0 + timedelta(minutes=4))],
    )
    _run(spark, dedup_stream(_stream(spark, in_dir), ["key"], watermark="1 hour"),
         out_dir, ckpt)
    assert _keys(spark, out_dir) == [1, 2, 3]


@pytest.mark.slow
def test_beyond_watermark_duplicate_reemits(spark, tmp_path):
    """The documented at-least-once boundary: once the watermark passes
    a key's event time + delay its state is evicted, and a later
    admissible copy is emitted again."""
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)

    # key 1 at 10:00 with a 10-minute delay; the 11:00 row drags the
    # watermark to 10:50 at the end of the batch, past 10:10 eviction
    _write_rows(
        f"{in_dir}/f1.parquet", [(1, T0), (99, T0 + timedelta(hours=1))]
    )
    _run(spark, dedup_stream(_stream(spark, in_dir), ["key"], watermark="10 minutes"),
         out_dir, ckpt)
    # key 1 again at 10:55 — admissible (>= watermark), state long gone
    _write_rows(f"{in_dir}/f2.parquet", [(1, T0 + timedelta(minutes=55))])
    _run(spark, dedup_stream(_stream(spark, in_dir), ["key"], watermark="10 minutes"),
         out_dir, ckpt)
    assert _keys(spark, out_dir) == [1, 1, 99]


def test_key_validation(spark):
    df = spark.createDataFrame([(1, T0)], "key long, ts timestamp")
    with pytest.raises(ValueError, match="at least one column"):
        dedup_stream(df, [])
    with pytest.raises(ValueError, match="event-time column"):
        dedup_stream(df, ["ts", "key"])
