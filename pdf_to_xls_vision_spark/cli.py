"""spark-submit entry point (G2).

Mirrors the reference CLI's surface (``pdf_to_xls_cli.py:12-63``:
positional input, ``-o/--output``, ``--force-vision``) and adds the
cluster-job flags the north rule requires (``--partitions``,
``--buckets``, ``--commit-group-size``, ``--no-resume``, ``--master``).
The reference's per-file/recursive dispatch disappears: the input is a
table of span documents, not a directory tree.

Usage::

    spark-submit --py-files pdf_to_xls_vision_spark.zip \
        -m pdf_to_xls_vision_spark.cli corpus.parquet -o /out/extracted
    # or locally:
    python -m pdf_to_xls_vision_spark.cli corpus.parquet -o /tmp/out

Resume is the default: committed buckets (per the output manifest) are
pruned from the input scan before any extraction work runs. The job
prints one JSON summary line (the reference's batch summary,
``converter.py:257-265``).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pdf-to-xls-vision-spark",
        description="Distributed span-document table extraction (PySpark).",
    )
    p.add_argument("input", help="parquet/iceberg path of (doc_id, spans) docs")
    p.add_argument("-o", "--output", required=True, help="checkpointed output dir")
    p.add_argument(
        "--force-vision",
        action="store_true",
        help="route every document through the vision stage "
        "(reference --force-vision)",
    )
    p.add_argument(
        "--partitions",
        type=int,
        default=None,
        help="page-relation repartition width (default: 2x parallelism)",
    )
    p.add_argument("--buckets", type=int, default=64, help="commit buckets")
    p.add_argument(
        "--commit-group-size",
        type=int,
        default=None,
        help="buckets per atomic commit (default: all pending in one)",
    )
    p.add_argument(
        "--no-resume",
        action="store_true",
        help="wipe the output dir instead of resuming from its manifest",
    )
    p.add_argument("--master", default=None, help="override spark master")
    p.add_argument(
        "--snapshot",
        default="",
        help="input snapshot id recorded in commit lineage",
    )
    p.add_argument(
        "--report",
        action="store_true",
        help="print the per-bucket validation/metrics report (X7) after the run",
    )
    p.add_argument(
        "--stream",
        action="store_true",
        help="treat INPUT as a continuously-growing directory: run the "
        "Structured Streaming ingest (exactly-once per-micro-batch "
        "commits) instead of the batch job",
    )
    p.add_argument(
        "--stream-checkpoint",
        default=None,
        help="streaming checkpoint dir (default: <output>/_stream_checkpoint)",
    )
    p.add_argument(
        "--continuous",
        action="store_true",
        help="with --stream: keep running for new files instead of "
        "draining what's present and stopping (availableNow)",
    )
    p.add_argument(
        "--stream-op",
        choices=("ingest", "sessionize", "windowed"),
        default="ingest",
        help="with --stream: which streaming operator to run — "
        "'ingest' (span-doc extraction with exactly-once commits), "
        "'sessionize' (stateful event-time sessions over an events "
        "stream), or 'windowed' (watermarked window counts)",
    )
    p.add_argument(
        "--session-gap",
        type=int,
        default=None,
        help="sessionize inactivity gap in seconds (default 1800)",
    )
    p.add_argument(
        "--session-watermark",
        default=None,
        help="event-time watermark for sessionize/windowed, e.g. "
        "'30 minutes' — how long to wait for stragglers",
    )
    p.add_argument(
        "--read-snapshot",
        type=int,
        default=None,
        metavar="BATCH",
        help="read-only mode: report the streaming output table as of "
        "ingest batch BATCH (Iceberg time-travel analog); no "
        "extraction runs and the input path is ignored",
    )
    p.add_argument(
        "--compact",
        action="store_true",
        help="maintenance mode: bin-pack small parquet files in the "
        "output span table (the Iceberg rewrite_data_files analog); "
        "no extraction runs and the input path is ignored",
    )
    p.add_argument(
        "--target-file-mb",
        type=int,
        default=128,
        help="with --compact: target output file size in MiB",
    )
    p.add_argument(
        "--vision-backend",
        choices=["stub", "anthropic"],
        default="stub",
        help="vision-inference backend: 'stub' (deterministic, no "
        "network) or 'anthropic' (live Messages API — reference "
        "table_extraction.py:46-133; needs ANTHROPIC_API_KEY and "
        "--media-dir)",
    )
    p.add_argument(
        "--media-dir",
        default=None,
        help="with --vision-backend anthropic: directory holding the "
        "rendered page rasters, one file per media_ref",
    )
    return p


def _vision_backend(args):
    """None (-> stub) or a live AnthropicVisionBackend resolving
    media refs against --media-dir. Fails fast on missing key/dir —
    never a silently-empty extraction."""
    if args.vision_backend == "stub":
        return None
    if not args.media_dir:
        raise SystemExit(
            "--vision-backend anthropic requires --media-dir "
            "(rendered page rasters, one file per media_ref)"
        )
    import os

    from pdf_to_xls_vision_spark.core.vision_client import (
        AnthropicVisionBackend,
    )

    media_dir = args.media_dir
    _MIME = {".png": "image/png", ".jpg": "image/jpeg", ".jpeg": "image/jpeg",
             ".gif": "image/gif", ".webp": "image/webp"}

    def loader(ref: str) -> tuple[bytes, str]:
        path = os.path.join(media_dir, ref)
        ext = os.path.splitext(ref)[1].lower()
        with open(path, "rb") as f:
            return f.read(), _MIME.get(ext, "image/png")

    return AnthropicVisionBackend(media_loader=loader)


def _run_event_stream(spark, args) -> int:
    """--stream --stream-op {sessionize,windowed}: run the event-time
    streaming operators over a growing directory of events parquet
    (user_id long, ts timestamp, event_type string, value double) into
    a parquet sink. Gap/watermark are deployment knobs (SURVEY §2.12 /
    streaming/aggregate.py)."""
    import os

    from pdf_to_xls_vision_spark.streaming.aggregate import (
        SESSION_GAP_SECONDS,
        SESSION_WATERMARK,
        sessionize_stream,
        windowed_event_counts,
    )

    ckpt = args.stream_checkpoint or os.path.join(
        args.output, "_stream_checkpoint"
    )
    events = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string, value double"
    ).parquet(args.input)
    if args.stream_op == "sessionize":
        plan = sessionize_stream(
            events,
            watermark=args.session_watermark or SESSION_WATERMARK,
            gap_seconds=args.session_gap or SESSION_GAP_SECONDS,
        )
    else:
        plan = windowed_event_counts(
            events, watermark=args.session_watermark or "1 hour"
        )
    writer = (
        plan.writeStream.format("parquet")
        .option("path", args.output)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )
    if not args.continuous:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination()
    out = spark.read.parquet(args.output)
    print(
        json.dumps(
            {
                "mode": f"stream:{args.stream_op}",
                "rows": out.count(),
                "output": args.output,
                "checkpoint": ckpt,
                "gap_seconds": args.session_gap or SESSION_GAP_SECONDS,
                "watermark": args.session_watermark or SESSION_WATERMARK,
            }
        )
    )
    return 0


def _run_stream(spark, args) -> int:
    import os

    from pdf_to_xls_vision_spark.streaming.ingest import (
        read_stream_committed,
        stream_extraction,
    )

    if args.stream_op != "ingest":
        return _run_event_stream(spark, args)

    ckpt = args.stream_checkpoint or os.path.join(
        args.output, "_stream_checkpoint"
    )
    q = stream_extraction(
        spark,
        args.input,
        args.output,
        ckpt,
        n_buckets=args.buckets,
        available_now=not args.continuous,
    )
    q.awaitTermination()
    committed = read_stream_committed(spark, args.output)
    print(
        json.dumps(
            {
                "mode": "stream",
                "docs": committed.select("doc_id").distinct().count(),
                "span_rows": committed.count(),
                "output": args.output,
                "checkpoint": ckpt,
            }
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pdf_to_xls_vision_spark.session import get_spark
    from pdf_to_xls_vision_spark.sink.checkpoint import (
        read_manifest,
        run_checkpointed_extraction,
    )

    if args.compact and args.no_resume:
        raise SystemExit(
            "--compact maintains the existing output table; "
            "--no-resume would delete it first"
        )
    if args.read_snapshot is not None and args.no_resume:
        raise SystemExit(
            "--read-snapshot reads the existing output table; "
            "--no-resume would delete it first"
        )
    if args.no_resume:
        shutil.rmtree(args.output, ignore_errors=True)

    from pyspark.sql import SparkSession

    # only stop the session on exit if this invocation created it —
    # embedded callers (tests, notebooks) keep theirs alive
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("pdf_to_xls_vision_spark.cli", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    try:
        if args.compact:
            from pdf_to_xls_vision_spark.sink.compaction import compact_spans

            res = compact_spans(
                spark,
                args.output,
                target_file_bytes=args.target_file_mb * 1024 * 1024,
            )
            print(
                json.dumps(
                    {
                        "mode": "compact",
                        "output": args.output,
                        "compacted_buckets": sorted(res["compacted"]),
                        "skipped_buckets": res["skipped"],
                        "files_rewritten": sum(
                            info["files_before"]
                            for info in res["compacted"].values()
                        ),
                    }
                )
            )
            return 0
        if args.read_snapshot is not None:
            from pdf_to_xls_vision_spark.streaming.ingest import (
                read_stream_committed,
            )

            snap = read_stream_committed(
                spark, args.output, as_of_batch=args.read_snapshot
            )
            print(
                json.dumps(
                    {
                        "mode": "read-snapshot",
                        "as_of_batch": args.read_snapshot,
                        "docs": snap.select("doc_id").distinct().count(),
                        "span_rows": snap.count(),
                        "output": args.output,
                    }
                )
            )
            return 0
        if args.stream:
            return _run_stream(spark, args)
        docs = spark.read.parquet(args.input)
        if args.partitions:
            docs = docs.repartition(args.partitions)
        summary = run_checkpointed_extraction(
            docs,
            args.output,
            n_buckets=args.buckets,
            commit_group_size=args.commit_group_size,
            input_snapshot=args.snapshot or args.input,
            force_vision=args.force_vision,
            backend=_vision_backend(args),
        )
        manifest = read_manifest(spark, args.output)
        totals = manifest.groupBy().sum(
            "docs", "pages_parsed", "tables_found",
            "rotation_corrections", "quality_retries",
        ).collect()[0]
        print(
            json.dumps(
                {
                    "committed_buckets": len(summary["committed"]),
                    "resumed_buckets": len(summary["skipped"]),
                    "attempt": summary["attempt"],
                    "docs": totals[0],
                    "pages_parsed": totals[1],
                    "tables_found": totals[2],
                    "rotation_corrections": totals[3],
                    "quality_retries": totals[4],
                    "output": args.output,
                }
            )
        )
        if args.report:
            for row in manifest.orderBy("bucket").collect():
                print(
                    f"bucket {row.bucket:>4}: docs={row.docs} "
                    f"pages={row.pages_parsed} tables={row.tables_found} "
                    f"rot={row.rotation_corrections} "
                    f"retries={row.quality_retries} "
                    f"acc={row.accuracy_pct} attempt={row.lineage.attempt}"
                )
        return 0
    except KeyboardInterrupt:
        print("interrupted", file=sys.stderr)
        return 1
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
