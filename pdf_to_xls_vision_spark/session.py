"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point and exercised locally:

- AQE on (runtime coalesce / skew-join splitting),
- Arrow on for every pandas UDF exchange,
- bounded Arrow batch size so Python workers never hold more than a
  few hundred pages of payload at once (the reference's 5 MB-per-image
  cap, image_processing.py:12, becomes our batch-memory bound),
- shuffle partitions sized by the caller (tests use 32 = local cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Pages per Arrow batch entering pandas UDFs. 256 keeps Python worker
# memory minimal but pays ~19% throughput in JVM<->Python round-trips
# (measured on the 4000-doc corpus: 48.6s -> 39.5s at local[8]); 2048
# is the sweet spot — a batch of 2048 pages of word-box JSON is still
# only a few tens of MB per worker.
ARROW_MAX_RECORDS = 2048


def _default_driver_mem() -> str:
    """Local-mode heap default: min(48g, ~40% of MemTotal). In local
    mode the driver hosts every executor thread, and an undersized heap
    (8g) GC-thrashes the UDF-heavy extraction stage ~10x; but a fixed
    48g fails JVM startup on smaller boxes/CI, so derive from the
    machine. SPARK_DRIVER_MEM always overrides."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(1, min(48, int(total_gib * 0.4)))}g"
    except OSError:
        pass
    return "4g"


def get_spark(
    app_name: str = "pdf_to_xls_vision_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's tuned defaults."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS)
        )
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Always use the sort-based (single-spill-file) shuffle writer.
        # With shuffle partitions <= 200 Spark silently switches to the
        # bypass-merge writer, which opens R partition files PER MAP
        # TASK (32x32 files per shuffle at local[32]) — a code path a
        # production job with thousands of reduce partitions never
        # takes, and one this host's filesystem punishes: bisected at
        # ~150-300 ms of executor time per task, 3-6x the whole
        # aggregate stage (see OPTIMIZATION_r06.md "shuffle writer").
        # Forcing the sort writer aligns local runs with the at-scale
        # path and removes the per-task file-fanout tax.
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
        # AQE partition coalescing keeps parallelism-first semantics
        # (target = total/parallelism), but its 1 MB minPartitionSize
        # floor serializes CPU-heavy reduces over byte-small data
        # (e.g. a hash aggregate of 10^6 60-bit keys compresses to
        # ~1 MB and was coalesced to ONE task). At scale
        # total/parallelism >> 64k so this floor never binds; locally
        # it restores reduce-side parallelism for compute-bound
        # aggregates.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", _default_driver_mem()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
