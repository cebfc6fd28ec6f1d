"""Span-document source (S1).

The reference "source" is a directory glob over .pdf/image files
(converter.py:203-221); here the corpus is a table of interleaved
text+media span documents (BASELINE.json input_hint):

    doc_id : string
    spans  : array<struct<kind string, text string,
                          media_ref string, offset int>>

``read_span_docs`` is the batch scan (parquet now, Iceberg when the
runtime jar is present — the format string is the only switch);
``stream_span_docs`` is the unbounded variant for continuously-arriving
corpora (new parquet files under the path become micro-batches; Spark's
streaming checkpoint tracks processed files, giving exactly-once file
pickup across restarts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def read_span_docs(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Batch scan of the span-document corpus. Selecting only
    (doc_id, spans) keeps column pruning effective however wide the
    physical table is."""
    return spark.read.format(fmt).load(path).select("doc_id", "spans")


def stream_span_docs(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded scan: files appearing under ``path`` feed micro-batches.

    ``max_files_per_trigger`` bounds per-batch work (the streaming
    analogue of the commit-group size)."""
    reader = spark.readStream.schema(SPAN_DOC_SCHEMA).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path).select("doc_id", "spans")
