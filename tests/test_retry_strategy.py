"""Retry-strategy equivalence: the single_parse fold (retry decision
inside the merge kernel + persisted doc-level fan-out) must be
row-identical to the legacy reaggregate shape on every column, and
must release its internal cache through persisted_sink."""

import pytest

from pdf_to_xls_vision_spark.operators.pipeline import run_extraction

pytestmark = pytest.mark.slow


def _canon(df):
    rows = [r.asDict(recursive=True) for r in df.collect()]
    return sorted(repr(sorted(r.items())) for r in rows)


@pytest.fixture(scope="module")
def legacy(spark, tiny_corpus_path):
    docs = spark.read.parquet(tiny_corpus_path)
    return _canon(run_extraction(docs, retry_strategy="reaggregate"))


def test_single_parse_matches_reaggregate(spark, tiny_corpus_path, legacy):
    docs = spark.read.parquet(tiny_corpus_path)
    got = _canon(run_extraction(docs, retry_strategy="single_parse"))
    assert got == legacy


def test_single_parse_map_batches_matches(spark, tiny_corpus_path, legacy):
    docs = spark.read.parquet(tiny_corpus_path)
    got = _canon(
        run_extraction(
            docs,
            retry_strategy="single_parse",
            merge_strategy="map_batches",
        )
    )
    assert got == legacy


def test_force_vision_parity(spark, tiny_corpus_path):
    docs = spark.read.parquet(tiny_corpus_path)
    a = _canon(
        run_extraction(docs, force_vision=True, retry_strategy="single_parse")
    )
    b = _canon(
        run_extraction(docs, force_vision=True, retry_strategy="reaggregate")
    )
    assert a == b


def test_persisted_sink_receives_cache(spark, tiny_corpus_path):
    docs = spark.read.parquet(tiny_corpus_path)
    sink = []
    res = run_extraction(docs, retry_strategy="single_parse", persisted_sink=sink)
    assert len(sink) == 1  # the doc-level merge cache
    res.count()
    assert sink[0].storageLevel.useMemory or sink[0].storageLevel.useDisk
    for c in sink:
        c.unpersist(blocking=True)
    assert not sink[0].storageLevel.useMemory


def test_invalid_strategy_rejected(spark, tiny_corpus_path):
    docs = spark.read.parquet(tiny_corpus_path)
    with pytest.raises(ValueError, match="retry_strategy"):
        run_extraction(docs, retry_strategy="nope")
