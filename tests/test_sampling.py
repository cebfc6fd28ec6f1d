"""Invariants of the deterministic hash samplers
(functions/curation.py): partitioning-independence, exact quotas,
contiguous permutation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_to_xls_vision_spark.functions.curation import (
    hash_sample,
    quota_sample,
    shuffle_order,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr", "zh"][i % 4]) for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hash_sample_partitioning_independent(spark, docs):
    rates = {"en": 0.5, "de": 0.2}
    a = hash_sample(docs.repartition(1), rates, default_rate=0.1)
    b = hash_sample(docs.repartition(13, "lang"), rates, default_rate=0.1)
    ka = sorted(r["doc_id"] for r in a.collect())
    kb = sorted(r["doc_id"] for r in b.collect())
    assert ka == kb and len(ka) > 0


def test_hash_sample_rate_is_approximately_honored(spark, docs):
    kept = hash_sample(docs, {"en": 0.5}, default_rate=0.0).collect()
    # only the 'en' stratum survives (default 0), at ~50% of 500 docs
    assert all(r["stratum"] == "en" for r in kept)
    assert 200 <= len(kept) <= 300


def test_quota_sample_exact_counts_and_determinism(spark, docs):
    out = quota_sample(
        docs, {"en": 7, "de": 3}, default_quota=2, stratum_col="lang"
    )
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"en": 7, "de": 3, "fr": 2, "zh": 2}
    # rank-1 doc per stratum is the min-hash doc — stable across runs
    first = {r["stratum"]: r["doc_id"] for r in out.filter("rk = 1").collect()}
    again = quota_sample(
        docs.repartition(7), {"en": 7, "de": 3}, default_quota=2,
        stratum_col="lang",
    )
    first2 = {r["stratum"]: r["doc_id"] for r in again.filter("rk = 1").collect()}
    assert first == first2


def test_quota_sample_requires_positive_quota(spark, docs):
    with pytest.raises(ValueError):
        quota_sample(docs, {}, default_quota=0, stratum_col="lang")


def test_shuffle_order_is_contiguous_permutation(spark, docs):
    out = shuffle_order(docs, n_buckets=8).collect()
    assert len(out) == 2000
    idxs = sorted(r["global_idx"] for r in out)
    assert idxs == list(range(2000))
    # order follows (h60, doc_id)
    by_idx = sorted(out, key=lambda r: r["global_idx"])
    keys = [(r["h60"], r["doc_id"]) for r in by_idx]
    assert keys == sorted(keys)
    # a different salt gives a different permutation
    other = shuffle_order(docs, salt="epoch1", n_buckets=8).collect()
    perm0 = {r["doc_id"]: r["global_idx"] for r in out}
    perm1 = {r["doc_id"]: r["global_idx"] for r in other}
    assert perm0 != perm1


def test_shuffle_order_rejects_bad_buckets(spark, docs):
    with pytest.raises(ValueError):
        shuffle_order(docs, n_buckets=48)
