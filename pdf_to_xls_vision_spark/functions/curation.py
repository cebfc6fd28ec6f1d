"""Corpus curation: token-budgeted sampling.

The canonical training-data curation move: rank documents by a quality
signal and keep the best until a token budget is spent. Implemented as
a per-shard (here per-language) running-sum window:

- ranking: (quality desc, doc_id asc) — a total, deterministic order
  (quality is the engine's rounded composite score, cross-engine
  exact);
- budget: cumulative token count *including the current document* must
  stay <= the shard budget, i.e. greedy prefix of the ranked shard.

The window partitions by the shard key, so the cumulative sum
parallelizes across shards — a single global budget would serialize
into one partition at 100 TB; shard budgets (per language / domain /
bucket) are how production curation actually allocates anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_to_xls_vision_spark.functions.text import (
    quality_score_expr,
    token_count_expr,
)


def budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy quality-ranked prefix per shard under a token budget.

    Returns ``(doc_id, shard, quality, n_tokens, cum_tokens)`` for the
    kept documents.
    """
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(shard_col).alias("shard"),
        quality_score_expr(text_col).alias("quality"),
        token_count_expr(text_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select("doc_id", "shard", "quality", "n_tokens", "cum_tokens")
    )


def budget_sample_composite(
    docs: DataFrame,
    budget_tokens: int,
    n_buckets: int,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Composite-shard budget sampling: shard key = (shard, bucket)
    with ``bucket = doc_id mod n_buckets`` and per-bucket budget
    ``budget_tokens // n_buckets``.

    The plain per-language window serializes each language into one
    task — fine for 10 languages, a wall at 100 TB where one language
    holds most of the corpus. The composite key multiplies the
    parallelism by ``n_buckets`` (pick it ~ executor count); budgets
    are allocated proportionally per bucket, so the expected totals
    match the per-shard run whenever quality is bucket-independent
    (the id-hash bucketing makes it so by construction).
    """
    per_bucket = budget_tokens // n_buckets
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(shard_col).alias("shard"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("bigint").alias("bucket"),
        quality_score_expr(text_col).alias("quality"),
        token_count_expr(text_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard", "bucket")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= per_bucket)
        .select("doc_id", "shard", "bucket", "quality", "n_tokens", "cum_tokens")
    )
