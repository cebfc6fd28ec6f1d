"""Model-based quality filtering: a hashed linear text classifier.

The fastText-style quality-filter shape every large training-data
pipeline runs (GPT-3's WebText-vs-CommonCrawl logistic filter, CCNet's
language-model perplexity buckets): tokens hash into a fixed weight
table, the document score is the sum of its tokens' weights, and a
threshold decides keep/drop. The reference has no counterpart (its
quality gate is structural, `quality_check.py`) — this is the
*learned*-filter analog, expressed scale-first.

Scale design: scoring is embarrassingly parallel — hash each token to
a bucket, look up the bucket weight, sum per document. No join is
needed at any corpus size because the weight table is **broadcast by
construction**: here the weights are derived deterministically from
the bucket id via the portable 60-bit hash (so the DuckDB oracle can
replay scoring bit-for-bit — integer weights, integer sums, one final
division); a production model swaps :func:`bucket_weight_expr` for an
``element_at`` lookup into a broadcast literal map of learned weights
with the identical plan shape (map-only + one per-doc aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_to_xls_vision_spark.functions.hashing import h60

N_BUCKETS = 256
_WEIGHT_SPAN = 17  # weights in [-8, 8]


def token_bucket_expr(term: Column | str, n_buckets: int = N_BUCKETS) -> Column:
    """Hash a token into ``[0, n_buckets)`` — the feature-hashing trick
    (Weinberger et al. 2009), portable across engines."""
    return F.pmod(h60(term, "qcb"), F.lit(n_buckets))


def bucket_weight_expr(bucket: Column) -> Column:
    """Deterministic integer weight in ``[-8, 8]`` for a bucket id,
    derived from the portable hash of the bucket's decimal string —
    the stand-in for a learned weight vector that keeps the oracle
    exact. h60 is non-negative, so ``pmod`` == ``%`` in both engines."""
    return F.pmod(h60(bucket.cast("string"), "qcw"), F.lit(_WEIGHT_SPAN)) - F.lit(8)


def score_documents(
    docs: DataFrame,
    n_buckets: int = N_BUCKETS,
    threshold: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document hashed-linear quality score:

    ``score = sum over token occurrences of weight[bucket(token)]``

    Output ``(doc_id, n_tokens, score, score_per_token, keep)`` with
    ``keep = score >= threshold``. All-integer until the single final
    ``score / n_tokens`` division. Documents with no tokens are
    excluded (stated semantics, matching ``rare_word_stats``).

    Plan: one explode + inline hash/weight expressions (map-only, no
    weight join) + ONE aggregate keyed by ``doc_id`` — skew bounded by
    the largest document; at 10^12 docs this is a single
    map-side-combined pass over the corpus.
    """
    ts = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(ts).alias("term")
    )
    weighted = toks.select(
        "doc_id",
        bucket_weight_expr(token_bucket_expr(F.col("term"), n_buckets)).alias(
            "w"
        ),
    )
    agg = weighted.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.sum("w").alias("score")
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "score",
        (F.col("score") / F.col("n_tokens")).alias("score_per_token"),
        (F.col("score") >= F.lit(threshold)).alias("keep"),
    )
