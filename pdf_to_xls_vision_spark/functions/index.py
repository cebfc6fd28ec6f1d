"""Inverted-index construction over the document corpus.

The IR-side complement of the dedup/curation families: a posting
table ``(term, df, doc_id, tf, first_pos)`` — the relational form of a
search index. The reference pipeline has no retrieval component
(it extracts tables from PDFs, `converter.py`); this is
beyond-reference infrastructure for the training-data use case
(corpus search, contamination forensics, hard-negative mining).

Scale design — the output is posting *rows*, never concatenated
posting lists: at 10^12 documents a stopword's posting list is
billions of entries, so any ``collect_list``-per-term shape is a
one-reducer hot key by construction. Posting rows keep every shuffle
keyed by ``(doc_id, term)`` (skew bounded by the largest document)
or ``term`` (bounded by map-side combine: one partial row per term per
map partition). Banding by ``df`` happens *after* the term-level
aggregate, so hot stopwords are dropped before the join fans their
postings back out (``max_df`` is the classic stop-list cutoff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, pos, term)`` — whitespace tokens with their 0-based
    position in the document's non-empty token sequence. One JVM
    ``posexplode`` over the filtered split; map-only."""
    ts = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(ts).alias("pos", "term")
    )


def posting_table(
    docs: DataFrame,
    min_df: int = 2,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Posting rows ``(term, df, doc_id, tf, first_pos)`` for every
    term whose document frequency lies in ``[min_df, max_df]``.

    - ``df`` — number of documents containing the term,
    - ``tf`` — occurrences of the term in this document,
    - ``first_pos`` — the term's first 0-based token position in the
      document (enough to reconstruct "title-ish vs body-ish" and to
      seed phrase verification without shipping full position lists).

    Three shuffles: ``(doc_id, term)`` posting aggregate (doc-local
    skew only), ``term`` df aggregate (map-side combined), and the
    ``term`` join of the df band back onto postings — the join key is
    the key the df aggregate just produced, and the banded df side is
    the small side (AQE broadcasts it at real scale once stopwords are
    cut by ``max_df``).
    """
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    if max_df is not None and max_df < min_df:
        raise ValueError("max_df must be >= min_df")
    postings = (
        token_positions(docs, id_col, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.min("pos").alias("first_pos"))
    )
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))
    band = dfreq.where(F.col("df") >= min_df)
    if max_df is not None:
        band = band.where(F.col("df") <= max_df)
    return postings.join(band, "term").select(
        "term", "df", "doc_id", "tf", "first_pos"
    )


SEARCH_SCALE = 1_000_000_000


def search_topk(
    postings: DataFrame, query_terms: list[str], k: int = 10
) -> DataFrame:
    """Term-at-a-time bag-of-terms retrieval over a posting table:

    ``score(doc) = sum over matched terms of tf * (SCALE div df)``

    — tf-idf's shape with an integer idf surrogate (``SCALE div df``
    is exact integer division, so scores are engine-order-independent
    bigints, never float-log accumulations). Returns the global top-k
    ``(doc_id, score, n_terms_matched)`` under the strict total order
    ``(score DESC, doc_id ASC)``, so the result SET is deterministic
    even through ties at the cut.

    Scale shape: the term filter is a pushed-down predicate on the
    posting table (a real deployment partitions/buckets the index by
    term, so only the query terms' posting ranges are scanned — query
    cost is bounded by posting-list length, not corpus size); one
    ``doc_id`` aggregate over matched postings; the global top-k
    compiles to ``TakeOrderedAndProject`` (per-partition heap + driver
    merge of k rows), never a global sort.
    """
    if not query_terms:
        raise ValueError("query_terms must name at least one term")
    if k < 1:
        raise ValueError("k must be >= 1")
    matched = postings.where(F.col("term").isin(list(query_terms)))
    scored = matched.groupBy("doc_id").agg(
        F.sum(F.expr(f"tf * ({SEARCH_SCALE} div df)")).alias("score"),
        F.count("*").alias("n_terms_matched"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
