"""Text-analysis operators: language ID, quality scoring, token
counting, fingerprinting. All JVM-side expressions except the winnowing
fingerprint (inherently sequential rolling hash -> vectorized pandas
UDF over Arrow batches)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_to_xls_vision_spark.functions.hashing import h60

#: per-language stopword inventories for the heuristic classifier;
#: scores are plain token-membership counts. ASCII-safe word choices
#: keep lower()/split() behavior identical across Spark and DuckDB.
#: Cross-language collisions ('de', 'la', 'en', ...) are real and are
#: resolved by the argmax over the full inventory.
LANG_STOPWORDS = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "es": ["el", "la", "de", "y", "que", "los", "las", "una"],
    "fr": ["le", "la", "et", "les", "des", "une", "dans", "est"],
    "it": ["il", "di", "che", "e", "per", "con", "non", "sono"],
    "nl": ["het", "een", "en", "van", "ik", "te", "dat", "niet"],
    "pl": ["nie", "to", "na", "i", "z", "co", "jest", "czy"],
    "pt": ["o", "de", "que", "e", "do", "da", "em", "um"],
    "sv": ["och", "att", "det", "som", "en", "av", "den", "till"],
    "tr": ["bir", "ve", "bu", "da", "ne", "gibi", "kadar", "daha"],
}

#: CJK unified-ideograph range as literal chars — the same class
#: compiles in Java regex (Spark) and RE2 (DuckDB).
CJK_CLASS = "[一-鿿]"

PUNCT_CLASS = r"[^\w\s]"
STOPWORDS_QUALITY = ["the", "a", "of", "and", "to", "in", "is"]


def token_count_expr(text_col: str | Column) -> Column:
    """Whitespace token count (size of the split array, empties out)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.filter(F.split(c, " "), lambda t: t != ""))


#: GPT-2-family pretokenizer, lookahead-free so the same pattern runs
#: in Java regex (Spark) and RE2 (DuckDB): contractions, space-prefixed
#: letter runs, digit runs, punctuation runs, residual whitespace.
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


def bpe_token_count_expr(text_col: str | Column) -> Column:
    """BPE-ish token count: matches of the pretokenizer pattern whose
    text is not pure whitespace (whitespace runs merge into the next
    token in real BPE; counting them would overstate length)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    return F.size(F.filter(toks, lambda t: F.trim(t) != ""))


def lang_scores(text_col: str | Column) -> dict[str, Column]:
    """Per-language scores: stopword membership counts for the
    whitespace languages, CJK character count for 'zh' (no-whitespace
    scripts can't be stopword-scored)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.lower(c), " ")
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(words)))
        for lang, words in LANG_STOPWORDS.items()
    }
    scores["zh"] = F.length(c) - F.length(F.regexp_replace(c, CJK_CLASS, ""))
    return scores


def lang_id_expr(text_col: str | Column) -> Column:
    """Heuristic language ID: argmax of stopword-membership scores,
    alphabetical tie-break, 'und' (undetermined) when all scores are 0."""
    scores = lang_scores(text_col)
    # sort (-score, lang) ascending: element 1 is the max score with the
    # alphabetically-first language winning ties
    pairs = F.array(
        *[
            F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("lang"))
            for lang in sorted(scores)
        ]
    )
    best = F.element_at(F.sort_array(pairs), 1)
    return F.when(-best["neg"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score_expr(text_col: str | Column) -> Column:
    """Composite document-quality score in [0,1]: rewards reasonable
    length and stopword density, penalizes punctuation soup — the
    document-level analog of the reference's table-quality gate."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.length(c)
    toks = F.filter(F.split(F.lower(c), " "), lambda t: t != "")
    n_toks = F.size(toks)
    # count of single-char-class matches == chars removed by replace;
    # regexp_replace avoids materializing the match array (~2x faster)
    punct = n_chars - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_QUALITY)))
    len_score = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, stop / n_toks).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
    )
    return F.round(score, 6)


def content_fingerprint_expr(text_col: str | Column) -> Column:
    """60-bit content fingerprint (portable md5)."""
    return h60(text_col, "fp")


# ---------------------------------------------------------------------------
# Gopher-style n-gram repetition filters (Rae et al. 2021 §A1.1)
# ---------------------------------------------------------------------------

#: keep-thresholds for the repetition filter; a doc dominated by one
#: 2-gram or by repeated 3-grams is boilerplate/spam for LLM training.
TOP_2GRAM_MAX_SHARE = 0.20
DUP_3GRAM_MAX_FRAC = 0.30


def _word_ngrams(ts: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array, empty when the doc
    is shorter than ``n`` (guards the descending-``sequence`` trap)."""
    return F.when(
        F.size(ts) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ts) - (n - 1)),
            lambda i: F.array_join(F.slice(ts, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_repetition(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document n-gram repetition metrics, the Gopher quality rules
    re-expressed for a whitespace corpus:

    - ``top_2gram_share`` — fraction of all word 2-grams accounted for
      by the single most frequent 2-gram,
    - ``dup_3gram_frac`` — fraction of 3-gram instances whose gram
      occurs more than once in the document,
    - ``keep`` — both metrics under their thresholds.

    Scale shape: BOTH gram widths ride one explode and one count pass —
    a single shuffle keyed by ``(doc_id, n, gram)`` (doc-local keys, so
    skew is bounded by the largest single document, the same guarantee
    as the MinHash shingle pass), one re-aggregation by ``doc_id``, and
    one join back to the id relation for short-doc zero rows. No window
    over the full corpus, no driver state. Reference parity: the
    reference gates *tables* on repetition (quality_check.py
    duplicate-row rule); this is the document-level generalization an
    LLM-curation user needs.
    """
    ts = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    base = docs.select(F.col(id_col).alias("doc_id"), ts.alias("ts"))

    def tag(n: int) -> Column:
        return F.transform(
            _word_ngrams(F.col("ts"), n),
            lambda g: F.struct(
                F.lit(n).cast("int").alias("n"), g.alias("g")
            ),
        )

    tagged = base.select(
        "doc_id", F.explode(F.concat(tag(2), tag(3))).alias("t")
    ).select("doc_id", F.col("t.n").alias("n"), F.col("t.g").alias("g"))
    counts = tagged.groupBy("doc_id", "n", "g").agg(F.count("*").alias("cnt"))
    is2, is3 = F.col("n") == 2, F.col("n") == 3
    stats = counts.groupBy("doc_id").agg(
        F.max(F.when(is2, F.col("cnt"))).alias("g2_top"),
        F.sum(F.when(is2, F.col("cnt"))).alias("g2_total"),
        F.sum(F.when(is3, F.col("cnt"))).alias("g3_total"),
        F.sum(
            F.when(is3 & (F.col("cnt") > 1), F.col("cnt")).otherwise(0)
        ).alias("g3_dup"),
    )
    joined = base.select("doc_id").join(stats, "doc_id", "left")
    top2 = F.round(
        F.when(
            F.col("g2_total") > 0, F.col("g2_top") / F.col("g2_total")
        ).otherwise(F.lit(0.0)),
        6,
    )
    dup3 = F.round(
        F.when(
            F.col("g3_total") > 0, F.col("g3_dup") / F.col("g3_total")
        ).otherwise(F.lit(0.0)),
        6,
    )
    return joined.select(
        "doc_id",
        F.coalesce(F.col("g2_total"), F.lit(0)).alias("n_2grams"),
        top2.alias("top_2gram_share"),
        dup3.alias("dup_3gram_frac"),
        (
            (top2 <= F.lit(TOP_2GRAM_MAX_SHARE))
            & (dup3 <= F.lit(DUP_3GRAM_MAX_FRAC))
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# winnowing fingerprint — rolling hash, pandas UDF (sequential per doc)
# ---------------------------------------------------------------------------

_WINNOW_K = 5  # k-gram length (tokens)
_WINNOW_W = 4  # winnow window
_B = 1_000_003
_M = (1 << 61) - 1


def _winnow(tokens: list[str]) -> list[int]:
    """Winnowing (Schleimer et al., SIGMOD'03): k-gram rolling hashes,
    minimum per sliding window, deduplicated in order."""
    hs = []
    for i in range(max(len(tokens) - _WINNOW_K + 1, 0)):
        h = 0
        for t in tokens[i : i + _WINNOW_K]:
            h = (h * _B + hash_token(t)) % _M
        hs.append(h)
    if not hs:
        return []
    out = []
    prev = None
    for i in range(max(len(hs) - _WINNOW_W + 1, 1)):
        window = hs[i : i + _WINNOW_W]
        m = min(window)
        if m != prev:
            out.append(m)
            prev = m
    return out


def hash_token(t: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:7], "big")


def winnow_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document winnowed fingerprint set as ``array<long>`` —
    rolling hash is order-dependent, so this is the one text operator
    that runs as a pandas UDF (Arrow-batched, never per-row Python in
    the plan)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col],
                    "fingerprints": [
                        _winnow(str(t).split()) for t in b[text_col]
                    ],
                }
            )

    out_schema = "doc_id long, fingerprints array<long>"
    return docs.select(id_col, text_col).mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Corpus-statistics quality features (CCNet-adjacent rare-word filter,
# tf-idf-intent distinctive terms) — all integer-exact until one final
# division, so the DuckDB oracle matches bit-for-bit.
# ---------------------------------------------------------------------------

def doc_word_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, word, tf)`` per-document word counts: one JVM explode
    + one count keyed by ``(doc_id, word)``. Keys are doc-local, so
    shuffle skew is bounded by the largest single document (the same
    guarantee as the MinHash shingle pass)."""
    ts = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(ts).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )


def vocab_stats(word_counts: DataFrame) -> DataFrame:
    """Corpus vocabulary statistics from :func:`doc_word_counts`:
    collection frequency ``cf`` and document frequency ``df`` per word.
    One shuffle keyed by ``word``; hot stopwords cost one partial-agg
    row per map partition (map-side combine), never a row per
    occurrence."""
    return word_counts.groupBy("word").agg(
        F.sum("tf").alias("cf"), F.count("*").alias("df")
    )


def rare_word_stats(
    docs: DataFrame,
    min_cf: int = 5,
    max_oov_ratio: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document rare-word quality features — the CCNet-style
    "does this document consist of words the corpus actually uses"
    filter, with every aggregate integer-exact (bigint sums; the only
    floats are two final single divisions, which IEEE rounds
    identically in every engine — the lesson from the shipping-priority
    float hazard):

    - ``n_tokens`` / ``n_distinct`` — token and distinct-word counts,
    - ``oov_count`` — token occurrences whose corpus collection
      frequency is below ``min_cf``,
    - ``oov_ratio`` — ``oov_count / n_tokens``,
    - ``sum_df`` / ``mean_df`` — summed and mean per-token document
      frequency (how "common-crawl-ish" the vocabulary is),
    - ``keep`` — ``oov_ratio <= max_oov_ratio``.

    Scale shape: two aggregation passes ((doc_id, word) then (word))
    and one shuffle join of per-doc counts against the vocabulary on
    ``word`` — the vocabulary of a 10^12-doc corpus is itself too big
    to broadcast, and the join key is the same key the vocab agg just
    shuffled on. Documents with no tokens are excluded (stated
    semantics; ratios would be 0/0).
    """
    wc = doc_word_counts(docs, id_col, text_col)
    vocab = vocab_stats(wc)
    per_doc = (
        wc.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.sum(
                F.when(F.col("cf") < min_cf, F.col("tf")).otherwise(F.lit(0))
            ).alias("oov_count"),
            F.sum(F.col("tf") * F.col("df")).alias("sum_df"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "oov_count",
        (F.col("oov_count") / F.col("n_tokens")).alias("oov_ratio"),
        "sum_df",
        (F.col("sum_df") / F.col("n_tokens")).alias("mean_df"),
        (
            (F.col("oov_count") / F.col("n_tokens")) <= F.lit(max_oov_ratio)
        ).alias("keep"),
    )


def distinctive_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` most distinctive terms per document, ranked by
    ``(tf DESC, df ASC, term ASC)`` — the tf-idf ranking intent with a
    fully deterministic integer ordering instead of a float
    ``tf·log(N/df)`` score (which would hang cross-engine equality on
    last-ulp ``log`` agreement). A term is distinctive when the
    document repeats it and the rest of the corpus rarely uses it;
    the lexicographic order ranks exactly that.

    Scale shape: same two aggregates + word-keyed join as
    :func:`rare_word_stats`; the ranking window partitions by
    ``doc_id`` over per-doc DISTINCT words (bounded by document size,
    never corpus-global).
    """
    from pyspark.sql.window import Window

    wc = doc_word_counts(docs, id_col, text_col)
    vocab = vocab_stats(wc)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("word").asc()
    )
    return (
        wc.join(vocab, "word")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "doc_id", "rank", F.col("word").alias("term"), "tf", "df"
        )
    )


def pmi_bigrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_count: int = 3,
    k: int = 50,
    persisted_sink: list | None = None,
) -> DataFrame:
    """Top-``k`` PMI collocations — adjacent word pairs whose joint
    frequency most exceeds the independence expectation (the classic
    word2vec/phrase-mining preprocessing step; Church & Hanks 1990).

    The score is the exact integer cross-multiplication
    ``n_ab * N * 10^6 div (n_a * n_b)`` — a monotone transform of PMI
    (ppm of the independence ratio), so ranking is identical to float
    PMI while staying bit-exact cross-engine. Overflow bound:
    ``n_ab <= N`` and the product is ``<= N^2 * 10^6``, safe in int64
    for corpora to ~3 x 10^6 *distinct-pair-max* counts; at larger
    corpus mass callers drop the ppm scale or pre-divide N.

    Scale shape: pair construction is map-only (array HOF over the
    split words — adjacency never leaves the row); one hash aggregate
    per relation (pairs, unigrams); the unigram side joins back on the
    word keys (vocab-scale, NOT broadcast); final top-k is
    TakeOrderedAndProject (never a global sort). ``min_count`` prunes
    the pair tail before both joins.
    """
    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    docs_w = docs.select(words.alias("w"))
    uni = (
        docs_w.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n_w"))
    )
    if persisted_sink is not None:
        from pyspark import StorageLevel

        # the unigram aggregate is referenced three times (both word
        # joins + the corpus total) — without materialization each
        # reference replays the full corpus token aggregation
        uni = uni.persist(StorageLevel.MEMORY_AND_DISK)
        persisted_sink.append(uni)
    pair_expr = (
        "transform(sequence(1, size(w) - 1), "
        "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"
    )
    pairs = (
        docs_w.where(F.size("w") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    total = uni.agg(F.sum("n_w").cast("long").alias("n_total"))
    scored = (
        pairs.join(uni.select(F.col("word").alias("w1"), F.col("n_w").alias("n_a")), "w1")
        .join(uni.select(F.col("word").alias("w2"), F.col("n_w").alias("n_b")), "w2")
        .join(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_ab",
            F.expr("n_ab * n_total * 1000000 div (n_a * n_b)")
            .cast("long")
            .alias("pmi_ppm"),
        )
    )
    return (
        scored.orderBy(
            F.col("pmi_ppm").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(k)
        .select("w1", "w2", "n_ab", "pmi_ppm")
    )
