"""Similarity search over embedding columns (``array<float>``).

- :func:`topk_dot_quantized` — brute-force top-k with an *integer-
  quantized* dot product (``floor(x * 1000)`` per component): fully
  deterministic across engines (no float summation-order ambiguity), so
  the DuckDB oracle matches bit-for-bit. The quantization is the only
  deviation from true cosine and is documented as such.
- :func:`topk_cosine` — true double-precision cosine via
  ``F.zip_with`` + ``F.aggregate`` (JVM-side, no UDF), for engine use.
- :func:`topk_ivf` — the scale path: a coarse inverted-file (cells =
  the ``label`` partition; in production a k-means assignment) so each
  probe scans one cell instead of the corpus. Cuts the cross product by
  the cell count; the same pattern shards a 100 TB embedding table.

Brute force is quadratic in probes x corpus — correct as a baseline
and as the in-cell scorer for IVF; never run it unpartitioned at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1000


def _qvec(col: Column) -> Column:
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT).cast("bigint"))


def _qdot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def topk_dot_quantized(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors per probe by integer-quantized dot product.

    ``probes`` has the same schema as ``embeddings``; ties break on
    ascending neighbor id so ranking is total and reproducible.
    """
    base = embeddings.select(
        F.col(id_col).alias("nbr_id"), _qvec(F.col(vec_col)).alias("nbr_vec")
    )
    q = probes.select(
        F.col(id_col).alias("query_id"), _qvec(F.col(vec_col)).alias("q_vec")
    )
    scored = q.crossJoin(base).filter(F.col("query_id") != F.col("nbr_id")).select(
        "query_id", "nbr_id", _qdot(F.col("q_vec"), F.col("nbr_vec")).alias("qdot")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "qdot")
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Double-precision cosine similarity, fully JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def topk_cosine(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """True-cosine brute-force top-k (engine-native; float summation
    order makes this one *not* oracle-exact — use the quantized variant
    for cross-engine checks)."""
    base = embeddings.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nv"))
    q = probes.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = q.crossJoin(base).filter(F.col("query_id") != F.col("nbr_id")).select(
        "query_id", "nbr_id", cosine_expr(F.col("qv"), F.col("nv")).alias("cosine")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-family member
    over vectors): all (a < b) pairs in the same coarse cell whose
    quantized cosine >= ``threshold``.

    Cell bucketing (IVF assignment; k-means at scale) replaces the
    all-pairs cross join exactly like LSH bands do for MinHash — the
    join shuffles on the cell key and AQE splits hot cells. The cosine
    is computed from integer-quantized components, so numerator and
    norms are exact integers; one sqrt + one divide in IEEE double is
    then bit-identical across engines (values < 2^53), keeping the
    DuckDB oracle exact.
    """
    sides = embeddings.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("vid"),
        _qvec(F.col(vec_col)).alias("qv"),
    ).withColumn("n2", _qdot(F.col("qv"), F.col("qv")))
    a, b = sides.alias("a"), sides.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vid") < F.col("b.vid")),
    ).select(
        F.col("a.vid").alias("vec_a"),
        F.col("b.vid").alias("vec_b"),
        (
            _qdot(F.col("a.qv"), F.col("b.qv"))
            / F.sqrt((F.col("a.n2") * F.col("b.n2")).cast("double"))
        ).alias("cos_raw"),
    )
    return (
        pairs.filter(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cosine_q"))
    )


def topk_ivf(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style search: score only within the probe's coarse cell.

    The cell equi-join replaces the cross join — at 1000 cells that is
    a 1000x scan reduction, and the join shuffles on the cell key,
    which buckets/cluster-bys trivially at scale.
    """
    base = embeddings.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("nbr_id"),
        _qvec(F.col(vec_col)).alias("nbr_vec"),
    )
    q = probes.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("query_id"),
        _qvec(F.col(vec_col)).alias("q_vec"),
    )
    scored = q.join(base, "cell").filter(F.col("query_id") != F.col("nbr_id")).select(
        "query_id", "nbr_id", _qdot(F.col("q_vec"), F.col("nbr_vec")).alias("qdot")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "qdot")
    )
