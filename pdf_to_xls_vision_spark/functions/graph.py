"""Graph centrality over co-occurrence edges: fixed-iteration
integer PageRank.

A training-data curator ranks sources/domains/items by link-graph
centrality (the quality signal behind "popular domains are cleaner"
heuristics). Classic PageRank is float-iterative and engine-order
dependent; this version keeps every rank an INTEGER scaled by
``SCALE`` with truncating division at each step, so a fixed number of
iterations is bit-identical across Spark, DuckDB (unrolled CTEs), and
a sequential model — summing integers is order-independent where
summing doubles is not.

Per iteration: ``contrib(u) = r(u) div outdeg(u)`` and

    r'(v) = (100 - d)·SCALE div (100·N)  +  d · Σ_in contrib(u) div 100

Dangling nodes (no out-edges) leak their damped mass — the common
"leaky" formulation (Spark's own GraphX example does the same); ranks
still order nodes by centrality, which is the curation use.

Scale shape: node/outdeg prep is two hash-aggregates; each iteration
is one shuffle-join of edges with ranks on ``src`` plus one
hash-aggregate on ``dst`` — the canonical distributed PageRank plan
(ranks are |V| rows, never broadcast). ``n_nodes`` is the only
driver-side value (one scalar count — metadata by the repo's rule).

No reference counterpart; part of the training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: ranks sum to ~SCALE (minus dangling leakage)
PR_SCALE = 10**12


def pagerank_fixed(
    edges: DataFrame,
    *,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    src: str = "src",
    dst: str = "dst",
    persisted_sink: list | None = None,
) -> DataFrame:
    """Integer PageRank over a distinct-edge DataFrame; returns
    ``(node, pr_scaled)`` for every node that appears as a src or dst.

    ``iters`` is a plan-unroll count (each adds one join + one
    aggregate to the lineage), matching the unrolled-CTE oracle replay
    the same way the k-means oracles replay Lloyd rounds.

    The edge+outdeg and node relations are referenced by EVERY
    iteration; without materialization their derivation re-executes
    per lineage path (AQE exchange reuse recovers only the identical-
    exchange subtrees). At deployment scale do what GraphX does —
    cache the per-iteration constants: pass ``persisted_sink`` (the
    repo's leak-guard pattern, ``operators/pipeline.py``) and both
    relations are persisted MEMORY_AND_DISK and appended for the
    caller to unpersist after materializing. Registered toy-scale
    queries skip it (recompute of a 6k-row derivation is cheaper than
    cross-rep cache leakage in the bench loop).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 1 <= damping_pct <= 99:
        raise ValueError("damping_pct must be in [1, 99]")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(src).agg(F.count("*").cast("long").alias("deg"))
    ed = edges.select(src, dst).join(outdeg, src)
    if persisted_sink is not None:
        from pyspark import StorageLevel

        ed = ed.persist(StorageLevel.MEMORY_AND_DISK)
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
        persisted_sink.extend([ed, nodes])
    n_nodes = nodes.count()  # one scalar — driver metadata (fills the
    # nodes cache when persisted)
    if n_nodes == 0:
        raise ValueError("edge set is empty")
    base = (100 - damping_pct) * scale // (100 * n_nodes)
    ranks = nodes.select(
        "node", F.lit(scale // n_nodes).cast("long").alias("r")
    )
    for _ in range(iters):
        inflow = (
            ed.join(ranks, ed[src] == ranks["node"])
            .select(
                F.col(dst).alias("node"), F.expr("r div deg").alias("c")
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        ranks = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"{damping_pct} * coalesce(s, cast(0 as bigint)) div 100"
                )
            )
            .cast("long")
            .alias("r"),
        )
    return ranks.select("node", F.col("r").alias("pr_scaled"))


def pagerank_fixed_sql(
    edges_cte: str,
    *,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB replay of :func:`pagerank_fixed`: the unrolled CTE
    chain over an ``edges(src, dst)`` CTE named ``edges_cte``.
    Returns only the CTE body — the caller appends its own final
    ``SELECT ... FROM r{iters}`` (columns ``node``, ``r``)."""
    d = damping_pct
    parts = [
        f"nodes AS (SELECT DISTINCT n AS node FROM ("
        f"SELECT src AS n FROM {edges_cte} UNION ALL "
        f"SELECT dst FROM {edges_cte}))",
        "params AS (SELECT count(*)::BIGINT AS n_nodes FROM nodes)",
        f"outdeg AS (SELECT src, count(*)::BIGINT AS deg "
        f"FROM {edges_cte} GROUP BY src)",
        f"r0 AS (SELECT node, ({scale} // p.n_nodes)::BIGINT AS r "
        f"FROM nodes, params p)",
    ]
    for i in range(iters):
        parts.append(
            f"inf{i} AS (SELECT e.dst AS node, "
            f"sum(r.r // o.deg)::BIGINT AS s "
            f"FROM {edges_cte} e "
            f"JOIN r{i} r ON e.src = r.node "
            f"JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{i + 1} AS (SELECT n.node, "
            f"(({100 - d} * {scale}) // (100 * p.n_nodes) "
            f"+ ({d} * coalesce(i.s, 0)) // 100)::BIGINT AS r "
            f"FROM nodes n CROSS JOIN params p "
            f"LEFT JOIN inf{i} i ON n.node = i.node)"
        )
    return ",\n".join(parts)
