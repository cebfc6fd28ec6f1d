#!/usr/bin/env python3
"""Probe-aware IVF at 256 cells — the documented win region.

At 16 cells (the sf-fixture scale) the two-phase bound-pruned plan
costs more wall than a fixed nprobe fan-out because per-query fixed
costs dominate. This demo builds a 256-cluster blob corpus, trains a
256-cell coarse quantizer ONCE, and runs both search strategies with
the same centroids, verifying bit-identical results and reporting
wall + average scanned cells. Prints one JSON line.

Usage: python scripts/demo_probe_aware_256.py [n_vectors] [n_probes]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pdf_to_xls_vision_spark.functions.ann import (
        kmeans_train,
        make_blob_embeddings,
        topk_ivf_kmeans,
        topk_ivf_probe_aware,
    )
    from pdf_to_xls_vision_spark.session import get_spark
    from pyspark.sql import functions as F

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25600
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_cells, nprobe = 256, 8

    spark = get_spark(
        "demo_probe_aware_256",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = make_blob_embeddings(
        spark, n=n, d=16, n_clusters=n_cells, noise=0.05
    ).persist()
    emb.count()
    probes = emb.filter(F.col("vec_id") % (n // n_probes) == 0).persist()
    probes.count()

    # first_distinct init: maximin's 255 sequential top-1 jobs (each
    # with a 256-term least() expression) take >10 min at this k; one
    # job seeds fine on a blob corpus where distinct vectors abound
    t0 = time.perf_counter()
    cents = kmeans_train(emb, k=n_cells, iterations=2, init="first_distinct")
    t_train = time.perf_counter() - t0

    def run(df):
        t0 = time.perf_counter()
        rows = df.collect()
        return time.perf_counter() - t0, sorted(
            (r.query_id, r.rank, r.nbr_id, r.qdot) for r in rows
        )

    # warm-up then measure, interleaved
    walls_fixed, walls_aware = [], []
    fixed = aware = None
    scanned = None
    for rep in range(3):
        t, fixed = run(
            topk_ivf_kmeans(emb, probes, k=5, nprobe=nprobe, centroids=cents)
        )
        walls_fixed.append(t)
        sink: list = []
        t, aware = run(
            topk_ivf_probe_aware(
                emb, probes, k=5, nprobe_max=nprobe, centroids=cents,
                scanned_cells_sink=sink,
            )
        )
        walls_aware.append(t)
        if rep == 2:
            srows = sink[0].collect()
            scanned = sum(r.cells_scanned for r in srows) / len(srows)

    assert fixed == aware, "probe-aware result differs from fixed fan-out"
    print(json.dumps({
        "metric": "probe_aware_256_cells",
        "n_vectors": n,
        "n_probes": n_probes,
        "n_cells": n_cells,
        "nprobe_max": nprobe,
        "train_sec": round(t_train, 1),
        "wall_fixed_min": round(min(walls_fixed[1:]), 2),
        "wall_aware_min": round(min(walls_aware[1:]), 2),
        "walls_fixed": [round(w, 2) for w in walls_fixed],
        "walls_aware": [round(w, 2) for w in walls_aware],
        "avg_cells_scanned": round(scanned, 2),
        "identical_results": True,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
