#!/usr/bin/env python3
"""Measure ONLY the full extraction pipeline (wall + executor time,
warm-up then min of N reps) — the quick half of an interleaved A/B:
run on one code state, `git stash`, run on the other, repeat.

Usage: python scripts/ab_full_pipeline.py [docs] [reps] [retry_strategy]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
UI_PORT = 40446


def exec_ms(spark) -> int:
    sc = spark.sparkContext
    url = (
        f"http://localhost:{UI_PORT}/api/v1/applications/"
        f"{sc.applicationId}/stages?status=complete"
    )
    with urllib.request.urlopen(url, timeout=10) as r:
        return sum(st.get("executorRunTime", 0) for st in json.load(r))


def main() -> None:
    from pdf_to_xls_vision_spark.corpus import write_corpus_parquet
    from pdf_to_xls_vision_spark.operators.pipeline import run_extraction
    from pdf_to_xls_vision_spark.session import get_spark

    docs_n = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    strategy = sys.argv[3] if len(sys.argv) > 3 else "single_parse"
    corpus_path = f"/tmp/ptxv_bench_corpus_{docs_n}.parquet"
    if not os.path.exists(corpus_path):
        write_corpus_parquet(corpus_path, docs_n)

    spark = get_spark(
        "ab_full_pipeline",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)

    def one():
        # fresh plan + sink per rep, and unpersist after the write:
        # the single_parse strategy persists its doc-level merge
        # output INSIDE the plan, so re-executing a built plan (or
        # leaving the cache warm) would measure cache reads, not the
        # pipeline
        sink: list = []
        df = run_extraction(
            corpus, retry_strategy=strategy, persisted_sink=sink
        )
        e0 = exec_ms(spark)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out = time.perf_counter() - t0, (exec_ms(spark) - e0) / 1000.0
        for c in sink:
            c.unpersist(blocking=True)
        return out

    one()  # warm-up
    walls, execs = zip(*[one() for _ in range(reps)])
    print(json.dumps({
        "docs": docs_n,
        "retry_strategy": strategy,
        "wall_min": round(min(walls), 2),
        "exec_min": round(min(execs), 1),
        "walls": [round(w, 2) for w in walls],
        "execs": [round(e, 1) for e in execs],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
