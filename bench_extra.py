#!/usr/bin/env python3
"""Per-query measurement harness for optimization work (guide §1).

``bench.py`` is frozen (driver contract); this file carries the extra
measurements the optimization round needs:

- time any subset of registered queries with the same
  warmup1_bestof2 / noop-sink / persisted-thunk methodology bench.py
  uses, so numbers are comparable line-for-line;
- report wall AND executor-run-time seconds (the contention-immune
  triage signal) plus job/stage counts per query (the barrier-count
  signal that dominates wall at toy SF);
- optionally dump ``explain("formatted")`` before running.

Usage:
    python bench_extra.py q1 q2 ...          # time those queries
    python bench_extra.py --all              # the bench.py HEADLINE set
    python bench_extra.py --explain DIR q1   # also write DIR/<q>.txt
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "2"))
WARMUP = int(os.environ.get("SPARK_GRAFT_EXTRA_WARMUP", "1"))

_SPARK = None


def _rest(path: str):
    import urllib.request

    sc = _SPARK.sparkContext
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _metrics() -> tuple[int, int, int]:
    """(executorRunTime ms, completed stage count, completed task count)."""
    try:
        stages = _rest("stages?status=complete")
        return (
            sum(st.get("executorRunTime", 0) for st in stages),
            len(stages),
            sum(st.get("numCompleteTasks", 0) for st in stages),
        )
    except Exception:
        return (0, 0, 0)


def _run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def time_query(spark, name: str, explain_dir: str | None = None) -> dict:
    from pdf_to_xls_vision_spark.plans.queries import QUERIES

    spark.sparkContext.setJobDescription(f"bench_extra: {name}")
    probe = QUERIES[name](spark, SF_DIR)
    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        jdf = probe._jdf
        txt = jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
            f.write(txt)
    probe_sink = getattr(probe, "_ptxv_persisted", None)

    def _once() -> float:
        if probe_sink is None:
            return _run(probe)
        d = QUERIES[name](spark, SF_DIR)
        sink = list(getattr(d, "_ptxv_persisted", []))
        wall = _run(d)
        for c in sink:
            c.unpersist(blocking=True)
        return wall

    if probe_sink is not None:
        for c in probe_sink:
            c.unpersist(blocking=True)
    for _ in range(WARMUP):
        _once()
    walls, execs, stages, tasks = [], [], [], []
    for _ in range(REPS):
        e0, s0, t0 = _metrics()
        walls.append(_once())
        e1, s1, t1 = _metrics()
        execs.append((e1 - e0) / 1000.0)
        stages.append(s1 - s0)
        tasks.append(t1 - t0)
    i = walls.index(min(walls))
    return {
        "wall": round(min(walls), 3),
        "exec_sec": round(execs[i], 3),
        "stages": stages[i],
        "tasks": tasks[i],
        "walls": [round(w, 3) for w in walls],
    }


def main() -> None:
    global _SPARK
    from pdf_to_xls_vision_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    explain_dir = None
    if "--explain" in args:
        i = args.index("--explain")
        explain_dir = args[i + 1]
        del args[i : i + 2]
    if "--all" in args:
        import bench

        names = list(bench.HEADLINE)
    else:
        names = args

    spark = get_spark(
        "bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    _SPARK = spark

    out = {}
    for name in names:
        r = time_query(spark, name, explain_dir)
        out[name] = r
        print(
            f"{name:34s} wall={r['wall']:7.3f} exec={r['exec_sec']:8.3f} "
            f"stages={r['stages']:3d} tasks={r['tasks']:5d} walls={r['walls']}",
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
