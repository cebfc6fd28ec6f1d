#!/usr/bin/env python3
"""Payload-width A/B for the grid/spans JSON-string contracts.

Round-4 shipped two Arrow-boundary changes: the extraction rows'
``header``/``rows`` nested columns became ONE ``grid`` JSON string
(input hop), and result spans became ONE ``spans_json`` string per doc
(output hop). The measured rationale: Arrow/pandas conversion of
nested ``array<array<string>>`` materializes one Python object per
CELL, while a string column is one buffer per row — so the win should
GROW with table width. The 8k-doc corpus averages ~6 columns; this
script synthesizes wider tables and measures the hop cost of both
representations as a function of width (round-5 backlog item 2).

Protocol: identical logical payloads (same cells, same ~10% None
rate), same total cell count per variant (docs x rows x cols held at
DOCS x CELLS_PER_DOC), written once to parquet; the measured region is
the real pipeline shape — a ``doc_id`` exchange feeding
``applyInPandas`` that consumes every cell (non-null count + total
length). Both representations must return identical results (asserted
per width). Wall + executorRunTime deltas, warmup 1 then best of
``--reps``, one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = 2000
CELLS_PER_DOC = 480  # divisible by every width below
WIDTHS = (5, 20, 48)


def _make_grid(doc: int, rows: int, cols: int) -> list[list[str | None]]:
    out = []
    for r in range(rows):
        row = []
        for c in range(cols):
            v = (doc * 31 + r * 7 + c) % 10
            row.append(None if v == 0 else f"cell{v}x{(r + c) % 97}")
        out.append(row)
    return out


def _executor_ms(spark) -> int:
    sc = spark.sparkContext
    url = (
        f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
        "/stages?status=complete"
    )
    with urllib.request.urlopen(url, timeout=10) as r:
        return sum(st.get("executorRunTime", 0) for st in json.load(r))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--docs", type=int, default=DOCS)
    args = ap.parse_args()

    import pandas as pd

    from pdf_to_xls_vision_spark.session import get_spark

    spark = get_spark(
        "ab-payload-width",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_schema = (
        "doc_id long, n_cells long, n_nonnull long, total_len long"
    )

    def consume_nested(pdf):
        cells = nonnull = tlen = 0
        for grid in pdf["grid"]:
            for row in grid:
                for v in row:
                    cells += 1
                    if v is not None:
                        nonnull += 1
                        tlen += len(v)
        return pd.DataFrame(
            [(int(pdf["doc_id"].iloc[0]), cells, nonnull, tlen)],
            columns=["doc_id", "n_cells", "n_nonnull", "total_len"],
        )

    def consume_json(pdf):
        cells = nonnull = tlen = 0
        for s in pdf["grid_json"]:
            for row in json.loads(s):
                for v in row:
                    cells += 1
                    if v is not None:
                        nonnull += 1
                        tlen += len(v)
        return pd.DataFrame(
            [(int(pdf["doc_id"].iloc[0]), cells, nonnull, tlen)],
            columns=["doc_id", "n_cells", "n_nonnull", "total_len"],
        )

    results = {}
    tmp = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ptxv_ab_width")
    for width in WIDTHS:
        rows = CELLS_PER_DOC // width
        payload = [
            (d, _make_grid(d, rows, width)) for d in range(args.docs)
        ]
        nested_path = f"{tmp}/nested_{width}.parquet"
        json_path = f"{tmp}/json_{width}.parquet"
        spark.createDataFrame(
            payload, "doc_id long, grid array<array<string>>"
        ).repartition(32).write.mode("overwrite").parquet(nested_path)
        spark.createDataFrame(
            [
                (d, json.dumps(g, separators=(",", ":")))
                for d, g in payload
            ],
            "doc_id long, grid_json string",
        ).repartition(32).write.mode("overwrite").parquet(json_path)

        variants = {
            "nested": (
                spark.read.parquet(nested_path)
                .groupBy("doc_id")
                .applyInPandas(consume_nested, out_schema)
            ),
            "json": (
                spark.read.parquet(json_path)
                .groupBy("doc_id")
                .applyInPandas(consume_json, out_schema)
            ),
        }
        # identical results check (order-insensitive)
        got = {
            k: sorted(map(tuple, df.collect())) for k, df in variants.items()
        }
        assert got["nested"] == got["json"], f"width {width}: results differ"

        stats = {}
        for name, df in variants.items():
            df.write.format("noop").mode("overwrite").save()  # warmup
            best_wall, best_exec = None, None
            for _ in range(args.reps):
                e0 = _executor_ms(spark)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                wall = time.perf_counter() - t0
                exec_s = (_executor_ms(spark) - e0) / 1000.0
                if best_wall is None or wall < best_wall:
                    best_wall = wall
                if best_exec is None or exec_s < best_exec:
                    best_exec = exec_s
            stats[name] = {
                "wall_s": round(best_wall, 3),
                "exec_s": round(best_exec, 3),
            }
        stats["exec_ratio_nested_over_json"] = round(
            stats["nested"]["exec_s"] / max(stats["json"]["exec_s"], 1e-9), 2
        )
        results[f"width_{width}"] = stats
        print(f"width {width}: {stats}", file=sys.stderr)

    print(
        json.dumps(
            {
                "docs": args.docs,
                "cells_per_doc": CELLS_PER_DOC,
                "reps": args.reps,
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
