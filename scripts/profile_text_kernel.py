#!/usr/bin/env python3
"""Profile the text-path extraction kernel (extract_text_pages) on
realistic Arrow-batch-shaped pandas input, without Spark — isolates
kernel Python cost from scan/shuffle/Arrow. Usage:

    python scripts/profile_text_kernel.py [n_docs] [--cprofile]
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import pandas as pd

from pdf_to_xls_vision_spark.corpus import generate_corpus
from pdf_to_xls_vision_spark.operators.extract import extract_text_pages


def build_batches(n_docs: int, batch_rows: int = 2000) -> list[pd.DataFrame]:
    docs = generate_corpus(n_docs)
    rows = []
    for doc_id, spans in docs:
        for span in spans:
            rows.append(
                {
                    "doc_id": doc_id,
                    "route": "text",
                    "page": span["offset"] + 1,
                    "kind": span["kind"],
                    "text": span["text"],
                    "media_ref": span["media_ref"],
                }
            )
    full = pd.DataFrame(rows)
    return [
        full.iloc[i : i + batch_rows].reset_index(drop=True)
        for i in range(0, len(full), batch_rows)
    ]


def run(batches):
    n = 0
    for out in extract_text_pages(iter(batches)):
        n += len(out)
    return n


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    batches = build_batches(n_docs)
    n_pages = sum(len(b) for b in batches)
    print(f"{n_docs} docs, {n_pages} pages, {len(batches)} batches")

    # warm
    run(batches[:1])

    if "--cprofile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        rows = run(batches)
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(30)
        print(f"rows={rows}")
    else:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = run(batches)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(
            f"rows={rows} best={best:.3f}s "
            f"pages_per_sec={n_pages / best:.0f}"
        )


if __name__ == "__main__":
    main()
