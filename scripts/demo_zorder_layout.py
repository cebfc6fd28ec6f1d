#!/usr/bin/env python3
"""Z-order layout: measured row-group pruning evidence.

Writes the SAME 2-D dataset in three physical layouts — random,
linear (range-sorted by x only), and z-ordered (range-sorted by
morton(x, y)) — with small parquet row groups, then computes, from the
actual parquet footers (pyarrow min/max statistics, the same bounds an
Iceberg/Delta reader prunes on), how many row groups a min/max-pruning
scan must visit for:

- a 2-D box predicate (selective in both dims),
- a y-only band predicate (the case a linear-x layout cannot prune).

Also verifies all three layouts return identical query results in
Spark. Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import pyarrow.parquet as papq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = 2_000_000
DIM = 1024  # x, y uniform in [0, DIM)
N_FILES = 32
BOX = (100, 180, 200, 280)  # x_lo, x_hi, y_lo, y_hi
BAND = (500, 540)  # y-only


def rg_overlap(path_glob: str, pred) -> tuple[int, int]:
    total = scanned = 0
    for f in sorted(glob.glob(path_glob)):
        md = papq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            st = {
                name: g.column(idx).statistics
                for name, idx in cols.items()
                if name in ("x", "y")
            }
            total += 1
            if pred(st):
                scanned += 1
    return total, scanned


def main() -> None:
    from pyspark.sql import functions as F

    from pdf_to_xls_vision_spark.functions.hashing import h60
    from pdf_to_xls_vision_spark.functions.layout import zorder_layout
    from pdf_to_xls_vision_spark.session import get_spark

    spark = get_spark(
        "zorder-demo",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ptxv_zorder")

    # deterministic uniform 2-D points from the portable hash
    src = (
        spark.range(N_ROWS)
        .withColumn("x", F.pmod(h60(F.col("id").cast("string"), "zx"), F.lit(DIM)))
        .withColumn("y", F.pmod(h60(F.col("id").cast("string"), "zy"), F.lit(DIM)))
        .select("id", "x", "y")
    )

    layouts = {
        "random": src.repartition(N_FILES),
        "linear_x": src.repartitionByRange(N_FILES, "x").sortWithinPartitions("x"),
        "zorder": zorder_layout(src, "x", "y", n_files=N_FILES)
        .sortWithinPartitions("zkey")
        .drop("zkey"),
    }
    paths = {}
    for name, df in layouts.items():
        p = f"{base}/{name}.parquet"
        (
            df.write.mode("overwrite")
            .option("parquet.block.size", 256 * 1024)
            .parquet(p)
        )
        paths[name] = p

    # identical results across layouts (the layout changes IO, not answers)
    x_lo, x_hi, y_lo, y_hi = BOX
    counts = {
        name: spark.read.parquet(p)
        .filter(
            (F.col("x") >= x_lo) & (F.col("x") <= x_hi)
            & (F.col("y") >= y_lo) & (F.col("y") <= y_hi)
        )
        .count()
        for name, p in paths.items()
    }
    assert len(set(counts.values())) == 1, counts

    def box_pred(st):
        sx, sy = st["x"], st["y"]
        return not (
            sx.max < x_lo or sx.min > x_hi or sy.max < y_lo or sy.min > y_hi
        )

    b_lo, b_hi = BAND

    def band_pred(st):
        sy = st["y"]
        return not (sy.max < b_lo or sy.min > b_hi)

    out = {
        "rows": N_ROWS,
        "files": N_FILES,
        "box_rows": counts["zorder"],
        "box": {},
        "y_band": {},
    }
    for name, p in paths.items():
        total, scanned = rg_overlap(f"{p}/*.parquet", box_pred)
        out["box"][name] = {"rg_total": total, "rg_scanned": scanned}
        total, scanned = rg_overlap(f"{p}/*.parquet", band_pred)
        out["y_band"][name] = {"rg_total": total, "rg_scanned": scanned}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
