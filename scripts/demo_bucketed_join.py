#!/usr/bin/env python3
"""Co-located join via Hive-style bucketing — the zero-shuffle join
evidence for the 100 TB design point.

Writes lineitem and orders as bucketed+sorted tables on the join key
(``bucketBy(16, key).sortBy(key)``), then joins them with broadcast
joins disabled (forcing the sort-merge path a 100 TB fact-fact join
takes) and counts Exchange operators in both plans:

- unbucketed parquet ⋈ parquet  → 2 Exchanges (both sides shuffle)
- bucketed  table   ⋈ table     → 0 Exchanges (bucket layout IS the
  hash partitioning; with sortBy the per-bucket sort is free too)

At 10^12 rows the two avoided exchanges are the dominant cost of every
recurring fact-fact join — bucketing pre-pays them once at write time,
which is why the ingest sink (sink/checkpoint.py) keys its output
files the same way. Usage:

    python scripts/demo_bucketed_join.py [sf_dir]

Prints one JSON line with both exchange counts and the matched row
counts (correctness check: bucketed and unbucketed joins agree).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def n_exchanges(df) -> int:
    txt = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # count real shuffles only (ReusedExchange re-reads, it doesn't shuffle)
    return len(re.findall(r"\bExchange\b", txt)) - len(
        re.findall(r"ReusedExchange", txt)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    warehouse = tempfile.mkdtemp(prefix="ptxv_bucket_demo_")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bucketed-join-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

        agg = lambda j: j.groupBy("o_orderpriority").agg(  # noqa: E731
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )

        plain = agg(li.join(orders, li.l_orderkey == orders.o_orderkey))
        plain_exch = n_exchanges(plain)
        plain_rows = sorted(map(tuple, plain.collect()))

        for name, df, key in (
            ("li_b", li, "l_orderkey"),
            ("ord_b", orders, "o_orderkey"),
        ):
            (
                df.write.mode("overwrite")
                .bucketBy(16, key)
                .sortBy(key)
                .format("parquet")
                .saveAsTable(name)
            )
        li_b, ord_b = spark.table("li_b"), spark.table("ord_b")
        bucketed = agg(li_b.join(ord_b, li_b.l_orderkey == ord_b.o_orderkey))
        # the final groupBy still shuffles once; the JOIN itself must not
        join_only_b = li_b.join(
            ord_b, li_b.l_orderkey == ord_b.o_orderkey
        ).select("l_orderkey")
        join_only_p = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).select("l_orderkey")
        out = {
            "plain_join_exchanges": n_exchanges(join_only_p),
            "bucketed_join_exchanges": n_exchanges(join_only_b),
            "plain_full_exchanges": plain_exch,
            "bucketed_full_exchanges": n_exchanges(bucketed),
            "rows_match": sorted(map(tuple, bucketed.collect())) == plain_rows,
            "n_groups": len(plain_rows),
        }
        print(json.dumps(out))
        assert out["bucketed_join_exchanges"] == 0, out
        assert out["rows_match"], "bucketed join changed results!"
    finally:
        spark.stop()
        shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
