"""Typed-parity check: for every (queries(), oracle_sql()) pair, compare
the DuckDB result column *types* against Spark's schema.  The round
driver hashes typed values, so a DuckDB HUGEINT (uncast SUM) against a
Spark BIGINT hash-mismatches even when the values are identical; this
script catches that class locally without running Spark at all for the
type probe (DuckDB side) and with a schema-only Spark pass (no action).

Usage: python scripts/check_oracle_types.py [sf_dir]
"""
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB type -> acceptable Spark simpleString prefixes.
# Integer widths (int32 vs int64) hash identically in the driver
# (verified in round 1: text_lang_id et al. were hash-green with
# Spark int vs DuckDB BIGINT) — only HUGEINT (int128) breaks it.
_INTS = {"tinyint", "smallint", "int", "bigint", "long"}
COMPAT = {
    "BIGINT": _INTS,
    "INTEGER": _INTS,
    "SMALLINT": _INTS,
    "TINYINT": _INTS,
    "DOUBLE": {"double"},
    "FLOAT": {"float", "double"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp"},
    "DECIMAL": {"decimal"},
    "HUGEINT": set(),  # never OK: Spark has no int128
    "UHUGEINT": set(),
}


def main():
    from pdf_to_xls_vision_spark.plans.queries import ORACLES, QUERIES
    from pdf_to_xls_vision_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark(app_name="oracle-type-check")

    bad = []
    for name in sorted(ORACLES):
        rel = con.sql(ORACLES[name])
        d_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        sdf = QUERIES[name](spark, SF_DIR)
        s_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        for col, dt in d_types.items():
            base = dt.split("(")[0]
            st = s_types.get(col)
            if st is None:
                bad.append(f"{name}.{col}: missing on Spark side")
                continue
            ok = COMPAT.get(base)
            if ok is None:
                continue  # unmapped type (struct/list) — skip
            if not any(st.startswith(p) for p in ok):
                bad.append(f"{name}.{col}: duckdb={dt} spark={st}")
    if bad:
        print("TYPE MISMATCHES:")
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"all {len(ORACLES)} oracled queries type-compatible")


if __name__ == "__main__":
    main()
