"""Portable 60-bit hashing shared by dedup/similarity operators.

``h(salt, s) = int(md5(salt || ':' || s)[:15 hex], 16)`` — md5 is
byte-identical in every engine, 15 hex digits fit signed int64, so the
same expression is writable in Spark SQL and DuckDB and the driver's
value-hash comparison holds exactly. (xxhash64 would be faster
JVM-side but is not reproducible in DuckDB; these operators trade a
few cycles for a cross-engine oracle.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column | str, salt: str = "") -> Column:
    """Spark-side portable hash."""
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(f"{salt}:"), c)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")


def h60_sql(expr: str, salt: str = "") -> str:
    """DuckDB-side equivalent of :func:`h60` for oracle queries."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{salt}:', {expr})), 1, 15)) AS BIGINT)"
    )
