"""PII scrubbing for training-data curation.

Regex redaction of the three classic identifier shapes (emails, NANP
phone numbers, IPv4 addresses) plus per-document match counts — the
standard pre-training scrub pass (e.g. C4/Dolma-style pipelines).

Every pattern is deliberately lookahead-free and uses only syntax with
identical semantics in Java regex (Spark executors) and RE2 (the DuckDB
oracle), so the operator is exactly replayable: same input, same
redacted output, same counts, on both engines.

Scale shape: pure per-row JVM ``regexp_replace`` / ``regexp_count``
expressions — map-only, whole-stage-codegen, zero shuffle. At 100 TB
this runs at scan speed; there is nothing to partition or skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: lookahead-free, Java+RE2-identical patterns
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def pii_scrub_exprs(text_col: str | Column) -> dict[str, Column]:
    """Redaction + count expressions for one text column.

    Replacement order matters and is fixed: emails first (their local
    parts can contain digit runs an IP/phone pattern could nibble at),
    then phones, then IPv4 — counts are taken on the original text so
    they are order-independent.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    scrubbed = F.regexp_replace(c, EMAIL_PATTERN, EMAIL_TOKEN)
    scrubbed = F.regexp_replace(scrubbed, PHONE_PATTERN, PHONE_TOKEN)
    scrubbed = F.regexp_replace(scrubbed, IPV4_PATTERN, IP_TOKEN)
    return {
        "scrubbed": scrubbed,
        "n_emails": F.regexp_count(c, F.lit(EMAIL_PATTERN)),
        "n_phones": F.regexp_count(c, F.lit(PHONE_PATTERN)),
        "n_ips": F.regexp_count(c, F.lit(IPV4_PATTERN)),
    }


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document scrub: redacted text + per-category match counts."""
    e = pii_scrub_exprs(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        e["scrubbed"].alias("scrubbed"),
        e["n_emails"].alias("n_emails"),
        e["n_phones"].alias("n_phones"),
        e["n_ips"].alias("n_ips"),
    )
