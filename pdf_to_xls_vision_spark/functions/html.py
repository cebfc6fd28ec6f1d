"""HTML main-content extraction (north-rule parenthetical: "HTML
boilerplate strip, ... DOM heuristics").

Two tiers, Spark-first:

- :func:`strip_tags_expr` — pure JVM expression chain (script/style/
  comment removal, tag strip, entity decode, whitespace collapse).
  Stays inside whole-stage codegen; has an exact DuckDB oracle.
- :func:`extract_main_content` — block-level boilerplate removal in
  the spirit of Arc90-Readability / jusText / Boilerpipe (public
  algorithms): segment the document into block-tag chunks, score each
  by text density (text chars per markup char) and link density
  (chars inside <a> over total chars), keep content blocks. Block
  scoring is sequential per document -> Arrow-batched ``mapInPandas``,
  never per-row Python in the plan.

The synthetic HTML corpus (:func:`synthesize_html`) wraps deterministic
article paragraphs in nav/ads/footer boilerplate and records the golden
main text, so extraction is exactly checkable without external data.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# tier 1: tag strip as JVM expressions (oracle-exact)
# --------------------------------------------------------------------------

#: ordered (pattern, replacement) chain; identical semantics in Spark
#: regexp_replace (Java regex) and DuckDB regexp_replace(..., 'g').
STRIP_RULES: list[tuple[str, str]] = [
    (r"(?s)<script.*?</script>", " "),
    (r"(?s)<style.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
]

ENTITY_RULES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
]


def strip_tags_expr(col: str | Column) -> Column:
    """Plain text of an HTML string: markup removed, entities decoded,
    whitespace collapsed and trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in STRIP_RULES:
        c = F.regexp_replace(c, pat, rep)
    for ent, rep in ENTITY_RULES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def strip_tags_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`strip_tags_expr`."""
    out = expr
    for pat, rep in STRIP_RULES:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'gs')"
    # DuckDB 'g' flag handles global; (?s) covered by the 's' flag above,
    # so strip the inline flag from the pattern text:
    out = out.replace("(?s)", "")
    for ent, rep in ENTITY_RULES:
        rep_sql = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{rep_sql}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


# --------------------------------------------------------------------------
# tier 2: block-level boilerplate removal (pandas UDF)
# --------------------------------------------------------------------------

_BLOCK_SPLIT = re.compile(
    r"(?is)</?(?:div|p|section|article|nav|footer|header|aside|ul|table|h[1-6])[^>]*>"
)
_TAG = re.compile(r"(?s)<[^>]+>")
_SCRIPT_STYLE = re.compile(r"(?is)<(script|style).*?</\1>|<!--.*?-->")
_ANCHOR_TEXT = re.compile(r"(?is)<a[^>]*>(.*?)</a>")
_WS = re.compile(r"\s+")

#: jusText-style thresholds (public heuristics): a content block has
#: enough text, low link density, and high text-to-markup density.
MIN_BLOCK_CHARS = 40
MAX_LINK_DENSITY = 0.33
MIN_TEXT_DENSITY = 2.0


def _block_text(block: str) -> str:
    return _WS.sub(" ", _TAG.sub(" ", block)).strip()


def main_content_of(html: str) -> str:
    """Main text of one HTML document (the per-doc kernel).

    Splits on block-level tag boundaries, scores each chunk, keeps
    content blocks in order, joins with single spaces.
    """
    if not html:
        return ""
    cleaned = _SCRIPT_STYLE.sub(" ", html)
    kept: list[str] = []
    for block in _BLOCK_SPLIT.split(cleaned):
        text = _block_text(block)
        if len(text) < MIN_BLOCK_CHARS:
            continue
        anchor_chars = sum(
            len(_WS.sub(" ", m).strip()) for m in _ANCHOR_TEXT.findall(block)
        )
        link_density = anchor_chars / len(text)
        markup_chars = max(len(block) - len(text), 1)
        text_density = len(text) / markup_chars
        if link_density <= MAX_LINK_DENSITY and text_density >= MIN_TEXT_DENSITY:
            kept.append(text)
    return " ".join(kept)


def extract_main_content(
    docs: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Distributed main-content extraction: ``mapInPandas`` over Arrow
    batches of HTML documents -> (doc_id, main_text, n_chars)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            texts = [main_content_of(h) for h in b[html_col].fillna("")]
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col],
                    "main_text": texts,
                    "n_chars": [len(t) for t in texts],
                }
            )

    return docs.select(id_col, html_col).mapInPandas(
        run, "doc_id string, main_text string, n_chars int"
    )


# --------------------------------------------------------------------------
# deterministic HTML corpus (golden main text included)
# --------------------------------------------------------------------------

_WORDS = [
    "statement", "quarterly", "revenue", "expense", "operating", "margin",
    "property", "portfolio", "analysis", "schedule", "period", "summary",
    "capital", "maintenance", "occupancy", "leasing", "management", "annual",
]
_NAV_ITEMS = ["Home", "Reports", "About", "Contact", "Login", "Pricing"]


def _sentence(rng: np.random.Generator, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)).capitalize() + "."


def synthesize_html(n_docs: int, seed: int = 42) -> list[dict]:
    """Deterministic HTML docs: boilerplate (nav/ads/footer, high link
    density or low text density) around golden article paragraphs."""
    out = []
    for i in range(n_docs):
        rng = np.random.default_rng([seed, i])
        nav = "<nav><ul>" + "".join(
            f'<li><a href="/{x.lower()}">{x}</a></li>' for x in _NAV_ITEMS
        ) + "</ul></nav>"
        ad = (
            '<aside class="ad"><a href="/buy">'
            + _sentence(rng, 3)
            + "</a></aside>"
        )
        paras = [
            _sentence(rng, int(rng.integers(12, 25))) for _ in range(int(rng.integers(2, 6)))
        ]
        article = "".join(f"<p>{p}</p>" for p in paras)
        footer = (
            "<footer>© 2026 corp · "
            + " · ".join(f'<a href="/{x}">{x}</a>' for x in ["terms", "privacy"])
            + "</footer>"
        )
        comment = "<!-- tracking pixel --><script>var x=1;</script>"
        html = (
            f"<html><head><style>.ad{{color:red}}</style></head><body>"
            f"{nav}{ad}<article>{article}</article>{comment}{footer}</body></html>"
        )
        out.append(
            {
                "doc_id": f"html-{i:06d}",
                "html": html,
                "golden_main": " ".join(paras),
            }
        )
    return out
