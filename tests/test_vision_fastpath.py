"""Proof obligations for the V6 fast-path grid parser.

``parse_vision_grid_fast`` must be *extensionally identical* to the
spec composition ``_frame_payload(parse_vision_csv(content))`` on every
input it accepts, and must return ``VISION_FALLBACK`` (not a wrong
grid) on anything outside its proven grammar. The spec ladder
(pandas read_csv, table_extraction.py:136-160 semantics) remains the
definition; the fast path is an optimization that is only allowed to
exist because of this file.
"""

from __future__ import annotations

import pytest

from pdf_to_xls_vision_spark.core.vision import (
    VISION_FALLBACK,
    parse_vision_csv,
    parse_vision_grid_fast,
    stub_csv,
)
from pdf_to_xls_vision_spark.operators.extract import _frame_payload


def spec_grid(content):
    df = parse_vision_csv(content)
    return None if df is None else _frame_payload(df)


def check_equivalent(content) -> bool:
    """Assert fast == spec when fast doesn't fall back; return whether
    the fast path handled it."""
    fast = parse_vision_grid_fast(content)
    if fast is VISION_FALLBACK:
        return False
    assert fast == spec_grid(content), f"fast-path divergence on {content!r}"
    return True


def test_stub_corpus_sweep():
    """Every defensive branch of the stub generator (fences, malformed
    lines, cascades, paren artifacts, no-table) over a large ref sweep:
    the fast path must agree wherever it engages, and must engage on
    the great majority of pages (the malformed ~8% legitimately falls
    back to the bad-lines ladder)."""
    handled = total = 0
    for d in range(800):
        for p in range(2):
            total += 1
            handled += check_equivalent(stub_csv(f"img://sweepdoc{d}/p{p}"))
    assert handled / total > 0.80, (handled, total)


INT_NA_CASES = [
    # all-int column -> int64: leading zeros and -0 normalize
    "a,b\n007,x\n123,y\n-0,z",
    # int column with NA -> float64: "123" -> "123.0"
    "a,b\n123,x\n,y",
    # all-NA column -> float64 NaN -> None (the empty Notes column)
    "Row_Type,Notes\nDETAIL,\nHEADER,",
    # NA tokens in object and numeric columns
    "a,b\nNaN,NULL\nfoo,N/A\nbar,<NA>",
    # quoted thousands separators stay strings
    'Row_Type,Category,2024\nDETAIL,Rent,"1,234"\nROLLUP,Total,"(2,345)"',
    # empty quoted field is NA
    'a,b\n"",x\n1,y',
    # mixed numeric-looking and text stays raw strings
    "a\n123\nabc",
    # accounting artifacts from the stub grammar
    "Row_Type,Category,2024\nDETAIL,Repairs,( 297)\nDETAIL,Water,(( 88)",
    # percent cells are object
    "a\n12.34%\n5.00%",
    # markdown fence strip
    "```csv\nRow_Type,Category\nDETAIL,Rent\n```",
    # Unicode digits: int()-parseable in Python but strings to pandas'
    # C parser — must stay raw (ASCII-only regex classes)
    "a,b\n٣,x\n١٢٣,y",
    "a,b\n１２３,x\n1,y",
    # underscore ints: int()-parseable, strings to pandas
    "a,b\n123_456,x\n1,y",
    # lone dot is not a number
    "a,b\n.,x\n1,y",
]


@pytest.mark.parametrize("content", INT_NA_CASES)
def test_fast_path_handles_and_matches(content):
    assert check_equivalent(content), f"expected fast path on {content!r}"


FALLBACK_CASES = [
    # genuine float column (strtod formatting risk)
    "a,b\n0.10,x\n2.5,y",
    # int mixed with float
    "a,b\n1,x\n2.5,y",
    # inf is float-parseable in pandas
    "a,b\ninf,x\n1,y",
    # bool tokens convert even next to NAs
    "a,b\nTRUE,x\n,y",
    "a,b\nTrue,x\nFalse,y",
    # whitespace-padded numerics: pandas strips before converting
    "a,b\n 123 ,x\n7,y",
    # width mismatch: extra fields (bad-lines ladder / index inference)
    "a,b\n1,2\n3,4,5",
    # width mismatch: short row (NaN padding)
    "a,b\n1,2\n3",
    # duplicate header names mangle
    "a,a\n1,2",
    # empty header cell becomes 'Unnamed: N'
    "a,\n1,2",
    # embedded quote oddities
    'a,b\n"x" y,z',
    # header-only
    "a,b",
    # int64 overflow stays object in pandas
    "a\n99999999999999999999999\n1",
]


@pytest.mark.parametrize("content", FALLBACK_CASES)
def test_fallback_cases_refused(content):
    assert parse_vision_grid_fast(content) is VISION_FALLBACK
    # and the pipeline composition (fallback -> spec ladder) is total:
    spec_grid(content)


def test_empty_inputs():
    for content in (None, "", "   "):
        assert parse_vision_grid_fast(content) is None
        assert spec_grid(content) is None
