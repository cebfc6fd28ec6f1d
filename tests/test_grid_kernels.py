"""List-form kernel parity: the pandas-free grid kernels (the Spark
hot path) must agree cell-for-cell and issue-for-issue with the pandas
reference implementations on every text page of the deterministic
corpus, plus targeted threshold/edge cases."""

from __future__ import annotations

import pandas as pd

from pdf_to_xls_vision_spark.core.layout import (
    parse_text_page_grids,
    parse_text_page_payload,
)
from pdf_to_xls_vision_spark.core.merge import (
    GridRecord,
    TableRecord,
    merge_continuations,
    merge_grid_continuations,
)
from pdf_to_xls_vision_spark.core.numbers import (
    extract_numbers_from_frame,
    extract_numbers_from_grid,
)
from pdf_to_xls_vision_spark.core.quality import (
    grid_quality_issues,
    table_quality_issues,
)
from pdf_to_xls_vision_spark.core.spans import (
    count_rollup_rows,
    general_notes,
    grid_notes,
    grid_rollup_rows,
    serialize_grid_spans,
    serialize_spans,
)


def _frame_to_grid(df: pd.DataFrame) -> tuple[list, list]:
    header = [None if pd.isna(c) else str(c) for c in df.columns]
    rows = [
        [None if pd.isna(v) else str(v) for v in row]
        for row in df.itertuples(index=False, name=None)
    ]
    return header, rows


def test_corpus_wide_parity(tiny_corpus):
    """Every text page of the corpus: parse + prune + quality agree."""
    pages = 0
    for _doc_id, spans in tiny_corpus:
        for s in spans:
            if s["kind"] != "text":
                continue
            pages += 1
            old = [
                (*_frame_to_grid(df), table_quality_issues(df))
                for df in parse_text_page_payload(s["text"])
            ]
            new = [
                (h, r, grid_quality_issues(h, r))
                for h, r in parse_text_page_grids(s["text"])
            ]
            assert old == new
    assert pages > 100  # the corpus actually exercised the kernels


def _records(kind, tables):
    """Build paired frame/grid records from (page, header, rows) specs."""
    frames = [
        TableRecord(
            frame=pd.DataFrame(rows, columns=header), page=p, table_id=1
        )
        for p, header, rows in tables
    ]
    grids = [
        GridRecord(header=list(header), rows=[list(r) for r in rows], page=p, table_id=1)
        for p, header, rows in tables
    ]
    return frames if kind == "frame" else grids


CONT_TABLES = [
    (1, ["Row_Type", "Category", "Jan"], [["DETAIL", "Rent", "100"], ["ROLLUP", "Total", "100"]]),
    (2, ["Row_Type", "Category", "Col1"], [["DETAIL", "Util", "50"], ["DETAIL", "Gas", "25"]]),
    (3, ["Row_Type", "Category", "Column1"], [["DETAIL", "Tax", "10"]]),
    (5, ["Row_Type", "Category", "Col1"], [["DETAIL", "Late", "5"]]),  # gap: no merge
]


def test_merge_parity_and_span_parity():
    merged_f = merge_continuations(_records("frame", CONT_TABLES))
    merged_g = merge_grid_continuations(_records("grid", CONT_TABLES))
    assert len(merged_f) == len(merged_g) == 2
    assert serialize_spans(merged_f) == serialize_grid_spans(merged_g)


def test_rollup_notes_numbers_parity():
    header = ["Row_Type", "Category", "Amt", "Notes"]
    rows = [
        ["HEADER", "REVENUES", None, "unaudited $1,200"],
        ["DETAIL", "Rent", "(1,500)", None],
        ["ROLLUP", "Total", "1,500", "see 50%"],
        [None, "total gross", "7", None],
    ]
    df = pd.DataFrame(rows, columns=header)
    assert grid_rollup_rows(header, rows) == count_rollup_rows(df)
    assert grid_notes(header, rows) == general_notes(df)
    assert extract_numbers_from_grid(header, rows) == extract_numbers_from_frame(df)
    # fallback marker path: no Row_Type column
    h2, r2 = ["Category", "Amt"], [["Total assets", "9"], ["rent", "1"]]
    assert grid_rollup_rows(h2, r2) == count_rollup_rows(pd.DataFrame(r2, columns=h2))


def test_quality_thresholds_parity():
    # Q1/Q2/Q3/Q4/Q5 boundary grids, compared against the pandas kernel
    cases = [
        (["A"], [["x"]] * 4),                                   # Q1 fires
        (["A"], [["x"]] * 3),                                   # Q1 holds
        (["A", "B"], [["x", "y"]] * 71),                        # Q2 fires
        (["A", "B"], [["x", None]] * 10 + [["x", "y"]] * 4),    # Q3 ratio
        (["A", "B"], [[None, None] if i % 3 else ["x", None] for i in range(12)]),  # Q4
        (["A", "B"], [["d", "d"]] * 5 + [["u%d" % i, "v"] for i in range(3)]),      # Q5
        (["A"], [["\x01\x02\x03zzz"]] * 2 + [["clean"]] * 2),   # Q6 garbled
    ]
    for header, rows in cases:
        df = pd.DataFrame(rows, columns=header)
        assert grid_quality_issues(header, rows) == table_quality_issues(df), (
            header,
            rows[:3],
        )


def test_vision_cleaning_parity():
    """Stringify-then-grid-clean must equal clean-then-stringify on the
    stub vision responses (incl. fence/malformed/cascade variants)."""
    from pdf_to_xls_vision_spark.core.cleaning import (
        clean_vision_frame,
        clean_vision_grid_rows,
        grid_cleanable,
        is_cleanable,
    )
    from pdf_to_xls_vision_spark.core.vision import VisionBackend, parse_vision_csv

    backend = VisionBackend()
    refs = [f"img://doc-{i:08d}/{p}" for i in range(150) for p in (1, 2)]
    tables = 0
    for csv in backend.infer_batch(refs):
        df = parse_vision_csv(csv)
        if df is None:
            continue
        df = df.dropna(how="all").dropna(axis=1, how="all")
        if df.empty:
            continue
        header, rows = _frame_to_grid(df)
        assert grid_cleanable(header) == is_cleanable(df)
        new = clean_vision_grid_rows(header, rows) if grid_cleanable(header) else rows
        old_h, old_r = _frame_to_grid(clean_vision_frame(df.copy()))
        assert old_h == header
        assert old_r == new
        tables += 1
    assert tables > 100


# ---------------------------------------------------------------------------
# adversarial parity (hypothesis): random grids, not just corpus shapes
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_cell = st.one_of(
    st.none(),
    st.text(alphabet="ab1,.()% $\x01é", max_size=8),
)


@st.composite
def _grids(draw):
    n_cols = draw(st.integers(1, 5))
    n_rows = draw(st.integers(1, 24))
    header = [
        draw(st.sampled_from(["Row_Type", "Category", "Notes", "A", "B", "C1"]))
        + str(j)
        for j in range(n_cols)
    ]
    rows = [
        [draw(_cell) for _ in range(n_cols)] for _ in range(n_rows)
    ]
    return header, rows


@settings(max_examples=120, deadline=None)
@given(_grids())
def test_quality_parity_random_grids(grid):
    header, rows = grid
    df = pd.DataFrame(rows, columns=header)
    assert grid_quality_issues(header, rows) == table_quality_issues(df)


@settings(max_examples=120, deadline=None)
@given(_grids())
def test_rollup_numbers_parity_random_grids(grid):
    header, rows = grid
    df = pd.DataFrame(rows, columns=header)
    assert grid_rollup_rows(header, rows) == count_rollup_rows(df)
    assert extract_numbers_from_grid(header, rows) == extract_numbers_from_frame(df)
