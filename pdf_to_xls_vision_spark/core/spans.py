"""Span serialization (W1 semantics) + rollup/notes analysis (A1/A3).

The reference's sink writes one Excel sheet per table record in list
order, cells row-major with the header first (excel_writer.py:305-371,
write loop :352-354), then a trailing Notes sheet collecting HEADER-row
notes (:358-366). Per the north rule this becomes an ordered span
sequence per document (FIXTURES.md §4):

    table_start  "{page}:{table_id}:{n_rows}x{n_cols}"   media_ref of source page ('' for text)
    header_cell  column name, left->right                same media_ref
    cell         cell value, row-major                   same media_ref
    table_end    ''                                      same media_ref
    note         note text (HEADER-row Notes col)        ''

``order`` is a running 0-based counter per document.
"""

from __future__ import annotations

import pandas as pd

from pdf_to_xls_vision_spark.core.merge import TableRecord

ROLLUP_FALLBACK_MARKERS = (
    "total", "gross", "effective", "net operating income", "noi",
)  # excel_writer.py:125


def cell_text(value) -> str:
    """Canonical textualization of a cell for span output.

    Nulls render as '' (the Excel writer emits empty cells for NaN);
    everything else is ``str(value)`` — both the Spark UDFs and the test
    oracle funnel through this single definition, so pandas dtype
    inference (int64 vs str) can never split the two sides.
    """
    if value is None or (isinstance(value, float) and value != value):
        return ""
    if pd.isna(value):
        return ""
    return str(value)


def count_rollup_rows(df: pd.DataFrame) -> int:
    """A1 (excel_writer.py:116-156): ``Row_Type == 'ROLLUP'`` rows, or —
    when no Row_Type column exists — rows whose first-column value
    contains a rollup marker. Used as a per-partition metric only (the
    reference just logs the count, excel_writer.py:329-331)."""
    if df.empty:
        return 0
    if "Row_Type" in df.columns:
        s = df["Row_Type"]
        return int(
            s.map(
                lambda v: pd.notna(v) and str(v).strip().upper() == "ROLLUP"
            ).sum()
        )
    first = df.columns[0]
    return int(
        df[first]
        .map(
            lambda v: pd.notna(v)
            and any(m in str(v).lower().strip() for m in ROLLUP_FALLBACK_MARKERS)
        )
        .sum()
    )


def general_notes(df: pd.DataFrame) -> list[str]:
    """A3 (excel_writer.py:237-259): Notes-column values on HEADER rows."""
    notes: list[str] = []
    if "Notes" not in df.columns or "Row_Type" not in df.columns:
        return notes
    for _, row in df.iterrows():
        note = row["Notes"]
        if pd.notna(note):
            rt = row["Row_Type"]
            if pd.notna(rt) and str(rt).strip().upper() == "HEADER":
                notes.append(cell_text(note))
    return notes


def grid_rollup_rows(header: list, rows: list) -> int:
    """Grid-form :func:`count_rollup_rows` (cells are ``str | None``;
    ``pd.notna`` reduces to ``is not None``)."""
    if not rows or not header:
        return 0
    if "Row_Type" in header:
        j = header.index("Row_Type")
        return sum(
            1
            for r in rows
            if r[j] is not None and str(r[j]).strip().upper() == "ROLLUP"
        )
    return sum(
        1
        for r in rows
        if r[0] is not None
        and any(m in str(r[0]).lower().strip() for m in ROLLUP_FALLBACK_MARKERS)
    )


def grid_notes(header: list, rows: list) -> list[str]:
    """Grid-form :func:`general_notes`."""
    if "Notes" not in header or "Row_Type" not in header:
        return []
    jn, jr = header.index("Notes"), header.index("Row_Type")
    return [
        cell_text(r[jn])
        for r in rows
        if r[jn] is not None
        and r[jr] is not None
        and str(r[jr]).strip().upper() == "HEADER"
    ]


def serialize_grid_spans(tables) -> list[dict]:
    """Grid-form :func:`serialize_spans` over ``GridRecord`` values —
    same emit order (per-table: start, header cells, row-major cells,
    end; trailing notes), no pandas in the loop.

    Hot path: one dict literal per span built in extend() generators
    (grid cells are ``str | None`` by the :func:`encode_grid` contract,
    so the ``type(v) is str`` fast path covers virtually every cell;
    anything else falls back to the spec :func:`cell_text`), with the
    global ``order`` counter assigned in a single enumerate pass — the
    per-span closure this replaces was the largest single cost in the
    merge-stage kernel profile (~16% of merge CPU at 600k spans/2k
    docs)."""
    spans: list[dict] = []
    append = spans.append
    extend = spans.extend
    all_notes: list[str] = []
    for rec in tables:
        ref = rec.media_ref or ""
        header, rows = rec.header, rec.rows
        all_notes.extend(grid_notes(header, rows))
        append(
            {
                "kind": "table_start",
                "text": f"{rec.page}:{rec.table_id}:{len(rows)}x{len(header)}",
                "media_ref": ref,
                "order": 0,
            }
        )
        extend(
            {
                "kind": "header_cell",
                "text": c if type(c) is str else cell_text(c),
                "media_ref": ref,
                "order": 0,
            }
            for c in header
        )
        extend(
            {
                "kind": "cell",
                "text": v if type(v) is str else cell_text(v),
                "media_ref": ref,
                "order": 0,
            }
            for row in rows
            for v in row
        )
        append({"kind": "table_end", "text": "", "media_ref": ref, "order": 0})

    extend(
        {"kind": "note", "text": n, "media_ref": "", "order": 0}
        for n in all_notes
    )
    for i, s in enumerate(spans):
        s["order"] = i
    return spans


def serialize_spans(tables: list[TableRecord]) -> list[dict]:
    """Emit the document's ordered output span sequence (FIXTURES.md §4)."""
    spans: list[dict] = []
    order = 0

    def emit(kind: str, text: str, media_ref: str) -> None:
        nonlocal order
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "order": order}
        )
        order += 1

    all_notes: list[str] = []
    for rec in tables:
        df = rec.frame
        ref = rec.media_ref or ""
        all_notes.extend(general_notes(df))
        emit(
            "table_start",
            f"{rec.page}:{rec.table_id}:{len(df)}x{len(df.columns)}",
            ref,
        )
        for col in df.columns:
            emit("header_cell", cell_text(col), ref)
        for row in df.itertuples(index=False, name=None):
            for value in row:
                emit("cell", cell_text(value), ref)
        emit("table_end", "", ref)

    for note in all_notes:
        emit("note", note, "")
    return spans
