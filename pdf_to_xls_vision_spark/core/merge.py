"""Continuation-table merge (M1) and table-record model.

Reference contract: ``merge_continuation_tables`` (excel_writer.py:9-113).
A greedy forward scan over page-ordered table records opens a run at
table i and absorbs table j while ALL of:

1. consecutive pages: ``page_j == page_i + (j - i)`` (excel_writer.py:51),
2. same column count (excel_writer.py:52),
3. the continuation's first row has ``Row_Type == 'DETAIL'``
   (excel_writer.py:54-58),
4. at least one non-Row_Type/Category header matches ``Col<digits>`` or
   ``Column<digits>`` (excel_writer.py:60-71).

Merging renames continuation columns to the first page's and
concatenates all rows (excel_writer.py:84-96).

In the engine this runs inside the per-document ``applyInPandas`` group
— every page of a document is already co-located by the extraction
shuffle, so the merge adds no extra exchange (SURVEY.md §4.3 fusion).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd


@dataclass
class TableRecord:
    """One extracted table: the reference's ``{'dataframe','page','table'}``
    dict (table_extraction.py:184-188) plus engine-side provenance."""

    frame: pd.DataFrame
    page: int
    table_id: int
    media_ref: str = ""  # source page's media ref for vision tables
    quality_issues: list[str] = field(default_factory=list)


def _starts_with_detail(df: pd.DataFrame) -> bool:
    if len(df) > 0 and "Row_Type" in df.columns:
        return str(df.iloc[0]["Row_Type"]).strip().upper() == "DETAIL"
    return False


def _has_generic_headers(df: pd.DataFrame) -> bool:
    for col in (str(c) for c in df.columns):
        if col in ("Row_Type", "Category"):
            continue
        if (col.startswith("Col") and col[3:].isdigit()) or (
            col.startswith("Column") and col[6:].isdigit()
        ):
            return True
    return False


@dataclass
class GridRecord:
    """Grid-form table record: ``header``/``rows`` of ``str | None``
    cells instead of a pandas frame. The extraction UDFs already carry
    tables in this shape across the Arrow boundary, and per-table
    pandas construction dominated the merge stage's profile — so the
    hot path (pipeline._merge_and_serialize) stays on grids while the
    frame API above remains for the vision/CSV branch and tests."""

    header: list
    rows: list
    page: int
    table_id: int
    media_ref: str = ""
    quality_issues: list[str] = field(default_factory=list)


def _grid_starts_with_detail(rec: GridRecord) -> bool:
    if rec.rows and "Row_Type" in rec.header:
        v = rec.rows[0][rec.header.index("Row_Type")]
        return str(v).strip().upper() == "DETAIL"
    return False


def _grid_has_generic_headers(header: list) -> bool:
    for col in (str(c) for c in header):
        if col in ("Row_Type", "Category"):
            continue
        if (col.startswith("Col") and col[3:].isdigit()) or (
            col.startswith("Column") and col[6:].isdigit()
        ):
            return True
    return False


def merge_grid_continuations(tables: list[GridRecord]) -> list[GridRecord]:
    """Grid-form :func:`merge_continuations` — identical four-condition
    greedy scan (excel_writer.py:28-113); "rename continuation columns
    then concat" reduces to concatenating rows under the head's header."""
    if len(tables) <= 1:
        return tables

    merged: list[GridRecord] = []
    i = 0
    while i < len(tables):
        head = tables[i]
        run = [head]
        j = i + 1
        while j < len(tables):
            nxt = tables[j]
            if (
                nxt.page == head.page + (j - i)
                and len(nxt.header) == len(head.header)
                and _grid_starts_with_detail(nxt)
                and _grid_has_generic_headers(nxt.header)
            ):
                run.append(nxt)
                j += 1
            else:
                break

        if len(run) > 1:
            rows = list(run[0].rows)
            for cont in run[1:]:
                rows.extend(cont.rows)
            merged.append(
                GridRecord(
                    header=head.header,
                    rows=rows,
                    page=head.page,
                    table_id=head.table_id,
                    media_ref=head.media_ref,
                    quality_issues=head.quality_issues,
                )
            )
            i = j
        else:
            merged.append(head)
            i += 1
    return merged


def merge_continuations(tables: list[TableRecord]) -> list[TableRecord]:
    """Greedy forward merge of page-spanning tables (excel_writer.py:28-113)."""
    if len(tables) <= 1:
        return tables

    merged: list[TableRecord] = []
    i = 0
    while i < len(tables):
        head = tables[i]
        run = [head]
        j = i + 1
        while j < len(tables):
            nxt = tables[j]
            consecutive = nxt.page == head.page + (j - i)
            same_width = len(nxt.frame.columns) == len(head.frame.columns)
            if (
                consecutive
                and same_width
                and _starts_with_detail(nxt.frame)
                and _has_generic_headers(nxt.frame)
            ):
                run.append(nxt)
                j += 1
            else:
                break

        if len(run) > 1:
            combined = run[0].frame.copy()
            for cont in run[1:]:
                part = cont.frame.copy()
                if len(part.columns) == len(combined.columns):
                    part.columns = combined.columns
                    combined = pd.concat([combined, part], ignore_index=True)
            merged.append(
                TableRecord(
                    frame=combined,
                    page=head.page,
                    table_id=head.table_id,
                    media_ref=head.media_ref,
                    quality_issues=head.quality_issues,
                )
            )
            i = j
        else:
            merged.append(head)
            i += 1
    return merged
