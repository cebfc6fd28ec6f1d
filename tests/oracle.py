"""Sequential reference oracle (SURVEY.md §5.2).

An *independent* re-implementation of the behavioral pipeline in the
reference's own sequential style — per-document loops, per-cell
``.apply``-ish iteration, ``list[{'dataframe','page','table'}]``
records — used to differentially test the distributed engine. It shares
only the deterministic vision stub (``stub_csv`` / ``stub_pixels``)
with the engine, exactly as both would share a real vision API.

Everything else (layout parse, cleaning, quality, retry, merge,
serialization) is written here from the documented semantics, not
imported from the engine, so a bug in either side breaks span equality
in ``test_e2e_spans.py``.
"""

from __future__ import annotations

import json
import re
from io import StringIO

import pandas as pd

from pdf_to_xls_vision_spark.core.vision import stub_csv

SNAP = 3.0
MIN_WORDS_V = 3


# ---------------------------------------------------------------------------
# layout parse (mirrors table_extraction.py:402-474 text strategy)
# ---------------------------------------------------------------------------

def _parse_words(words):
    if not words:
        return None
    # row bands
    ws = sorted(words, key=lambda w: (w["top"], w["x0"], w["t"]))
    bands = []
    for w in ws:
        if bands and w["top"] - bands[-1][0]["top"] <= SNAP:
            bands[-1].append(w)
        else:
            bands.append([w])
    # column anchors: greedy x0 clusters with >= 3 members
    cols = []
    for x in sorted(w["x0"] for w in words):
        if cols and x - cols[-1][0] <= SNAP:
            cols[-1][1] += 1
        else:
            cols.append([x, 1])
    anchors = [a for a, c in cols if c >= MIN_WORDS_V]
    if not anchors:
        return None
    grid = []
    for band in bands:
        cells = [None] * len(anchors)
        hit = False
        for w in band:
            for j, a in enumerate(anchors):
                if abs(w["x0"] - a) <= SNAP:
                    cells[j] = w["t"] if cells[j] is None else cells[j] + " " + w["t"]
                    hit = True
                    break
        if hit:
            grid.append(cells)
    if len(grid) < 2:
        return None
    return grid


def _text_page_tables(payload):
    try:
        words = json.loads(payload).get("words", [])
    except Exception:
        return []
    grid = _parse_words(words)
    if grid is None:
        return []
    df = pd.DataFrame(grid[1:], columns=grid[0])
    df = df.dropna(how="all").dropna(axis=1, how="all")
    if df.empty:
        return []
    return [df]


# ---------------------------------------------------------------------------
# quality heuristics (mirrors quality_check.py:7-127)
# ---------------------------------------------------------------------------

_NONPRINT = re.compile(r"[^\x20-\x7E\u00A0-\u024F\u20A0-\u20CF]{3,}")
_SPECIAL = re.compile(r"[^\w\s$,.%()\-'/]{3,}")


def _has_quality_issues(df):
    if df is None or df.empty:
        return False
    nr, nc = len(df), len(df.columns)
    if nc == 1 and nr > 3:
        return True
    if nr > 70:
        return True
    if nr > 50 and nc > 12:
        return True
    counts = df.notna().sum(axis=1)
    mode = counts.mode()
    common = mode.iloc[0] if len(mode) else nc
    if (counts != common).sum() / len(counts) > 0.3:
        return True
    total = nr * nc
    if total and df.isna().sum().sum() / total > (0.6 if nr < 20 else 0.5):
        return True
    if nr > 5 and df.astype(str).duplicated().sum() / nr > 0.2:
        return True
    garbled = checked = 0
    cap = min(100, total)
    done = False
    for col in df.columns:
        for val in df[col].head(20):
            if pd.notna(val) and isinstance(val, str):
                checked += 1
                if _NONPRINT.search(str(val)):
                    garbled += 1
                elif len(val) > 5 and _SPECIAL.search(str(val)):
                    garbled += 1
            if checked >= cap:
                done = True
                break
        if done:
            break
    if checked and garbled / checked > 0.1:
        return True
    return False


# ---------------------------------------------------------------------------
# vision path (mirrors table_extraction.py:136-199 + data_cleaning.py)
# ---------------------------------------------------------------------------

def _read_csv_ladder(content):
    if not content or not content.strip():
        return None
    c = content.strip()
    if c.startswith("```"):
        ls = c.split("\n")
        if len(ls) > 2:
            c = "\n".join(ls[1:-1])
    for kwargs in ({}, {"on_bad_lines": "skip"}, {"sep": None, "engine": "python"}):
        try:
            df = pd.read_csv(StringIO(c), **kwargs)
            break
        except Exception:
            df = None
    if df is None or df.empty:
        return None
    return df


def _fix_cell(v):
    if not isinstance(v, str):
        return v
    v = v.strip()
    v = re.sub(r"\(\s+", "(", v)
    v = re.sub(r"\s+\)", ")", v)
    v = re.sub(r"\(+", "(", v)
    if v.startswith("(") and not v.endswith(")") and re.search(r"[\d,.-]+$", v):
        v = v + ")"
    if v.endswith(")") and not v.startswith("(") and re.match(r"^[\d,.-]+\)$", v):
        v = "(" + v
    return v


def _cascade_frame(df):
    pat = re.compile(r"^([\d,.-]+)\)\($")
    for idx in df.index:
        changed = True
        guard = 0
        while changed and guard < 1000:
            guard += 1
            changed = False
            for k in range(len(df.columns) - 1):
                c0, c1 = df.columns[k], df.columns[k + 1]
                cv, nv = df.at[idx, c0], df.at[idx, c1]
                if pd.notna(cv):
                    cs = str(cv).strip()
                    if cs.endswith("("):
                        cs2 = cs[:-1].strip()
                        if pd.notna(nv):
                            ns = str(nv).strip()
                            m = pat.search(ns)
                            if m:
                                df.at[idx, c0] = cs2 if cs2 else None
                                df.at[idx, c1] = f"({m.group(1)})("
                            elif ns.endswith(")") and not ns.startswith("("):
                                df.at[idx, c0] = cs2 if cs2 else None
                                df.at[idx, c1] = f"({ns}"
                            else:
                                df.at[idx, c0] = cs2 if cs2 else None
                                df.at[idx, c1] = "(" + ns
                        else:
                            df.at[idx, c0] = cs2 if cs2 else None
                            df.at[idx, c1] = "("
                        changed = True
                if pd.notna(nv):
                    ns = str(nv).strip()
                    m = pat.search(ns)
                    if m:
                        cs = str(cv).strip() if pd.notna(cv) else ""
                        if not cs.endswith("("):
                            df.at[idx, c0] = (cs + ")") if cs else ")"
                            df.at[idx, c1] = f"({m.group(1)})("
                            changed = True
    for col in df.columns:
        df[col] = df[col].apply(
            lambda x: re.sub(r"(%)\s*\($", r"\1", str(x).strip())
            if pd.notna(x) and isinstance(x, str)
            else x
        )
    return df


def _vision_page_table(ref):
    df = _read_csv_ladder(stub_csv(ref))
    if df is None:
        return None
    df = df.dropna(how="all").dropna(axis=1, how="all")
    if df.empty:
        return None
    cleanable = (
        df.index.is_unique
        and df.columns.is_unique
        and df.index.nlevels == 1
        and df.columns.nlevels == 1
    )
    if cleanable:  # else keep dirty (reference try/except,
        # table_extraction.py:171-182)
        df = _cascade_frame(df)
        for col in df.columns:
            df[col] = df[col].apply(lambda x: _fix_cell(x) if pd.notna(x) else x)
    if df.empty or len(df) == 0:
        return None
    return df


# ---------------------------------------------------------------------------
# merge (mirrors excel_writer.py:9-113)
# ---------------------------------------------------------------------------

def _merge(tables):
    if len(tables) <= 1:
        return tables
    out, i = [], 0
    while i < len(tables):
        cur = tables[i]
        run = [cur]
        j = i + 1
        while j < len(tables):
            nxt = tables[j]
            ndf, cdf = nxt["dataframe"], cur["dataframe"]
            ok = nxt["page"] == cur["page"] + (j - i)
            ok = ok and len(ndf.columns) == len(cdf.columns)
            detail = (
                len(ndf) > 0
                and "Row_Type" in ndf.columns
                and str(ndf.iloc[0]["Row_Type"]).strip().upper() == "DETAIL"
            )
            generic = False
            for col in (str(c) for c in ndf.columns):
                if col in ("Row_Type", "Category"):
                    continue
                if (col.startswith("Col") and col[3:].isdigit()) or (
                    col.startswith("Column") and col[6:].isdigit()
                ):
                    generic = True
                    break
            if ok and detail and generic:
                run.append(nxt)
                j += 1
            else:
                break
        if len(run) > 1:
            big = run[0]["dataframe"].copy()
            for t in run[1:]:
                d = t["dataframe"].copy()
                if len(d.columns) == len(big.columns):
                    d.columns = big.columns
                    big = pd.concat([big, d], ignore_index=True)
            out.append(
                {
                    "dataframe": big,
                    "page": cur["page"],
                    "table": cur["table"],
                    "media_ref": cur.get("media_ref", ""),
                }
            )
            i = j
        else:
            out.append(cur)
            i += 1
    return out


# ---------------------------------------------------------------------------
# serialization (FIXTURES.md §4 over excel_writer.py:305-371)
# ---------------------------------------------------------------------------

def _txt(v):
    if v is None:
        return ""
    try:
        if pd.isna(v):
            return ""
    except (TypeError, ValueError):
        pass
    return str(v)


def _doc_spans(tables):
    spans = []
    notes = []
    for rec in tables:
        df = rec["dataframe"]
        ref = rec.get("media_ref", "") or ""
        if "Notes" in df.columns and "Row_Type" in df.columns:
            for ridx in df.index:
                nv = df.at[ridx, "Notes"]
                rt = df.at[ridx, "Row_Type"]
                if (
                    pd.notna(nv)
                    and pd.notna(rt)
                    and str(rt).strip().upper() == "HEADER"
                ):
                    notes.append(_txt(nv))
        spans.append(
            ("table_start", f"{rec['page']}:{rec['table']}:{len(df)}x{len(df.columns)}", ref)
        )
        for col in df.columns:
            spans.append(("header_cell", _txt(col), ref))
        for _, row in df.iterrows():
            for v in row:
                spans.append(("cell", _txt(v), ref))
        spans.append(("table_end", "", ref))
    for n in notes:
        spans.append(("note", n, ""))
    return [
        {"kind": k, "text": t, "media_ref": m, "order": o}
        for o, (k, t, m) in enumerate(spans)
    ]


# ---------------------------------------------------------------------------
# document pipeline (mirrors converter.py:30-168)
# ---------------------------------------------------------------------------

def oracle_document(doc_id, spans, force_vision=False):
    """Full sequential pipeline for one document; returns the golden
    ordered span sequence (list of dicts)."""
    pages = sorted(spans, key=lambda s: s["offset"])
    kinds = [s["kind"] for s in pages]
    all_image = all(k == "image" for k in kinds)
    image_based = any(k == "image" for k in kinds[:3])

    def vision_pass():
        recs = []
        for s in pages:
            page = s["offset"] + 1
            ref = s["media_ref"] if s["media_ref"] else f"img://{doc_id}/{page}"
            df = _vision_page_table(ref)
            if df is not None:
                recs.append(
                    {"dataframe": df, "page": page, "table": 1, "media_ref": ref}
                )
        return recs

    if all_image or image_based or force_vision:
        tables = vision_pass()
    else:
        tables = []
        any_issue = False
        for s in pages:
            if s["kind"] != "text":
                continue
            page = s["offset"] + 1
            for t_num, df in enumerate(_text_page_tables(s["text"]), start=1):
                if _has_quality_issues(df):
                    any_issue = True
                tables.append(
                    {"dataframe": df, "page": page, "table": t_num, "media_ref": ""}
                )
        if any_issue or not tables:
            tables = vision_pass()

    if not tables:
        return []
    tables = _merge(tables)
    return _doc_spans(tables)


def oracle_corpus(docs, force_vision=False):
    """Golden spans for a list of (doc_id, spans) documents."""
    return {
        doc_id: oracle_document(doc_id, spans, force_vision)
        for doc_id, spans in docs
    }


# ---------------------------------------------------------------------------
# per-document metrics (mirrors the engine's RESULT_SCHEMA metrics:
# converter.py loop counters + validation.py report). Shares ONLY the
# deterministic pixel stub with the engine (same convention as
# stub_csv); rotation scoring, number extraction, rollup/notes scans
# are re-implemented here from the documented semantics.
# ---------------------------------------------------------------------------

import numpy as _np

_NUM_RE_M = re.compile(r"\$?\(?\d{1,3}(?:,\d{3})*(?:\.\d+)?\)?%?")
_ROLLUP_MARKERS_M = ("total", "gross", "effective", "net operating income", "noi")
_LABEL_COLS_M = ("Row_Type", "Category", "Notes")


def _norm_num_m(tok):
    c = tok.replace("$", "").replace(",", "").replace("%", "")
    if c.startswith("(") and c.endswith(")"):
        c = "-" + c[1:-1]
    return c


def _num_key_m(tok):
    try:
        return repr(float(tok))
    except ValueError:
        return tok


def _page_source_text_m(span):
    if span["kind"] != "text" or not span["text"]:
        return ""
    try:
        words = json.loads(span["text"]).get("words", [])
    except Exception:
        return ""
    return " ".join(w.get("t", "") for w in words)


def _rot90cw_m(img, degrees):
    return _np.rot90(img, k=(4 - (degrees // 90)) % 4)


def _upright_m(img):
    h, w = img.shape
    qh, qw = h // 4, w // 4
    a = img.astype(_np.int64)
    return int(
        a[:qh].sum() - a[h - qh:].sum() + a[:, :qw].sum() - a[:, w - qw:].sum()
    )


def _rotation_applied_m(ref):
    """1 when the gated projection-profile correction fires (angle != 0
    and margin/area > 1.0), else 0."""
    from pdf_to_xls_vision_spark.core.vision import stub_pixels  # shared stub

    img, _ = stub_pixels(ref)
    scores = sorted(
        ((_upright_m(_rot90cw_m(img, d)), -d) for d in (0, 90, 180, 270)),
        reverse=True,
    )
    margin = scores[0][0] - scores[1][0]
    angle = -scores[0][1]
    return 1 if (angle != 0 and margin / float(img.size) > 1.0) else 0


def _table_rollup_rows_m(df):
    if len(df) == 0 or len(df.columns) == 0:
        return 0
    if "Row_Type" in df.columns:
        col = df["Row_Type"]
        return int(
            sum(1 for v in col if pd.notna(v) and str(v).strip().upper() == "ROLLUP")
        )
    first = df[df.columns[0]]
    return int(
        sum(
            1
            for v in first
            if pd.notna(v)
            and any(m in str(v).lower().strip() for m in _ROLLUP_MARKERS_M)
        )
    )


def _table_notes_m(df):
    if "Notes" not in df.columns or "Row_Type" not in df.columns:
        return 0
    n = 0
    for _, row in df.iterrows():
        if (
            pd.notna(row["Notes"])
            and pd.notna(row["Row_Type"])
            and str(row["Row_Type"]).strip().upper() == "HEADER"
        ):
            n += 1
    return n


def _table_numbers_m(df):
    out = []
    for col in df.columns:
        if col in _LABEL_COLS_M:
            continue
        for val in df[col]:
            if pd.notna(val):
                out.extend(_norm_num_m(t) for t in _NUM_RE_M.findall(str(val)))
    return out


def oracle_document_metrics(doc_id, spans, force_vision=False):
    """Sequential metrics for one document — the engine's
    extraction_metrics row, computed independently."""
    from collections import Counter

    pages = sorted(spans, key=lambda s: s["offset"])
    kinds = [s["kind"] for s in pages]
    all_image = all(k == "image" for k in kinds)
    image_based = any(k == "image" for k in kinds[:3])

    def refs():
        return [
            s["media_ref"] if s["media_ref"] else f"img://{doc_id}/{s['offset'] + 1}"
            for s in pages
        ]

    retried = 0
    if all_image or image_based or force_vision:
        vision = True
    else:
        vision = False
        tables = []
        any_issue = False
        for s in pages:
            if s["kind"] != "text":
                continue
            for df in _text_page_tables(s["text"]):
                if _has_quality_issues(df):
                    any_issue = True
                tables.append(
                    {"dataframe": df, "page": s["offset"] + 1, "table": 1,
                     "media_ref": ""}
                )
        if any_issue or not tables:
            vision = True
            retried = 1

    rotation_corrections = 0
    if vision:
        rotation_corrections = sum(_rotation_applied_m(r) for r in refs())
        tables = []
        for s in pages:
            page = s["offset"] + 1
            ref = s["media_ref"] if s["media_ref"] else f"img://{doc_id}/{page}"
            df = _vision_page_table(ref)
            if df is not None:
                tables.append(
                    {"dataframe": df, "page": page, "table": 1, "media_ref": ref}
                )

    merged = _merge(tables) if tables else []

    pdf_tokens = []
    for s in pages:
        text = _page_source_text_m(s)
        pdf_tokens.extend(_norm_num_m(t) for t in _NUM_RE_M.findall(text))

    if not pdf_tokens:
        status, accuracy = "skipped", 0.0
    else:
        pdf_counts = Counter(_num_key_m(t) for t in pdf_tokens)
        tbl_counts = Counter()
        for rec in merged:
            tbl_counts.update(_num_key_m(t) for t in _table_numbers_m(rec["dataframe"]))
        keys = set(pdf_counts) | set(tbl_counts)
        matches = sum(min(pdf_counts[k], tbl_counts[k]) for k in keys)
        total = sum(pdf_counts.values())
        status = "completed"
        accuracy = round(matches / total * 100, 2) if total else 0.0

    return {
        "doc_id": doc_id,
        "n_tables": len(merged),
        "pages_parsed": len(pages),
        "rotation_corrections": rotation_corrections,
        "quality_retried": retried,
        "rollup_rows": sum(_table_rollup_rows_m(r["dataframe"]) for r in merged),
        "n_notes": sum(_table_notes_m(r["dataframe"]) for r in merged),
        "validation_status": status,
        "accuracy_pct": accuracy,
    }
