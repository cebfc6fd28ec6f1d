"""Threshold-boundary tests for Q1-Q6 (quality_check.py:46-125)."""

import pandas as pd

from pdf_to_xls_vision_spark.core.quality import table_quality_issues


def _issues(df):
    return table_quality_issues(df)


def test_q1_single_column_boundary():
    assert not _issues(pd.DataFrame({"a": ["1", "2", "3"]}))  # 3 rows: ok
    assert any("Single column" in i for i in _issues(pd.DataFrame({"a": list("1234")})))


def test_q2_row_explosion():
    df = pd.DataFrame({"a": ["x"] * 70, "b": ["y"] * 70})
    df = df.assign(**{f"c{i}": "1" for i in range(3)})
    assert not any("Excessive" in i for i in _issues(df))  # 70 rows: ok
    df71 = pd.DataFrame({"a": ["x"] * 71, "b": [str(i) for i in range(71)]})
    assert any("Excessive row count" in i for i in _issues(df71))


def test_q2_medium_rows_needs_wide():
    base = {f"c{i}": [str(j) for j in range(60)] for i in range(12)}
    assert not any("Excessive" in i for i in _issues(pd.DataFrame(base)))  # 12 cols: ok
    base["c12"] = [str(j) for j in range(60)]
    assert any("many columns" in i for i in _issues(pd.DataFrame(base)))


def test_q3_inconsistent_column_counts():
    rows = [["a", "b", "c"]] * 6 + [["a", None, None]] * 4
    df = pd.DataFrame(rows, columns=["x", "y", "z"])
    assert any("Inconsistent" in i for i in _issues(df))
    rows_ok = [["a", "b", "c"]] * 8 + [["a", None, None]] * 2
    assert not any(
        "Inconsistent" in i for i in _issues(pd.DataFrame(rows_ok, columns=["x", "y", "z"]))
    )


def test_q4_empty_ratio_thresholds():
    # small table: > 0.6 flags
    df = pd.DataFrame([[None, None, "v"]] * 5, columns=["a", "b", "c"])
    assert any("empty cell" in i for i in _issues(df))
    df_ok = pd.DataFrame([["u", None, "v"]] * 5, columns=["a", "b", "c"])
    assert not any("empty cell" in i for i in _issues(df_ok))


def test_q5_duplicates():
    rows = [["a", "1"]] * 3 + [[str(i), str(i)] for i in range(5)]
    df = pd.DataFrame(rows, columns=["x", "y"])
    assert any("duplicate" in i for i in _issues(df))
    assert not any(
        "duplicate" in i
        for i in _issues(pd.DataFrame([[str(i), "1"] for i in range(8)], columns=["x", "y"]))
    )


def test_q6_garbled():
    df = pd.DataFrame({"a": ["日本語テキスト" for _ in range(5)]})
    assert any("Garbled" in i for i in _issues(df))
    clean = pd.DataFrame({"a": [f"word{i}" for i in range(5)]})
    assert not any("Garbled" in i for i in _issues(clean))
    # currency symbols live in an allowed block (U+20A0-U+20CF) and
    # short cells dodge the special-char rule (len > 5 required)
    assert not any("Garbled" in i for i in _issues(pd.DataFrame({"a": ["€€€€"] * 5})))


def test_empty_frame_no_issues():
    assert _issues(pd.DataFrame()) == []
