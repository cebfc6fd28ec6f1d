"""Staleness guard: the committed expected-parquet fixtures must match
what scripts/gen_expected.py would produce from the current kernels —
a drifted kernel with a stale fixture would pass the driver's oracle
check while being wrong."""

import os
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXPECTED_DIR = os.path.join(REPO, "fixtures", "expected")


def _gen():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import gen_expected

    return gen_expected


@pytest.mark.parametrize(
    "name,genfn",
    [
        ("extraction_spans", "gen_extraction_spans"),
        ("extraction_metrics", "gen_extraction_metrics"),
        ("multimodal_media_features", "gen_multimodal"),
        ("multimodal_phash_dedup", "gen_phash_dedup"),
        ("text_winnow_fingerprints", "gen_winnow"),
        ("html_main_content", "gen_html_main_content"),
        ("text_bpe_merge_tokens", "gen_bpe_merge_tokens"),
        ("text_bpe_token_ids", "gen_bpe_token_ids"),
    ],
)
def test_fixture_not_stale(tmp_path, monkeypatch, name, genfn):
    g = _gen()
    committed = pq.read_table(os.path.join(EXPECTED_DIR, f"{name}.parquet"))
    monkeypatch.setattr(g, "EXPECTED_DIR", str(tmp_path))
    getattr(g, genfn)()
    fresh = pq.read_table(str(tmp_path / f"{name}.parquet"))
    assert fresh.equals(committed), f"{name} fixture is stale — regenerate"
