"""Materialize expected outputs for the non-SQL-expressible driver
queries, so every ``queries()`` entry gets a hard DuckDB oracle
(``SELECT ... FROM read_parquet('<expected>')``) instead of a weak
rows-only check.

Provenance of each fixture (independence matters — say it honestly):

- ``extraction_spans``, ``extraction_metrics`` — the *independent
  sequential oracle* (tests/oracle.py, hand-written from the
  reference's behavior) over the deterministic 64-doc corpus. This is
  the strongest class.
- ``text_winnow_fingerprints``, ``text_bpe_merge_tokens``,
  ``text_bpe_token_ids`` — generated from the *independent
  re-derivations* in tests/independent_kernels.py (incremental
  rolling hash + deque sliding-min winnowing; heap-based
  incremental-count BPE learner; one-occurrence-at-a-time encoder) —
  algorithmically different implementations of the same specs, with
  engine==independent equality asserted per document by
  tests/test_independent_kernels.py. Independent class (round 3;
  closes the round-2 self-referential gap).
- ``multimodal_*``, ``html_main_content`` — *sequential pure-Python
  replays* of the same deterministic kernels the pandas UDFs call
  (stub decoder, block-density extractor). These validate the
  Spark-side plumbing (schema, batching, explode/distinct, closure
  shipping), not the kernel itself — those kernels have their own
  pytest goldens.

Deterministic by construction — regenerate with
``PYTHONPATH=. python scripts/gen_expected.py`` and ``git diff`` must
be empty (tests/test_expected_fixtures.py enforces staleness).

The winnow/BPE fixtures depend on the input documents table, which
differs per SF: rows carry ``corpus_sig = sum(length(text))`` and the
oracle SQL selects the block matching the live ``documents`` view.
Blocks are generated for every SF the driver can target (sf0.001,
sf0.01, sf0.1) — an unknown SF selects zero oracle rows, which shows
up as an unambiguous all-rows mismatch, and the supported list is
documented at the oracle definitions (plans/queries.py).
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

EXPECTED_DIR = os.path.join(REPO, "fixtures", "expected")
#: every SF the round driver can point the oracle check at
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# pin parquet layout so regeneration is byte-stable
_PQ = dict(compression="zstd", store_schema=True)


def _write(name: str, table: pa.Table) -> None:
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    path = os.path.join(EXPECTED_DIR, f"{name}.parquet")
    pq.write_table(table, path, **_PQ)
    print(f"wrote {path} ({table.num_rows} rows)")


def _docs_table(sf_dir: str):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    sig = sum(len(x or "") for x in texts)
    return doc_ids, texts, sig


def gen_extraction_spans() -> None:
    from oracle import oracle_corpus

    from pdf_to_xls_vision_spark.corpus import generate_corpus

    docs = generate_corpus(64)
    golden = oracle_corpus(docs)
    rows = {"doc_id": [], "kind": [], "text": [], "media_ref": [], "ord": []}
    for doc_id, spans in golden.items():
        for s in spans:
            rows["doc_id"].append(doc_id)
            rows["kind"].append(s["kind"])
            rows["text"].append(s["text"])
            rows["media_ref"].append(s["media_ref"])
            rows["ord"].append(s["order"])
    _write(
        "extraction_spans",
        pa.table(rows).cast(
            pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("ord", pa.int32()),
                ]
            )
        ),
    )


def _corpus_media_refs() -> list[str]:
    from pdf_to_xls_vision_spark.corpus import generate_corpus

    refs = set()
    for _doc_id, spans in generate_corpus(64):
        for s in spans:
            if s["kind"] == "image":
                refs.add(s["media_ref"])
    return sorted(refs)


def gen_multimodal() -> None:
    from pdf_to_xls_vision_spark.core.vision import detect_rotation, stub_pixels

    refs = _corpus_media_refs()

    feat = {k: [] for k in (
        "media_ref", "width", "height", "mean_ink", "ink_bands",
        "detected_rotation", "rotation_confidence",
    )}
    for ref in refs:
        img, _ = stub_pixels(ref)
        rot, conf = detect_rotation(img)
        row_means = img.mean(axis=1)
        bands = int(((row_means[1:] > 100) & (row_means[:-1] <= 100)).sum())
        feat["media_ref"].append(ref)
        feat["width"].append(int(img.shape[1]))
        feat["height"].append(int(img.shape[0]))
        feat["mean_ink"].append(float(img.mean()))
        feat["ink_bands"].append(bands)
        feat["detected_rotation"].append(int(rot))
        feat["rotation_confidence"].append(float(conf))
    _write(
        "multimodal_media_features",
        pa.table(feat).cast(
            pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("mean_ink", pa.float64()),
                    ("ink_bands", pa.int32()),
                    ("detected_rotation", pa.int32()),
                    ("rotation_confidence", pa.float64()),
                ]
            )
        ),
    )

    max_dim = 16  # q_media_resize uses max_dim=16
    rz = {k: [] for k in (
        "media_ref", "src_width", "src_height", "width", "height",
        "scale", "mean_ink",
    )}
    for ref in refs:
        img, _ = stub_pixels(ref)
        h, w = img.shape
        scale = min(1.0, max_dim / max(h, w))
        nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
        ys = (np.arange(nh) * (h / nh)).astype(np.int64)
        xs = (np.arange(nw) * (w / nw)).astype(np.int64)
        small = img[np.ix_(ys, xs)]
        rz["media_ref"].append(ref)
        rz["src_width"].append(int(w))
        rz["src_height"].append(int(h))
        rz["width"].append(int(nw))
        rz["height"].append(int(nh))
        rz["scale"].append(round(float(scale), 6))
        rz["mean_ink"].append(float(small.mean()))
    _write(
        "multimodal_resize",
        pa.table(rz).cast(
            pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("src_width", pa.int32()),
                    ("src_height", pa.int32()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("scale", pa.float64()),
                    ("mean_ink", pa.float64()),
                ]
            )
        ),
    )

    k = 4  # q_media_frame_sample uses k=4
    fr = {key: [] for key in (
        "media_ref", "frame_idx", "n_frames", "width", "height", "mean_ink",
    )}
    for ref in refs:
        digest = hashlib.sha256(str(ref).encode()).digest()
        n_frames = 8 + digest[0] % 17
        take = min(k, n_frames)
        idxs = sorted({int(i * n_frames / take) for i in range(take)})
        for idx in idxs:
            frame, _ = stub_pixels(f"{ref}#f{idx}")
            fr["media_ref"].append(ref)
            fr["frame_idx"].append(idx)
            fr["n_frames"].append(n_frames)
            fr["width"].append(int(frame.shape[1]))
            fr["height"].append(int(frame.shape[0]))
            fr["mean_ink"].append(float(frame.mean()))
    _write(
        "multimodal_frame_sample",
        pa.table(fr).cast(
            pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("frame_idx", pa.int32()),
                    ("n_frames", pa.int32()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("mean_ink", pa.float64()),
                ]
            )
        ),
    )


def gen_winnow() -> None:
    # independent re-derivation, NOT the engine kernel (see docstring)
    from independent_kernels import independent_winnow

    out = {"corpus_sig": [], "doc_id": [], "fingerprint": []}
    for sf_dir in SF_DIRS:
        doc_ids, texts, sig = _docs_table(sf_dir)
        for doc_id, text in zip(doc_ids, texts):
            for fp in independent_winnow(str(text or "").split()):
                out["corpus_sig"].append(sig)
                out["doc_id"].append(doc_id)
                out["fingerprint"].append(fp)
    _write(
        "text_winnow_fingerprints",
        pa.table(out).cast(
            pa.schema(
                [
                    ("corpus_sig", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("fingerprint", pa.int64()),
                ]
            )
        ),
    )


def gen_html_main_content() -> None:
    from pdf_to_xls_vision_spark.functions.html import (
        main_content_of,
        synthesize_html,
    )

    docs = synthesize_html(512)
    out = {
        "doc_id": [d["doc_id"] for d in docs],
        "main_text": [main_content_of(d["html"]) for d in docs],
    }
    _write(
        "html_main_content",
        pa.table(out).cast(
            pa.schema([("doc_id", pa.string()), ("main_text", pa.string())])
        ),
    )


def _independent_train(texts):
    """Word-freq + merges + vocab via the independent implementations
    (the pretokenizer regex is shared — it IS the spec)."""
    from independent_kernels import (
        independent_build_vocab,
        independent_learn_merges,
    )

    from pdf_to_xls_vision_spark.functions.bpe import (
        MAX_TRAIN_WORDS,
        N_MERGES,
        _PRETOKEN_RE,
    )

    wf: dict[str, int] = {}
    for text in texts:
        for m in _PRETOKEN_RE.findall(str(text or "")):
            if m.strip() != "":
                wf[m] = wf.get(m, 0) + 1
    top = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_TRAIN_WORDS]
    merges = independent_learn_merges(top, N_MERGES)
    return merges, independent_build_vocab(top, merges)


def gen_bpe_merge_tokens() -> None:
    # independent learner + one-at-a-time encoder (see docstring)
    from independent_kernels import independent_encode_word

    from pdf_to_xls_vision_spark.functions.bpe import _PRETOKEN_RE

    out = {"corpus_sig": [], "doc_id": [], "bpe_tokens": []}
    for sf_dir in SF_DIRS:
        doc_ids, texts, sig = _docs_table(sf_dir)
        merges, _vocab = _independent_train(texts)
        ranks = {p: i for i, p in enumerate(merges)}
        cache: dict = {}
        for doc_id, text in zip(doc_ids, texts):
            n = 0
            for m in _PRETOKEN_RE.findall(str(text or "")):
                if m.strip() == "":
                    continue
                hit = cache.get(m)
                if hit is None:
                    hit = len(independent_encode_word(m, ranks))
                    cache[m] = hit
                n += hit
            out["corpus_sig"].append(sig)
            out["doc_id"].append(doc_id)
            out["bpe_tokens"].append(n)
    _write(
        "text_bpe_merge_tokens",
        pa.table(out).cast(
            pa.schema(
                [
                    ("corpus_sig", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("bpe_tokens", pa.int32()),
                ]
            )
        ),
    )


def gen_bpe_token_ids() -> None:
    # independent learner + vocab + one-at-a-time encoder (see docstring)
    from independent_kernels import independent_encode_word

    from pdf_to_xls_vision_spark.functions.bpe import _PRETOKEN_RE

    out = {"corpus_sig": [], "doc_id": [], "pos": [], "token_id": []}
    for sf_dir in SF_DIRS:
        doc_ids, texts, sig = _docs_table(sf_dir)
        merges, vocab = _independent_train(texts)
        ranks = {p: i for i, p in enumerate(merges)}
        cache: dict = {}
        for doc_id, text in zip(doc_ids, texts):
            ids: list[int] = []
            for m in _PRETOKEN_RE.findall(str(text or "")):
                if m.strip() == "":
                    continue
                hit = cache.get(m)
                if hit is None:
                    hit = [
                        vocab.get(t, -1)
                        for t in independent_encode_word(m, ranks)
                    ]
                    cache[m] = hit
                ids.extend(hit)
            out["corpus_sig"].extend([sig] * len(ids))
            out["doc_id"].extend([doc_id] * len(ids))
            out["pos"].extend(range(len(ids)))
            out["token_id"].extend(ids)
    _write(
        "text_bpe_token_ids",
        pa.table(out).cast(
            pa.schema(
                [
                    ("corpus_sig", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("pos", pa.int32()),
                    ("token_id", pa.int32()),
                ]
            )
        ),
    )


def gen_extraction_metrics() -> None:
    """Independent sequential metrics oracle (tests/oracle.py:
    oracle_document_metrics) — same strength class as
    extraction_spans; no Spark involved."""
    from oracle import oracle_document_metrics

    from pdf_to_xls_vision_spark.corpus import generate_corpus

    docs = generate_corpus(64)
    rows = [oracle_document_metrics(d, s) for d, s in docs]
    rows.sort(key=lambda r: r["doc_id"])
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    _write(
        "extraction_metrics",
        pa.table(cols).cast(
            pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("n_tables", pa.int32()),
                    ("pages_parsed", pa.int64()),
                    ("rotation_corrections", pa.int64()),
                    ("quality_retried", pa.int32()),
                    ("rollup_rows", pa.int64()),
                    ("n_notes", pa.int64()),
                    ("validation_status", pa.string()),
                    ("accuracy_pct", pa.float64()),
                ]
            )
        ),
    )


def gen_phash_dedup() -> None:
    """Sequential replay of the perceptual-hash dedup, with the aHash
    computed by explicit Python block loops (the engine kernel uses a
    numpy reshape-sum) — a mild re-derivation of the bit definition
    ``64 * block_sum > total_sum`` plus an independent dict-based
    clustering."""
    from pdf_to_xls_vision_spark.core.vision import stub_pixels

    refs = _corpus_media_refs()
    sigs = {}
    for ref in refs:
        img, _ = stub_pixels(ref)
        h, w = img.shape
        bh, bw = (h // 8) * 8, (w // 8) * 8
        sh, sw = bh // 8, bw // 8
        total = 0
        sums = []
        for by in range(8):
            for bx in range(8):
                s = 0
                for y in range(by * sh, (by + 1) * sh):
                    for x in range(bx * sw, (bx + 1) * sw):
                        s += int(img[y, x])
                sums.append(s)
                total += s
        out = 0
        for i, s in enumerate(sums):
            if 64 * s > total:
                out |= 1 << i
        if out >= (1 << 63):
            out -= 1 << 64
        sigs[ref] = out
    clusters = {}
    for ref, sig in sigs.items():
        clusters.setdefault(sig, []).append(ref)
    cols = {k: [] for k in (
        "media_ref", "phash", "cluster_size", "canonical_ref",
        "is_canonical",
    )}
    for ref in refs:
        sig = sigs[ref]
        members = clusters[sig]
        canon = min(members)
        cols["media_ref"].append(ref)
        cols["phash"].append(sig)
        cols["cluster_size"].append(len(members))
        cols["canonical_ref"].append(canon)
        cols["is_canonical"].append(ref == canon)
    _write(
        "multimodal_phash_dedup",
        pa.table(cols).cast(
            pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("phash", pa.int64()),
                    ("cluster_size", pa.int64()),
                    ("canonical_ref", pa.string()),
                    ("is_canonical", pa.bool_()),
                ]
            )
        ),
    )


def main() -> None:
    gen_extraction_spans()
    gen_multimodal()
    gen_phash_dedup()
    gen_winnow()
    gen_html_main_content()
    gen_bpe_merge_tokens()
    gen_bpe_token_ids()
    gen_extraction_metrics()


if __name__ == "__main__":
    main()
