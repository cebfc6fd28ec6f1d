"""Multimodal column plumbing: media spans as opaque payloads + typed
metadata, feature extraction via ``mapInPandas``.

The Spark-side shape is production-real — schema, batching, UDF
signatures, partition behavior — while the codec layer is stubbed (no
image/audio libraries ship in this container): ``stub_pixels``
deterministically materializes a raster for a ``media_ref`` the way a
fetch+decode stage would. A deployment replaces :class:`MediaDecoder`
with a real decoder; the plan is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_to_xls_vision_spark.core.vision import detect_rotation, stub_pixels


class MediaDecoder:
    """Decode seam. ``decode(media_ref) -> np.ndarray`` grayscale.

    The default resolves via the deterministic stub; a real
    implementation would fetch bytes from the ref (e.g. object storage)
    and decode — raising here documents exactly what is stubbed."""

    def decode(self, media_ref: str) -> np.ndarray:
        pixels, _ = stub_pixels(media_ref)
        return pixels


class RealCodecDecoder(MediaDecoder):
    """Placeholder for a PIL/libvips-backed decoder (not available in
    this environment)."""

    def decode(self, media_ref: str) -> np.ndarray:
        raise NotImplementedError(
            "image codecs are not installed in this container; "
            "plug a PIL/libvips decoder here in production"
        )


FEATURE_SCHEMA = (
    "media_ref string, width int, height int, mean_ink double, "
    "ink_bands int, detected_rotation int, rotation_confidence double"
)


def media_features(
    media: DataFrame,
    ref_col: str = "media_ref",
    decoder: MediaDecoder | None = None,
) -> DataFrame:
    """Feature-extract every media ref: dimensions, mean ink, count of
    dark horizontal bands (text-line proxy), rotation estimate. One
    decode per ref per Arrow batch; batches bound Python memory."""
    decoder = decoder or MediaDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref in b[ref_col]:
                img = decoder.decode(ref)
                rot, conf = detect_rotation(img)
                row_means = img.mean(axis=1)
                bands = int(((row_means[1:] > 100) & (row_means[:-1] <= 100)).sum())
                rows.append(
                    {
                        "media_ref": ref,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "mean_ink": float(img.mean()),
                        "ink_bands": bands,
                        "detected_rotation": int(rot),
                        "rotation_confidence": float(conf),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select(ref_col).distinct().mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_ref string, src_width int, src_height int, "
    "width int, height int, scale double, mean_ink double"
)


def resize_media(
    media: DataFrame,
    max_dim: int = 64,
    ref_col: str = "media_ref",
    decoder: MediaDecoder | None = None,
) -> DataFrame:
    """Downscale every media payload so max(width, height) <= max_dim.

    The resample is integer-index nearest-neighbor (pure numpy —
    deterministic, no codec dependency); aspect ratio is preserved and
    already-small images pass through at scale 1.0. This is the
    distributed shape of the reference's under-the-API-cap resize
    (image_processing.py:15-83, whose 0.9/sqrt + x0.85 ladder lives in
    core/vision.resize_plan); a production decoder swaps in LANCZOS
    without touching the plan.
    """
    decoder = decoder or MediaDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref in b[ref_col]:
                img = decoder.decode(ref)
                h, w = img.shape
                scale = min(1.0, max_dim / max(h, w))
                nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
                ys = (np.arange(nh) * (h / nh)).astype(np.int64)
                xs = (np.arange(nw) * (w / nw)).astype(np.int64)
                small = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_ref": ref,
                        "src_width": int(w),
                        "src_height": int(h),
                        "width": int(nw),
                        "height": int(nh),
                        "scale": round(float(scale), 6),
                        "mean_ink": float(small.mean()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select(ref_col).distinct().mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "media_ref string, frame_idx int, n_frames int, "
    "width int, height int, mean_ink double"
)


def sample_frames(
    media: DataFrame,
    k: int = 4,
    ref_col: str = "media_ref",
    decoder: MediaDecoder | None = None,
) -> DataFrame:
    """Uniform frame sampling for video-like media: pick ``k`` evenly
    spaced frame indices from each ref's frame count and decode only
    those (the decode seam receives ``ref#f{idx}``). Frame counts come
    from the payload metadata — here derived deterministically from the
    ref (8-24 frames) the way a container header would supply them.
    Emits one row per sampled frame; never materializes the full video.
    """
    decoder = decoder or MediaDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for b in batches:
            rows = []
            for ref in b[ref_col]:
                digest = hashlib.sha256(str(ref).encode()).digest()
                n_frames = 8 + digest[0] % 17
                take = min(k, n_frames)
                idxs = sorted(
                    {int(i * n_frames / take) for i in range(take)}
                )
                for idx in idxs:
                    frame = decoder.decode(f"{ref}#f{idx}")
                    rows.append(
                        {
                            "media_ref": ref,
                            "frame_idx": idx,
                            "n_frames": n_frames,
                            "width": int(frame.shape[1]),
                            "height": int(frame.shape[0]),
                            "mean_ink": float(frame.mean()),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.select(ref_col).distinct().mapInPandas(run, FRAME_SCHEMA)


def corpus_media_refs(docs: DataFrame) -> DataFrame:
    """All media refs of a span corpus (image spans only)."""
    return (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "image")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )


PHASH_SCHEMA = "media_ref string, phash long"


def ahash_bits(img: np.ndarray) -> int:
    """64-bit average-hash of a grayscale raster, integer-exact: the
    image is cropped to the largest 8x8-divisible window, and bit i is
    set iff ``64 * block_sum_i > total_sum`` (cross-multiplied — no
    float mean, so the signature is bit-identical in any replay).
    Bit order: row-major blocks, bit 0 = top-left, little-endian."""
    h, w = img.shape
    bh, bw = (h // 8) * 8, (w // 8) * 8
    if bh == 0 or bw == 0:
        return 0
    a = img[:bh, :bw].astype(np.int64)
    blocks = a.reshape(8, bh // 8, 8, bw // 8).sum(axis=(1, 3))
    total = int(blocks.sum())
    bits = (blocks * 64 > total).ravel()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    # two's-complement wrap so the signature fits a signed int64 column
    return out - (1 << 64) if out >= (1 << 63) else out


def phash_media(
    media: DataFrame,
    ref_col: str = "media_ref",
    decoder: MediaDecoder | None = None,
) -> DataFrame:
    """Perceptual (average) hash per media ref: decode -> 64-bit
    integer aHash signature. Same mapInPandas shape as
    :func:`media_features` — one decode per distinct ref, Arrow
    batches bound Python memory; the signature computation is the
    integer-exact :func:`ahash_bits`."""
    decoder = decoder or MediaDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref in b[ref_col]:
                img = decoder.decode(ref)
                rows.append(
                    {"media_ref": ref, "phash": ahash_bits(img)}
                )
            yield pd.DataFrame(rows)

    return media.select(ref_col).distinct().mapInPandas(run, PHASH_SCHEMA)


def phash_dedup(
    media: DataFrame,
    ref_col: str = "media_ref",
    decoder: MediaDecoder | None = None,
) -> DataFrame:
    """Image near-dup dedup by identical perceptual hash — the
    multimodal sibling of exact text dedup (visually-flat or
    re-encoded duplicates collapse to one signature even when their
    bytes differ). Returns ``(media_ref, phash, cluster_size,
    canonical_ref, is_canonical)`` with the minimum ref canonical
    (same convention as exact_duplicates). One hash aggregate on the
    64-bit signature after the map-only hash stage — the scale shape
    of exact dedup; banded Hamming-near matching would follow the
    SimHash pattern if a looser match is ever needed."""
    hashed = phash_media(media, ref_col, decoder)
    clusters = hashed.groupBy("phash").agg(
        F.count("*").cast("long").alias("cluster_size"),
        F.min("media_ref").alias("canonical_ref"),
    )
    return hashed.join(clusters, "phash").select(
        "media_ref",
        "phash",
        "cluster_size",
        "canonical_ref",
        (F.col("media_ref") == F.col("canonical_ref")).alias("is_canonical"),
    )


def phash_near_dups(
    media: DataFrame,
    ref_col: str = "media_ref",
    decoder: MediaDecoder | None = None,
    *,
    max_hamming: int = 7,
    bands: int = 8,
) -> DataFrame:
    """COMPLETE image near-dup pairs by perceptual-hash Hamming
    distance: every ref pair whose 64-bit aHash signatures differ in
    at most ``max_hamming`` bits, found without an all-pairs join.

    Completeness is the pigeonhole guarantee (same principle as the
    prefix-filter Jaccard join): the signature splits into ``bands``
    equal bit-bands, and two signatures differing in fewer than
    ``bands`` bits must agree EXACTLY on at least one band — so a
    band-key equi-join finds every qualifying pair, and the exact
    ``bit_count(xor)`` filter removes band-colliding far pairs. The
    constructor enforces ``max_hamming < bands``.

    Scale shape: banding runs over DISTINCT signatures (the band join
    scales with signature diversity, not corpus size — boilerplate
    images collapse first); equal-signature ref pairs (Hamming 0) are
    emitted from the exact clusters directly. At 10^12 refs an exact
    cluster of boilerplate images makes pair output itself quadratic —
    production reports those via :func:`phash_dedup` clusters and runs
    this operator on the canonical signatures only; the registered
    toy-scale query emits ref pairs for oracle comparability.

    Returns ``(ref_a, ref_b, hamming)`` with ``ref_a < ref_b``.
    """
    if not 0 <= max_hamming < bands:
        raise ValueError("requires 0 <= max_hamming < bands (pigeonhole)")
    if 64 % bands != 0:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    sigs = phash_media(media, ref_col, decoder)
    distinct_sigs = sigs.select("phash").distinct()
    banded = distinct_sigs.select(
        "phash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"r -> (phash >> (r * {width})) & {mask}L)"
            )
        ).alias("band", "key"),
    )
    other = banded.select(
        F.col("phash").alias("pb"),
        "band",
        "key",
    )
    sig_pairs = (
        banded.join(other, ["band", "key"])
        .where(F.col("phash") < F.col("pb"))
        .select(F.col("phash").alias("pa"), "pb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("pa ^ pb")).cast("long"))
        .where(F.col("hamming") <= max_hamming)
    )
    ra = sigs.select(F.col("phash").alias("pa"), F.col("media_ref").alias("ra"))
    rb = sigs.select(F.col("phash").alias("pb"), F.col("media_ref").alias("rb"))
    cross = sig_pairs.join(ra, "pa").join(rb, "pb").select(
        F.least("ra", "rb").alias("ref_a"),
        F.greatest("ra", "rb").alias("ref_b"),
        "hamming",
    )
    same = (
        sigs.join(
            sigs.select(
                F.col("phash"), F.col("media_ref").alias("rb")
            ),
            "phash",
        )
        .where(F.col("media_ref") < F.col("rb"))
        .select(
            F.col("media_ref").alias("ref_a"),
            F.col("rb").alias("ref_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return cross.unionByName(same)
