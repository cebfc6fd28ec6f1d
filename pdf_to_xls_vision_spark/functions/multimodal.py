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


def corpus_media_refs(docs: DataFrame) -> DataFrame:
    """All media refs of a span corpus (image spans only)."""
    return (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "image")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
