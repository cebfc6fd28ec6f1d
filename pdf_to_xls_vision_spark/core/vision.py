"""Vision-path kernels: deterministic inference stub, CSV response
parsing, projection-profile rotation detection, API-size resize plan.

Reference behaviors re-expressed (see SURVEY.md §2.4):

- V5 vision call (table_extraction.py:46-133) — in-sandbox the network
  call is replaced by :func:`stub_csv`, a deterministic CSV generator
  keyed by ``media_ref`` (FIXTURES.md §3). The real API client stays
  injectable via :class:`VisionBackend`.
- V6 response parse (table_extraction.py:136-160) — markdown fence
  strip + the exact 3-level ``read_csv`` fallback ladder.
- V2/V3 rotation (image_processing.py:86-148) — Tesseract OSD replaced
  by projection-profile scoring over the stubbed pixel payloads;
  correction gate kept: ``rotation != 0 and confidence > 1.0``
  (image_processing.py:141,206).
- V4 resize-for-API (image_processing.py:15-83) — the 5 MB ladder is a
  pure plan function here (initial scale ``0.9/sqrt(ratio)``, then
  x0.85, floor 100 px, <=10 attempts); PNG codecs are not in this
  container so encoding is stubbed behind the same interface.
"""

from __future__ import annotations

import hashlib
import math
from io import StringIO

import numpy as np
import pandas as pd

MAX_IMAGE_B64_BYTES = 5 * 1024 * 1024  # image_processing.py:12
ROTATION_CONFIDENCE_GATE = 1.0  # image_processing.py:141,206

_STUB_SIZE = 32  # synthetic page raster (square so rot90 keeps shape)


def _rng_for(media_ref: str, salt: str = "") -> np.random.Generator:
    digest = hashlib.sha256((salt + media_ref).encode("utf-8")).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "big"))


# ---------------------------------------------------------------------------
# V5 stub — deterministic "vision model" keyed by media_ref
# ---------------------------------------------------------------------------

_CATEGORIES = [
    "GrossRentalIncome", "ParkingIncome", "UtilityReimb", "LateFees",
    "ManagerSalary", "Electricity", "Water", "Insurance", "Repairs",
    "Landscaping", "Administrative", "Marketing", "Janitorial",
]
_HEADERS = ["REVENUES", "EXPENSES", "AdministrativeExpenses", "UtilityExpenses"]
_ROLLUPS = ["TotalRevenues", "TotalExpenses", "NetOperatingIncome"]
_NOTES = [
    "Assumes 5% vacancy", "Audited figures", "Preliminary estimate",
    "Excludes capital reserve", "Per management report",
]


def _fmt_number(rng: np.random.Generator) -> str:
    n = int(rng.integers(1, 999_999))
    s = f"{n:,}"
    if rng.random() < 0.18:
        s = f"({s})"  # accounting negatives (table_extraction.py:106 rule 4)
    if rng.random() < 0.08:
        s = f"${s}"
    if rng.random() < 0.06:
        s = f"{int(rng.integers(1, 99))}.{int(rng.integers(0, 99)):02d}%"
    return s


def _csv_quote(v: str) -> str:
    return f'"{v}"' if ("," in v) else v


def stub_csv(media_ref: str) -> str | None:
    """Deterministic vision-model response for one page image.

    Emits CSV in the reference prompt's output contract
    (Row_Type, Category, numeric columns, optional trailing Notes —
    table_extraction.py:85-118). A seeded fraction of responses
    exercises each defensive path of the reference parser:

    - ``None`` (~3%): page with no table (table_extraction.py:193-195),
    - markdown fences (~20%): fence stripper (table_extraction.py:139-141),
    - a malformed extra-field line (~8%): the ``on_bad_lines='skip'``
      fallback (table_extraction.py:151-153),
    - "( 297)"-style per-cell artifacts (~15%): repair_cell targets
      (data_cleaning.py:7-48),
    - ")("-cascade rows (~10%): cascade fixpoint targets
      (data_cleaning.py:72-163).
    """
    rng = _rng_for(media_ref, salt="csv:")
    if rng.random() < 0.03:
        return None

    n_year_cols = int(rng.integers(2, 6))
    years = [str(2024 - j) for j in range(n_year_cols)]
    with_notes = rng.random() < 0.30
    cols = ["Row_Type", "Category"] + years + (["Notes"] if with_notes else [])

    n_rows = int(rng.integers(3, 13))
    lines = [",".join(cols)]
    cascade_row_at = int(rng.integers(0, n_rows)) if rng.random() < 0.10 else -1
    artifact_p = 0.15 if rng.random() < 0.5 else 0.0
    for i in range(n_rows):
        roll = rng.random()
        if roll < 0.15:
            row_type, cat = "HEADER", str(rng.choice(_HEADERS))
        elif roll < 0.85:
            row_type, cat = "DETAIL", str(rng.choice(_CATEGORIES))
        else:
            row_type, cat = "ROLLUP", str(rng.choice(_ROLLUPS))
        nums = [_fmt_number(rng) for _ in years]
        if i == cascade_row_at and len(nums) >= 3:
            # plant the documented typewriter cascade (data_cleaning.py:79-81)
            base = [n.strip("()$%") for n in nums]
            nums[0] = f"{base[0]} ("
            for j in range(1, len(nums) - 1):
                nums[j] = f"{base[j]})("
            nums[-1] = f"{base[-1]})"
        elif artifact_p and rng.random() < artifact_p:
            j = int(rng.integers(0, len(nums)))
            bare = nums[j].strip("()$%")
            style = rng.random()
            if style < 0.4:
                nums[j] = f"( {bare})"
            elif style < 0.7:
                nums[j] = f"( {bare}"
            else:
                nums[j] = f"(({bare})"
        fields = [row_type, cat] + [_csv_quote(n) for n in nums]
        if with_notes:
            note = (
                str(rng.choice(_NOTES))
                if (row_type == "HEADER" and rng.random() < 0.6)
                else ""
            )
            fields.append(note)
        lines.append(",".join(fields))

    if rng.random() < 0.08 and n_rows > 2:
        # malformed line with stray extra fields -> read_csv ladder level 2.
        # Never the first data row: extra fields there trigger pandas
        # index inference instead of a parse error, producing a
        # MultiIndex frame the reference's cleaners choke on (and skip
        # via their try/except, table_extraction.py:171-182).
        k = int(rng.integers(2, n_rows))
        lines[k] = lines[k] + ",999,999"

    body = "\n".join(lines)
    if rng.random() < 0.20:
        body = "```csv\n" + body + "\n```"
    return body


def parse_vision_csv(csv_content: str | None) -> pd.DataFrame | None:
    """Fence strip + 3-level read_csv fallback ladder
    (table_extraction.py:136-160). Returns None when unparseable or
    empty — the caller skips the page and continues."""
    if not csv_content or not csv_content.strip():
        return None
    content = csv_content.strip()
    if content.startswith("```"):
        lines = content.split("\n")
        if len(lines) > 2:
            content = "\n".join(lines[1:-1])
    df = None
    try:
        df = pd.read_csv(StringIO(content))
    except Exception:
        try:
            df = pd.read_csv(StringIO(content), on_bad_lines="skip")
        except Exception:
            try:
                df = pd.read_csv(StringIO(content), sep=None, engine="python")
            except Exception:
                return None
    if df is None or df.empty or df.shape[0] == 0 or df.shape[1] == 0:
        return None
    return df


# ---------------------------------------------------------------------------
# V2/V3 — pixels stub + projection-profile rotation detection
# ---------------------------------------------------------------------------

def _canonical_page_raster(rng: np.random.Generator) -> np.ndarray:
    """A synthetic upright page: dark header band at the top and a dark
    left margin rail, over faint text rows. Ink = darkness in [0,255],
    uint8, asymmetric on both axes so all four rotations score apart."""
    img = np.zeros((_STUB_SIZE, _STUB_SIZE), dtype=np.uint8)
    img[2:6, :] = 220  # header band (top-heavy)
    img[:, 2:5] = 180  # margin rail (left-heavy)
    for r in range(10, _STUB_SIZE - 2, 4):  # text lines
        img[r, 6:-2] = 90
    noise = rng.integers(0, 20, size=img.shape, dtype=np.uint8)
    return img | noise


def rotate_cw(img: np.ndarray, degrees: int) -> np.ndarray:
    """Rotate a square raster clockwise by a multiple of 90 degrees."""
    return np.rot90(img, k=(4 - (degrees // 90)) % 4)


def stub_pixels(media_ref: str) -> tuple[np.ndarray, int]:
    """Deterministic pixel payload for ``media_ref``.

    Returns ``(raster, expected_correction)`` where the correction is
    the clockwise angle that restores upright orientation (the
    Tesseract-OSD ``Rotate:`` convention, image_processing.py:104-106).
    ~5% of pages are near-uniform "ambiguous" rasters whose detection
    confidence fails the >1.0 gate, exercising the no-correction path.
    """
    rng = _rng_for(media_ref, salt="pix:")
    if rng.random() < 0.05:
        flat = np.full((_STUB_SIZE, _STUB_SIZE), 40, dtype=np.uint8)
        return flat, 0
    correction = int(rng.choice([0, 0, 0, 0, 0, 0, 0, 90, 180, 270]))
    canonical = _canonical_page_raster(rng)
    displayed = rotate_cw(canonical, (360 - correction) % 360)
    return displayed, correction


def _uprightness(img: np.ndarray) -> int:
    """Integer asymmetry score: ink mass pulled to the top and the left,
    the signature of :func:`_canonical_page_raster`. Integer sums keep
    the argmax bit-identical everywhere."""
    h, w = img.shape
    q_h, q_w = h // 4, w // 4
    a = img.astype(np.int64)
    return int(
        a[:q_h].sum() - a[h - q_h:].sum() + a[:, :q_w].sum() - a[:, w - q_w:].sum()
    )


def detect_rotation(img: np.ndarray) -> tuple[int, float]:
    """Projection-profile rotation detection.

    Scores the four clockwise candidate corrections and returns
    ``(best_angle, confidence)`` where confidence is the margin between
    the best and runner-up scores scaled to the raster area — analogous
    to OSD's orientation confidence. Ambiguous rasters give margin 0,
    failing the reference's ``confidence > 1.0`` gate.
    """
    scores = [(_uprightness(rotate_cw(img, d)), -d) for d in (0, 90, 180, 270)]
    ranked = sorted(scores, reverse=True)
    best_score, neg_best_angle = ranked[0]
    margin = best_score - ranked[1][0]
    confidence = margin / float(img.size)
    return -neg_best_angle, confidence


def correct_rotation(img: np.ndarray) -> tuple[np.ndarray, int]:
    """Detect + conditionally apply rotation correction.

    Returns ``(corrected, applied_angle)``; applies only when
    ``angle != 0 and confidence > 1.0`` (image_processing.py:141,206).
    """
    angle, confidence = detect_rotation(img)
    if angle != 0 and confidence > ROTATION_CONFIDENCE_GATE:
        return rotate_cw(img, angle), angle
    return img, 0


# ---------------------------------------------------------------------------
# V4 — API-size resize plan (pure math; codecs stubbed out of container)
# ---------------------------------------------------------------------------

def resize_plan(
    width: int,
    height: int,
    encoded_size: int,
    max_size: int = MAX_IMAGE_B64_BYTES,
) -> list[tuple[int, int]]:
    """Dimension ladder the resizer would attempt (image_processing.py:41-79):
    first scale ``0.9 / sqrt(size_ratio)``, then multiply by 0.85 per
    retry, minimum 100x100, at most 10 attempts. Byte size at each step
    is estimated proportionally to pixel count (the reference re-encodes
    to measure; the container has no PNG codec, so the proportional
    model stands in — clearly a stub, same control flow)."""
    if encoded_size <= max_size:
        return []
    scale = (1.0 / math.sqrt(encoded_size / max_size)) * 0.9
    steps: list[tuple[int, int]] = []
    size = encoded_size
    for _ in range(10):
        if size <= max_size:
            break
        new_w = max(int(width * scale), 100)
        new_h = max(int(height * scale), 100)
        steps.append((new_w, new_h))
        size = int(encoded_size * (new_w * new_h) / (width * height))
        scale *= 0.85
    return steps


# ---------------------------------------------------------------------------
# Injectable backend — the production seam for a real vision model
# ---------------------------------------------------------------------------

class VisionBackend:
    """Interface of the vision-inference stage.

    ``infer_batch`` receives a list of media refs (one per page image)
    and returns one CSV string (or None) per ref. The default
    implementation is the deterministic stub; a production deployment
    plugs an API client here — the Spark plan (batched ``mapInPandas``
    stage) is identical either way.
    """

    def infer_batch(self, media_refs: list[str]) -> list[str | None]:
        return [stub_csv(ref) for ref in media_refs]
