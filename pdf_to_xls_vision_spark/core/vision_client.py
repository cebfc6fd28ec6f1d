"""Live vision-inference backend for the batched ``mapInPandas`` stage.

Closes the "live vision API client" gap: a production
:class:`~pdf_to_xls_vision_spark.core.vision.VisionBackend`
implementation of the reference's per-page Claude Vision call
(``table_extraction.py:46-133``) against the PUBLIC Anthropic Messages
API (documented at https://docs.anthropic.com/en/api/messages), built
on stdlib-only HTTP so the sandbox needs no extra packages.

Design points:

* **Same stage contract as the stub** — ``infer_batch(media_refs) ->
  list[str | None]``; the Spark plan (one Arrow-batched ``mapInPandas``
  vision stage) is byte-identical whichever backend is plugged in.
  Media bytes are resolved per ref by an injectable ``media_loader``
  (production: the rendered + rotation-corrected + 5 MB-capped PNG from
  the V1-V4 stages; ``image_processing.py:168-235``).
* **Injectable transport** — ``transport(url, headers, body) ->
  (status, body_bytes)``; the default uses ``urllib``. Tests inject a
  fake and verify request shape, retry/backoff, and skip semantics
  without any network (the sandbox has none).
* **Reference error semantics** — a page whose call fails after
  retries yields ``None`` (skip the page, keep the document going):
  ``table_extraction.py:196-198`` catches per-page API errors and
  ``continue``s. Retries cover 429 + 5xx + transport faults with
  exponential backoff; 4xx (auth, bad request) fail fast to ``None``
  since retrying cannot help.
* **Config parity** — API key from ``ANTHROPIC_API_KEY`` (hard error on
  missing/placeholder, mirroring ``config.py:10-27``), model from
  ``CLAUDE_MODEL`` defaulting to ``claude-sonnet-4-5-20250929``
  (``config.py:30-36``), ``max_tokens=4096`` per page
  (``table_extraction.py:48``).

The prompt below is the reference's extraction prompt VERBATIM
(``table_extraction.py:63-118``) — it is the behavioral contract of the
vision stage (Row_Type/Category/sub-column/Notes rules that the
downstream CSV parser, cleaner, and span serializer all assume).
"""

from __future__ import annotations

import base64
import json
import os
import time
import urllib.error
import urllib.request
from typing import Callable

from pdf_to_xls_vision_spark.core.vision import VisionBackend

API_ENDPOINT = "https://api.anthropic.com/v1/messages"
API_VERSION = "2023-06-01"  # public, from docs.anthropic.com/en/api/versioning
DEFAULT_MODEL = "claude-sonnet-4-5-20250929"  # reference config.py:36
MAX_TOKENS = 4096  # reference table_extraction.py:48
PLACEHOLDER_KEY = "your-api-key-here"  # reference config.py:20

# Reference table_extraction.py:63-118, verbatim (the stage contract).
VISION_PROMPT = """Extract all tabular data from this image and return it as a CSV format.

CRITICAL ACCURACY REQUIREMENTS:
- Read each character VERY CAREFULLY - verify every letter and digit
- Pay special attention to similar-looking characters: 6 vs 8, O vs 0, l vs I, etc.
- Double-check all numbers for accuracy - transcription errors are NOT acceptable
- Verify text spelling character-by-character - do not guess or autocorrect
- If text is unclear, examine it closely before transcribing

Requirements:
1. IDENTIFY THE TABLE STRUCTURE:
   - Ignore marginal note references (like "Note 14.", "Note 3.", etc.) that appear in the left margin - these are NOT part of the table columns
   - Focus on the actual table columns that contain line items/categories and numeric values
   - The main table structure has: A single column for all categories and line items, followed by numeric columns (years, amounts)
   - CRITICAL: Watch for MULTIPLE SUB-COLUMNS per year/period:
     * Some tables have 2+ columns under each year header (e.g., percentage + amount, budget + actual, quantity + price)
     * Each sub-column MUST be a separate column in the CSV output
     * Create descriptive column names that identify BOTH the period AND the type
     * Examples: "2022_Percent,2022_Amount" or "2023_Budget,2023_Actual" or "Q1_Units,Q1_Price"
     * Look for sub-headers, data patterns, or $ signs to identify column types
     * If no sub-header exists, use descriptive names based on the data (e.g., "2022_Col1", "2022_Col2")

2. OUTPUT STRUCTURE:
   - Add a "Row_Type" column as the FIRST column to indicate the type of each row:
     * Use "HEADER" for section/category headers (e.g., "REVENUES", "EXPENSES", "Administrative Expenses", "Utility Expenses")
     * Use "DETAIL" for individual line items (e.g., "Gross rental income", "Manager's salary", "Electricity")
     * Use "ROLLUP" for total rows (e.g., "Total revenues", "Total expenses", "Net Operating Income")

   - Add a "Category" column as the SECOND column containing:
     * For HEADER rows: The section/category name (e.g., "REVENUES", "Administrative Expenses")
     * For DETAIL rows: The line item name (e.g., "Gross rental income", "Manager's salary")
     * For ROLLUP rows: The total label (e.g., "Total revenues", "Total expenses")

   - DO NOT create separate columns for categories and line items - everything goes in the single "Category" column

   - Follow with the numeric data columns (e.g., "2020", "2019")

3. Preserve all rows exactly as they appear:
   - Section headers (REVENUES, EXPENSES, etc.) → Row_Type: HEADER
   - Category headers (Administrative Expenses, Utility Expenses, etc.) → Row_Type: HEADER
   - Line items (Gross rental income, Manager's salary, etc.) → Row_Type: DETAIL
   - Total rows (Total revenues, Total expenses, etc.) → Row_Type: ROLLUP

4. Keep all numbers, text, and formatting characters (parentheses for negative numbers)

5. Use commas to separate columns

6. Put values with commas inside quotes

7. Include column headers if present

8. CRITICAL: Look for notes, annotations, or text outside/beside the main table columns:
   - If you see a "NOTES AND ASSUMPTIONS" section or numbered notes on the side, create a "Notes" column as the LAST column
   - Add the full text of each note to its corresponding row ONLY if the note specifically references that row
   - If a note is general context (not tied to a specific row), leave the Notes column empty for that row

9. Return ONLY the CSV data, no explanation

IMPORTANT:
- Do NOT include marginal note references (like "Note 14.") as table columns or data
- Do NOT create separate columns for categories vs line items - use ONE "Category" column for all text
- Do NOT skip breakdown items or sub-categories. Every line item visible in the table must appear in the output.
- Do NOT skip total/rollup rows. These are CRITICAL and must include their full labels with all numbers.
- Clearly mark which rows are HEADER, DETAIL, or ROLLUP using the Row_Type column.

If there are multiple tables, extract the largest/main table and any associated notes."""


def get_api_key(env: dict | None = None) -> str:
    """ANTHROPIC_API_KEY with the reference's hard-fail semantics
    (``config.py:10-27``): missing or placeholder -> ValueError."""
    environ = os.environ if env is None else env
    api_key = environ.get("ANTHROPIC_API_KEY")
    if not api_key or api_key == PLACEHOLDER_KEY:
        raise ValueError(
            "ANTHROPIC_API_KEY not found or not set. "
            "Get your API key from: https://console.anthropic.com/"
        )
    return api_key


def get_model_name(env: dict | None = None) -> str:
    """CLAUDE_MODEL with the reference's default (``config.py:30-36``)."""
    environ = os.environ if env is None else env
    return environ.get("CLAUDE_MODEL", DEFAULT_MODEL)


def _urllib_transport(url: str, headers: dict, body: bytes) -> tuple[int, bytes]:
    """Default transport: one POST, returning (status, body) without
    raising on HTTP error statuses (the retry policy decides)."""
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still has a body
        return e.code, e.read()


class AnthropicVisionBackend(VisionBackend):
    """Vision stage backend calling the public Anthropic Messages API.

    Parameters
    ----------
    media_loader:
        ``ref -> (image_bytes, media_type)`` — resolves a media ref to
        the rendered page raster (PNG per the reference's pipeline,
        already rotation-corrected and under the 5 MB cap by the V1-V4
        stages).
    api_key / model:
        Default to the reference's env-var contract (see module doc).
    transport:
        ``(url, headers, body) -> (status, body_bytes)``; injectable
        for tests. Default is stdlib urllib.
    max_retries / backoff_base / sleep:
        Retry policy for 429/5xx/transport faults: ``backoff_base *
        2**attempt`` seconds between tries. ``sleep`` is injectable so
        tests run instantly.
    """

    def __init__(
        self,
        media_loader: Callable[[str], tuple[bytes, str]],
        api_key: str | None = None,
        model: str | None = None,
        *,
        transport: Callable[[str, dict, bytes], tuple[int, bytes]] | None = None,
        endpoint: str = API_ENDPOINT,
        max_retries: int = 3,
        backoff_base: float = 1.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self._media_loader = media_loader
        self._api_key = api_key if api_key is not None else get_api_key()
        self._model = model if model is not None else get_model_name()
        self._transport = transport or _urllib_transport
        self._endpoint = endpoint
        self._max_retries = max_retries
        self._backoff_base = backoff_base
        self._sleep = sleep

    # -- request/response shape (reference table_extraction.py:46-133) --

    def _request_body(self, image_b64: str, media_type: str) -> bytes:
        payload = {
            "model": self._model,
            "max_tokens": MAX_TOKENS,
            "messages": [
                {
                    "role": "user",
                    "content": [
                        {
                            "type": "image",
                            "source": {
                                "type": "base64",
                                "media_type": media_type,
                                "data": image_b64,
                            },
                        },
                        {"type": "text", "text": VISION_PROMPT},
                    ],
                }
            ],
        }
        return json.dumps(payload).encode("utf-8")

    def _headers(self) -> dict:
        return {
            "x-api-key": self._api_key,
            "anthropic-version": API_VERSION,
            "content-type": "application/json",
        }

    @staticmethod
    def _parse_response(body: bytes) -> str | None:
        """First text block of the response — the raw model text; fence
        stripping and the 3-level CSV parse ladder stay downstream
        (core/vision.py), shared with the stub backend."""
        try:
            msg = json.loads(body.decode("utf-8"))
            for block in msg.get("content", []):
                if block.get("type") == "text":
                    return block.get("text")
            return None
        except (ValueError, AttributeError, UnicodeDecodeError):
            return None

    def _call_once(self, ref: str) -> tuple[bool, str | None]:
        """(retryable, text): one attempt for one page image."""
        image_bytes, media_type = self._media_loader(ref)
        body = self._request_body(
            base64.standard_b64encode(image_bytes).decode("ascii"), media_type
        )
        try:
            status, resp = self._transport(self._endpoint, self._headers(), body)
        except Exception:  # DNS/socket/timeout faults are retryable
            return True, None
        if status == 200:
            return False, self._parse_response(resp)
        if status == 429 or status >= 500:
            return True, None
        return False, None  # other 4xx: retrying cannot help

    def infer_batch(self, media_refs: list[str]) -> list[str | None]:
        out: list[str | None] = []
        for ref in media_refs:
            text: str | None = None
            for attempt in range(self._max_retries + 1):
                try:
                    retryable, text = self._call_once(ref)
                except NotImplementedError:
                    # deployment misconfiguration (no media codec), not
                    # a per-page fault — fail loudly, never emit a
                    # silently-empty extraction
                    raise
                except Exception:
                    # media_loader fault: this page only (reference
                    # skips the page and continues the document)
                    retryable, text = False, None
                if text is not None or not retryable:
                    break
                if attempt < self._max_retries:
                    self._sleep(self._backoff_base * (2**attempt))
            out.append(text)
        return out
