"""Independent re-derivations of the winnowing and BPE kernels.

These are second implementations written from the algorithm specs
(Schleimer et al. SIGMOD'03 winnowing; Sennrich et al. ACL'16 BPE)
with deliberately different algorithmic shapes from the engine kernels
(functions/text.py `_winnow`, functions/bpe.py), so agreement between
the two is evidence about the *semantics*, not shared code paths:

- winnowing: **incremental rolling hash** (leading-term subtraction,
  O(1) per k-gram) instead of the engine's per-window polynomial
  recompute, and a **monotonic-deque sliding minimum** instead of
  `min()` over each window slice.
- BPE learning: **lazy max-heap with incremental pair-count updates**
  (the subword-nmt shape) instead of the engine's full pair recount
  per merge round.
- BPE encoding: **one-occurrence-at-a-time, globally-lowest-rank-
  first** merging (the tiktoken shape) instead of the engine's
  merge-all-occurrences-of-the-best-pair pass.

`scripts/gen_expected.py` generates the winnow/BPE expected-parquet
fixtures FROM THESE implementations; `tests/test_independent_kernels.py`
asserts engine == independent over the real document corpora, closing
the self-referential loop the round-2 fixtures had.
"""

from __future__ import annotations

import hashlib
import heapq
from collections import deque

# ---------------------------------------------------------------------------
# winnowing (spec constants shared with the engine — they ARE the spec)
# ---------------------------------------------------------------------------

K = 5  # k-gram length in tokens
W = 4  # winnow window in k-grams
B = 1_000_003
M = (1 << 61) - 1


def _token_hash(t: str) -> int:
    """md5, first 7 bytes big-endian — the engine's portable token
    hash (the cross-engine contract, so both sides must use it)."""
    return int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:7], "big")


def independent_winnow(tokens: list[str]) -> list[int]:
    """Winnowing via incremental rolling hash + monotonic-deque window
    minimum; consecutive duplicate minima collapse."""
    n = len(tokens)
    if n < K:
        return []  # no full k-gram exists
    th = [_token_hash(t) for t in tokens]
    lead = pow(B, K - 1, M)
    h = 0
    for x in th[:K]:
        h = (h * B + x) % M
    hs = [h]
    for i in range(1, n - K + 1):
        h = ((h - th[i - 1] * lead) * B + th[i + K - 1]) % M
        hs.append(h)

    # sliding minimum over windows of W (or one window if fewer hashes)
    n_windows = max(len(hs) - W + 1, 1)
    out: list[int] = []
    prev: int | None = None
    dq: deque[int] = deque()  # indices with increasing hash values
    for j in range(n_windows):
        # indices entering window j: all of [0, W) for j == 0, else j+W-1
        entering = range(min(W, len(hs))) if j == 0 else range(j + W - 1, j + W)
        for idx in entering:
            if idx >= len(hs):
                break
            while dq and hs[dq[-1]] >= hs[idx]:
                dq.pop()
            dq.append(idx)
        while dq[0] < j:
            dq.popleft()
        m = hs[dq[0]]
        if m != prev:
            out.append(m)
            prev = m
    return out


# ---------------------------------------------------------------------------
# BPE learning — lazy heap + incremental pair-count maintenance
# ---------------------------------------------------------------------------


def _pairs_of(sym: tuple[str, ...]) -> list[tuple[str, str]]:
    return [(sym[i], sym[i + 1]) for i in range(len(sym) - 1)]


def _merge_once_all(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Left-to-right single pass merging every non-overlapping
    occurrence of ``pair`` (shared helper; trivially re-derived)."""
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def independent_learn_merges(
    word_freq: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """BPE merge learning with a lazy max-heap over pair counts and
    incremental count updates touching only words that contain the
    merged pair (subword-nmt's shape). Tie-break identical to the
    engine: highest count, then lexicographically smallest pair."""
    freqs: dict[tuple[str, ...], int] = {}
    for w, f in word_freq:
        key = tuple(w)
        freqs[key] = freqs.get(key, 0) + f

    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for sym, f in freqs.items():
        for p in _pairs_of(sym):
            counts[p] = counts.get(p, 0) + f
            where.setdefault(p, set()).add(sym)

    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in counts.items()
    ]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, pair = heapq.heappop(heap)
        cur = counts.get(pair, 0)
        if cur != -negc or cur == 0:
            continue  # stale heap entry
        if cur < 2:
            break
        merges.append(pair)

        touched = [s for s in where.get(pair, set()) if s in freqs]
        changed: set[tuple[str, str]] = set()
        for sym in touched:
            f = freqs.pop(sym)
            for p in _pairs_of(sym):
                counts[p] -= f
                changed.add(p)
                w = where.get(p)
                if w is not None:
                    w.discard(sym)
            new_sym = _merge_once_all(sym, pair)
            freqs[new_sym] = freqs.get(new_sym, 0) + f
            for p in _pairs_of(new_sym):
                counts[p] = counts.get(p, 0) + f
                changed.add(p)
                where.setdefault(p, set()).add(new_sym)
        for p in changed:
            c = counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
            else:
                counts.pop(p, None)
                where.pop(p, None)
    return merges


# ---------------------------------------------------------------------------
# BPE encoding — one-occurrence-at-a-time, lowest rank first
# ---------------------------------------------------------------------------


def independent_encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Repeatedly merge the single occurrence with the globally lowest
    merge rank (leftmost on ties) — the tiktoken inference loop. For a
    merge table produced by BPE training this is equivalent to the
    engine's merge-all-per-rank pass (a pair involving a rank-r token
    can only have rank > r)."""
    syms = list(word)
    while len(syms) > 1:
        best: tuple[int, int] | None = None  # (rank, index)
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or (r, i) < best):
                best = (r, i)
        if best is None:
            break
        _, i = best
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def independent_build_vocab(
    word_freq: list[tuple[str, int]], merges: list[tuple[str, str]]
) -> dict[str, int]:
    """Vocab layout per spec: sorted base characters first, then one id
    per merge in learned order (skipping already-present tokens)."""
    vocab: dict[str, int] = {}
    for ch in sorted({c for w, _ in word_freq for c in w}):
        vocab[ch] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab
