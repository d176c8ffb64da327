"""Deterministic hashing primitives (numpy-vectorized, Spark-free).

These run inside Arrow-batched pandas UDFs, so they must be (a) fully
deterministic across worker processes — no Python ``hash()``, which is
salted per process — and (b) vectorized: one numpy pass per document,
one Python loop level per *batch*, never per row of anything hot.

Used by: MinHash-LSH entity linking/near-dup (SURVEY.md §2.2 joins),
SimHash dedup, document fingerprinting.
"""

from __future__ import annotations

import numpy as np

MERSENNE61 = (1 << 61) - 1
_SHINGLE_BASE = 1_000_003
_MIX = 0x9E3779B97F4A7C15  # 64-bit golden-ratio mixing constant


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct polynomial hashes of all k-char shingles of ``text``.

    Rolling polynomial hash over the UTF-8 bytes, computed with a
    strided matrix multiply — O(len) numpy work, no Python loop.
    Returns a sorted unique ``uint64`` array (empty for short texts).
    """
    data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    n = data.size - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    powers = (
        np.power(
            np.uint64(_SHINGLE_BASE),
            np.arange(k, dtype=np.uint64),
            dtype=np.uint64,
        )
    )
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    hashes = (windows * powers).sum(axis=1)  # wraps mod 2^64, deterministic
    return np.unique(hashes)


def word_shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct hashes of word n-grams (whitespace tokenization)."""
    words = text.split()
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.unique(np.array([stable_str_hash(g) for g in grams], dtype=np.uint64))


def stable_str_hash(s: str) -> int:
    """64-bit FNV-1a — process-independent string hash."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8", "ignore"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_permutations(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) coefficient vectors for ``(a*x + b) mod 2^61-1``."""
    rs = np.random.RandomState(seed)
    a = rs.randint(1, MERSENNE61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rs.randint(0, MERSENNE61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature of a shingle-hash set; int64, one value per perm.

    Empty input yields the max sentinel so empty docs never collide
    into real LSH buckets.
    """
    num_perm = a.size
    if shingles.size == 0:
        return np.full(num_perm, MERSENNE61, dtype=np.int64)
    x = shingles.astype(np.uint64) % np.uint64(MERSENNE61)
    # (num_perm, n_shingles) — fine for per-document shingle counts;
    # callers chunk very large docs upstream
    vals = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(MERSENNE61)
    return vals.min(axis=1).astype(np.int64)


def band_hashes(signature: np.ndarray, bands: int) -> list[int]:
    """Fold each band of the signature into one deterministic int64 key.

    Band b of a (bands × rows) split becomes the LSH bucket key
    ``(b, band_hash)`` — two docs share a bucket iff a whole band of
    their signatures matches.
    """
    rows = signature.size // bands
    out = []
    with np.errstate(over="ignore"):  # FNV-1a relies on uint64 wraparound
        for b in range(bands):
            h = np.uint64(1469598103934665603)
            for v in signature[b * rows : (b + 1) * rows]:
                h = (h ^ np.uint64(v)) * np.uint64(1099511628211)
            # mix band index in, keep positive int64 range
            mixed = int((h ^ (np.uint64(b) * np.uint64(_MIX))) & np.uint64(0x7FFFFFFFFFFFFFFF))
            out.append(mixed)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (sign-sum of token bits)."""
    words = text.split()
    if not words:
        return 0
    hashes = np.array([stable_str_hash(w) for w in words], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    sums = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.nonzero(sums > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return int(out & np.uint64(0x7FFFFFFFFFFFFFFF))


def rolling_fingerprint(text: str, window: int = 64) -> int:
    """Deterministic document fingerprint: min rolling hash over windows.

    Winnowing-style: robust to small edits at either end of the doc.
    """
    h = char_shingle_hashes(text, k=min(window, max(len(text), 1)))
    if h.size == 0:
        return stable_str_hash(text)
    return int(h.min() & np.uint64(0x7FFFFFFFFFFFFFFF))
