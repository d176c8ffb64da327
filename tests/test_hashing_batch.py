"""Differential tests: the across-row batch sketch functions must be
bitwise-identical to the per-row reference forms on every input shape
(empty docs, short docs, unicode, mixed lengths) — the batch paths are
what the pandas UDFs run, the per-row forms are the pinned spec.
"""

from __future__ import annotations

import random

import numpy as np

from turtle_spark.functions.hashing import (
    band_hashes,
    band_hashes_batch,
    char_shingle_hashes,
    char_shingle_hashes_batch,
    minhash_permutations,
    minhash_signature,
    minhash_signatures_batch,
    rolling_fingerprint,
    rolling_fingerprint_batch,
    simhash64,
    simhash64_batch,
)

_WORDS = "graph turtle parser stream shuffle skew entity mention Ω λ €".split()


def _corpus(n: int = 64, seed: int = 99) -> list[str]:
    rng = random.Random(seed)
    docs = ["", "x", "ab", "    ", "Человек-паук держит Ω"]
    for _ in range(n):
        docs.append(" ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 120))))
    return docs


def test_simhash_batch_differential() -> None:
    docs = _corpus()
    batch = simhash64_batch(docs)
    for i, d in enumerate(docs):
        assert int(batch[i]) == simhash64(d), repr(d)


def test_char_shingle_batch_differential() -> None:
    docs = _corpus()
    for k in (3, 5, 7):
        batch = char_shingle_hashes_batch(docs, k)
        for i, d in enumerate(docs):
            assert np.array_equal(batch[i], char_shingle_hashes(d, k)), (k, repr(d))


def test_minhash_batch_differential() -> None:
    docs = _corpus()
    a, b = minhash_permutations(128, seed=7)
    shingles = [char_shingle_hashes(d, 5) for d in docs]
    batch = minhash_signatures_batch(shingles, a, b)
    for i, s in enumerate(shingles):
        assert np.array_equal(batch[i], minhash_signature(s, a, b)), i


def test_band_hashes_batch_differential() -> None:
    docs = _corpus(16)
    a, b = minhash_permutations(128, seed=7)
    sigs = np.stack(
        [minhash_signature(char_shingle_hashes(d, 5), a, b) for d in docs]
    )
    batch = band_hashes_batch(sigs, 32)
    for i in range(len(docs)):
        assert list(batch[i]) == band_hashes(sigs[i], 32), i


def test_rolling_fingerprint_batch_differential() -> None:
    docs = _corpus()
    batch = rolling_fingerprint_batch(docs)
    for i, d in enumerate(docs):
        assert int(batch[i]) == rolling_fingerprint(d), repr(d)
