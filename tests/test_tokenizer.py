"""Tokenizer golden tests: exact token sequences for all 42 reference cases.

Mirrors the reference's TestScanTurtle (scanner/scanner_test.go:1419-1435).
"""

from __future__ import annotations

import pytest

from tests.conftest import load_scan_fixtures
from turtle_spark.core.tokenizer import tokenize

_CASES = load_scan_fixtures()


@pytest.mark.parametrize("name", sorted(_CASES))
def test_token_sequence(name: str) -> None:
    case = _CASES[name]
    assert list(tokenize(case["turtle"])) == case["tokens"]


# --- regex fast path vs exact machine ---------------------------------------

def test_tokenize_all_differential_fixtures() -> None:
    """The regex fast path (tokenize_all, used by parse_document) must
    segment identically to the per-char exact machine on every golden
    fixture — a silent divergence outside the parser fixtures would
    otherwise go unnoticed (the coverage fallback can mask it)."""
    from turtle_spark.core.tokenizer import tokenize_all

    for name in sorted(_CASES):
        text = _CASES[name]["turtle"]
        assert tokenize_all(text) == list(tokenize(text)), name


def test_tokenize_all_differential_fuzz() -> None:
    """Seeded fuzz corpus from the document generator's grammar."""
    import random

    from turtle_spark.core.tokenizer import tokenize_all
    from turtle_spark.sources.corpus import compose_turtle

    rng = random.Random(20240817)
    for i in range(300):
        text = compose_turtle(rng, n_statements=rng.randint(1, 8))
        assert tokenize_all(text) == list(tokenize(text)), f"fuzz case {i}"
    # adversarial shapes the generator rarely emits
    for text in [
        "", "#only comment", "a b 'c''d' .", 'p:x p:y """a\n"b""" .',
        "<a><b><c>.", "x:1 y:2 1e0^^xsd::integer .", "@prefix : <u> . : : : .",
        "s p ( 1 ( 2 ) [ :a :b ] ) .", "s p 'it''s' .",
    ]:
        assert tokenize_all(text) == list(tokenize(text)), repr(text)
