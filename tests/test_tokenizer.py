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


def test_tokenize_all_hypothesis_differential() -> None:
    """Property: on ARBITRARY text over a Turtle-hostile alphabet, the
    regex fast path must either match the exact machine or fall back
    to it (never silently diverge), and neither may crash."""
    from hypothesis import given, settings, strategies as st

    from turtle_spark.core.tokenizer import tokenize_all

    alphabet = 'ab"\'<>.;,()[]\\ \n\t#123eE+-:_^@'

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=120))
    def check(text: str) -> None:
        assert tokenize_all(text) == list(tokenize(text))

    check()


def test_parse_document_never_crashes() -> None:
    """Property: the parser is total — arbitrary garbage yields a
    ParseResult, never an exception (a malformed document at position
    10^11 of a corpus must not kill the executor)."""
    from hypothesis import given, settings, strategies as st

    from turtle_spark.core.parser import parse_document

    alphabet = 'ab"\'<>.;,()[]\\ \n\t#123eE+-:_^@prefixbase'

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=120))
    def check(text: str) -> None:
        result = parse_document(text)
        assert isinstance(result.triples, list)
        for t in result.triples:
            assert len(t) == 6

    check()
