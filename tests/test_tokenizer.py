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
