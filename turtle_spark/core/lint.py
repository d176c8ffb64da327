"""Structural lint over the Turtle token stream — the quarantine
gate's diagnostic core.

The parser (core/parser.py) is deliberately LENIENT, matching the
reference's fixture semantics: malformed input yields the triples
that can be salvaged and never raises.  At 100 TB that is the right
extraction default (one bad crawl document must not kill a 1000-
executor stage), but a production pipeline also wants to KNOW which
documents were malformed so they can be quarantined, sampled, and
fixed upstream.  This module re-reads the token stream and reports
structural defects without disturbing the lenient parse:

* ``unterminated-statement`` — the stream does not end with ``.``
  (covers a dropped final dot and most truncation);
* ``unclosed-literal`` — a quoted literal token never closes
  (single-line heuristic: an opening quote whose token has no closing
  quote; triple-quoted literals are closed by the tokenizer or fold
  into this same rule at EOF);
* ``unclosed-group`` — ``[``/``(`` depth is still positive at EOF;
* ``undeclared-prefix`` — a prefixed name uses a namespace that no
  ``@prefix``/``PREFIX`` directive (or seed) declared; blank nodes
  (``_:``) are exempt.

Issue codes are returned as a SORTED, DISTINCT list so results are
set-deterministic regardless of how many times a defect repeats.
"""

from __future__ import annotations

from turtle_spark.core.tokenizer import tokenize_all

ISSUE_UNTERMINATED = "unterminated-statement"
ISSUE_UNCLOSED_LITERAL = "unclosed-literal"
ISSUE_UNCLOSED_GROUP = "unclosed-group"
ISSUE_UNDECLARED_PREFIX = "undeclared-prefix"

_OPEN = {"[": "]", "(": ")"}
_CLOSE = {"]", ")"}


def _is_quoted(tok: str) -> bool:
    return tok[:1] in ('"', "'")


def _literal_closed(tok: str) -> bool:
    """Does a quoted token close its own quote?  Handles the optional
    ``@lang`` / ``^^<dt>`` suffix by only requiring a second quote
    character anywhere past the opener; a lone opener or an opener
    with pure body text is unclosed."""
    q = tok[0]
    if tok.startswith(q * 3):
        return len(tok) >= 6 and q * 3 in tok[3:]
    return q in tok[1:]


def lint_document(text: str, seed_prefixes: tuple[str, ...] = ()) -> list[str]:
    issues: set[str] = set()
    toks = tokenize_all(text)
    if not toks:
        return []
    declared = {"_", *seed_prefixes}
    depth = 0
    i = 0
    while i < len(toks):
        tok = toks[i]
        low = tok.lower()
        if low in ("@prefix", "prefix"):
            # the declaration token itself ("x:") declares, not uses
            if i + 1 < len(toks) and toks[i + 1].endswith(":"):
                declared.add(toks[i + 1][:-1])
                i += 2
                continue
        elif low in ("@base", "base"):
            i += 2 if i + 1 < len(toks) else 1
            continue
        if tok in _OPEN:
            depth += 1
        elif tok in _CLOSE:
            depth = max(depth - 1, 0)
        elif _is_quoted(tok):
            if not _literal_closed(tok):
                issues.add(ISSUE_UNCLOSED_LITERAL)
        elif (
            ":" in tok
            and not tok.startswith("<")
            and not _is_quoted(tok)
        ):
            pfx = tok.split(":", 1)[0]
            if pfx not in declared:
                issues.add(ISSUE_UNDECLARED_PREFIX)
        i += 1
    if depth > 0:
        issues.add(ISSUE_UNCLOSED_GROUP)
    if toks[-1] != ".":
        issues.add(ISSUE_UNTERMINATED)
    return sorted(issues)
