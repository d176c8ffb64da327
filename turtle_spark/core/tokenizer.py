"""Turtle 1.1 tokenizer.

Produces the same token stream as the reference scanner's split
function (nvkp/turtle ``scanner/scan-turtle.go:9-143``): whitespace and
``#``-comment skipping between tokens, quote / triple-quote literal
state with backslash-escape awareness, ``<...>`` IRI state, standalone
punctuation tokens (``; , . [ ] ( )``), dots kept inside prefixed names
(``brick:PM2.5_Sensor``) and numeric literals with exponents / signs /
``^^``-datatype suffixes kept as single tokens (``-2.3E-12``,
``1.0E0^^xsd::float``).

This is a from-scratch Python implementation driven by the reference's
*observable* token sequences (its ``expectedTokens`` test fixtures), not
a transliteration of the Go code.  It is pure Python on purpose: at
scale it runs *inside* Arrow-batched ``mapInPandas`` workers (one Python
call per multi-thousand-row batch), so the per-document cost is the
only thing that matters and no Spark/JVM types leak in here.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from itertools import chain

KEY_CHARS = frozenset(";,.[]()")
NUMBER_CHARS = frozenset("Ee-+")

# Fast path: a run of "state-neutral" characters — no whitespace, no
# punctuation/quote/IRI/escape characters — cannot change any scanner
# state (the only per-char effects are the rolling 3-char window and
# the first-char prefixed-name flag, both reconstructed after the
# jump), so the inner loop skips over it in one regex match.
_UNSAFE_CHARS = "\"'<>;,.[]()\\"
_SAFE_RUN = re.compile(r"""[^\s"'<>;,.\[\]()\\]+""")
_WS = re.compile(r"\s+")


def next_token(data: str, start: int) -> tuple[int, str | None]:
    """Scan one token beginning at ``start``.

    Returns ``(next_position, token)``; token is ``None`` at end of
    input.  Mirrors the reference split function's state machine
    (``scanner/scan-turtle.go``): the rolling 3-char buffer detects
    triple-quote edges, escapes are detected by a preceding backslash,
    and the IRI / literal / prefixed-name states suppress punctuation
    splitting.
    """
    n = len(data)

    # Skip leading whitespace; '#' opens a comment that runs to newline
    # and counts as whitespace (scanner/scan-turtle.go:12-32).
    while start < n:
        m = _WS.match(data, start)
        if m:
            start = m.end()
        if start < n and data[start] == "#":
            nl = data.find("\n", start + 1)
            start = n if nl == -1 else nl + 1
            continue
        break

    literal = False
    apostrophe = False
    quotation = False
    iri = False
    prefixed = False
    in_multiline = False
    # rolling 3-char window tracked as two lookback chars; `seen` is
    # the number of chars consumed so far in this token scan
    p1 = p2 = ""
    seen = 0

    i = start
    while i < n:
        ch = data[i]

        # Fast path: jump over a run of state-neutral chars in one
        # regex match — bit-identical outcome to per-char processing,
        # because such chars trigger none of the transitions below.
        if ch not in _UNSAFE_CHARS and not ch.isspace():
            end = _SAFE_RUN.match(data, i).end()
            if seen == 0 and not literal and not ch.isdigit():
                prefixed = True
            run_len = end - i
            seen += run_len
            if run_len >= 2:
                p2, p1 = data[end - 2], data[end - 1]
            else:
                p2, p1 = p1, ch
            i = end
            continue

        ml_edge = seen >= 2 and p1 == p2 == ch and (ch == '"' or ch == "'")
        escaped = seen >= 1 and p1 == "\\"

        # A third consecutive quote char flips multiline-literal state.
        if ml_edge:
            in_multiline = not in_multiline
            literal = not literal

        # Whitespace outside a literal terminates the token.
        if ch.isspace() and not literal:
            return i + 1, data[start:i]

        # Inside a prefixed name, punctuation followed by a digit stays
        # in the token (PM2.5); otherwise the name state ends here.
        if ch in KEY_CHARS and not iri and not literal and prefixed:
            nxt = data[i + 1] if i + 1 < n else ""
            if not nxt.isdigit():
                prefixed = False

        # Decimal dot of a number: greedily consume digits, exponent
        # characters and an optional ^^datatype suffix as one token.
        if ch == "." and not iri and not literal and not prefixed:
            nxt = data[i + 1] if i + 1 < n else ""
            if nxt.isdigit():
                j = i + 2
                has_datatype = False
                while j < n:
                    nr = data[j]
                    if nr == "^":
                        has_datatype = True
                    if not has_datatype and not nr.isdigit() and nr not in NUMBER_CHARS:
                        break
                    if has_datatype and (nr in KEY_CHARS or nr.isspace()):
                        break
                    j += 1
                return j, data[start:j]

        # Standalone punctuation: emitted as its own token, or ends the
        # current token without consuming the punctuation char.
        if ch in KEY_CHARS and not iri and not literal and not prefixed:
            if i == 0 or start == i:
                return i + 1, data[start : i + 1]
            return i, data[start:i]

        if ch == '"' and not apostrophe and not in_multiline and not ml_edge and not escaped:
            literal = not literal
            quotation = not quotation

        if ch == "'" and not quotation and not in_multiline and not ml_edge and not escaped:
            literal = not literal
            apostrophe = not apostrophe

        # First char of the token, non-digit, outside a literal: this
        # may be a prefixed name (or '<', which the IRI state overrides).
        if seen == 0 and not literal and not ch.isdigit():
            prefixed = True

        if (ch == "<" or ch == ">") and not literal:
            iri = not iri

        p2, p1 = p1, ch
        seen += 1
        i += 1

    if start < n:
        return n, data[start:]
    return start, None


def tokenize(data: str) -> Iterator[str]:
    """Yield all tokens of a Turtle document in order."""
    pos = 0
    while True:
        pos, tok = next_token(data, pos)
        if tok is None:
            return
        yield tok


# ---------------------------------------------------------------------------
# Document-level fast path
# ---------------------------------------------------------------------------
# One compiled regex consumes the document token-by-token in a single
# C-level ``findall`` sweep; a total-coverage check detects any
# character the master pattern cannot explain, and the whole document
# then falls back to the exact per-char machine above — so the fast
# path can only ever be faster, never different.  Atomic groups
# (Python 3.11+) keep the unit loop backtrack-free.
#
# Token shapes mirror next_token's observable behavior:
# * digit-led tokens end hard after a decimal tail ``.1e2^^dt`` (the
#   reference's number branch, scanner/scan-turtle.go numeric rules) or
#   require a clean delimiter;
# * non-digit tokens are unit sequences — safe runs, <iri>s, quoted
#   literals, and dots followed by a digit (``brick:PM2.5_Sensor``);
# * ``.`` not followed by a digit is the statement terminator.

_SAFE_CLS = r"""[^\s"'<>;,.\[\]()\\]"""
_NUM_TAIL = r"""\.[0-9][0-9Ee+\-]*(?:\^[^\s;,.\[\]()]*)?"""
_DELIM = r"""(?=[\s;,.\[\]()]|$)"""
_IRI_UNIT = r"""<[^<>\s"'\\]*>|<[^<>\s"'\\]*(?=\s|$)"""
# Quoted-literal units.  Faithful to the machine's stateful rules:
# * a quote closes iff NOT immediately preceded by a backslash (single
#   char lookback — so \\" does NOT close, unlike standard escaping);
# * newlines are legal inside literals;
# * any THREE consecutive same-quote chars flip multiline state — even
#   escaped ones, even counting a previous literal's closing quote —
#   so each unit (a) refuses to start right after a same-quote char,
#   (b) refuses triple-runs of the OTHER quote inside its body, and
#   (c) multiline close refuses a 4th quote; every refused position
#   makes the master match fail => exact-machine fallback, never a
#   silent divergence.
_QL = r"""(?<!")"(?>(?:[^"']+|(?<=\\)"|'(?!''))*)(?<!\\)\""""
_SQ = r"""(?<!')'(?>(?:[^'"]+|(?<=\\)'|"(?!""))*)(?<!\\)'"""
_MLQ = r'''(?<!")"""(?!")(?>(?:[^"']+|"(?!"")|'(?!''))*)"""(?!")'''
_MLSQ = r"""(?<!')'''(?!')(?>(?:[^'"]+|'(?!'')|"(?!""))*)'''(?!')"""
_QUOTE_UNIT = rf"""{_MLQ}|{_MLSQ}|{_QL}|{_SQ}"""
# a backslash outside a literal is a plain char whose only effect is
# making a following quote plain too — consume the pair
_ESC_UNIT = r"""\\["']|\\"""

# "prefixed" tokens (first char a safe char or '<') keep ANY
# punctuation that is immediately followed by a digit (the reference's
# prefixed-name rule, e.g. brick:PM2.5_Sensor); quote-led tokens do
# not — for them only a decimal tail ".5[e..][^dt]" continues, and it
# hard-ends the token (the reference's number branch).
_MASTER = re.compile(
    rf"""
    (?P<skip>\s+|\#[^\n]*)
  | (?P<tok>
        [;,\[\]()]
      | \.(?![0-9])
      | [0-9]{_SAFE_CLS}*{_NUM_TAIL}
      | [0-9]{_SAFE_CLS}*{_DELIM}
      | {_NUM_TAIL}
      | (?![0-9])
        (?>(?:{_SAFE_CLS}+|{_IRI_UNIT}|{_ESC_UNIT})
           (?:{_SAFE_CLS}+|{_IRI_UNIT}|{_QUOTE_UNIT}|{_ESC_UNIT}|[.;,\[\]()](?=[0-9]))*)
        {_DELIM}
      | (?>(?:{_QUOTE_UNIT})
           (?:{_SAFE_CLS}+|{_IRI_UNIT}|{_QUOTE_UNIT}|{_ESC_UNIT})*)
        (?:{_NUM_TAIL}|{_DELIM})
    )
    """,
    re.X,
)


def tokenize_all(data: str) -> list[str]:
    """All tokens of a document as a list (fast path when possible).

    One C-level ``findall`` sweep; if the matches don't cover every
    character (stray bracket, unterminated literal, quad-quote run,
    ...), the whole document falls back to the exact per-char machine —
    the fast path can only be faster, never different.
    """
    parts = _MASTER.findall(data)
    covered = sum(map(len, chain.from_iterable(parts)))
    if covered != len(data):
        return list(tokenize(data))
    return [b for _, b in parts if b]
