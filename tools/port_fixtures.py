"""Extract the reference's golden test fixtures into JSON.

Reads ``/root/reference/scanner/scanner_test.go`` (the 42-case table at
lines 11-1417: Turtle source, expected token sequence, expected ordered
triples) and writes ``tests/fixtures/scan_fixtures.json``.  Test *data*
only — no reference code is ported by this script.

Run once: ``python tools/port_fixtures.py``.
"""

from __future__ import annotations

import json
import pathlib

SRC = pathlib.Path("/root/reference/scanner/scanner_test.go")
DST = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "scan_fixtures.json"

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\", "0": "\0"}


class GoLexer:
    """Just enough Go lexing to walk a composite-literal test table."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def skip_ws(self) -> None:
        t, n = self.text, len(self.text)
        while self.pos < n:
            ch = t[self.pos]
            if ch in " \t\r\n":
                self.pos += 1
            elif t.startswith("//", self.pos):
                nl = t.find("\n", self.pos)
                self.pos = n if nl == -1 else nl + 1
            elif t.startswith("/*", self.pos):
                end = t.find("*/", self.pos + 2)
                self.pos = n if end == -1 else end + 2
            else:
                return

    def peek(self) -> str:
        self.skip_ws()
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def expect(self, s: str) -> None:
        self.skip_ws()
        if not self.text.startswith(s, self.pos):
            ctx = self.text[self.pos : self.pos + 60]
            raise SyntaxError(f"expected {s!r} at {self.pos}: {ctx!r}")
        self.pos += len(s)

    def try_consume(self, s: str) -> bool:
        self.skip_ws()
        if self.text.startswith(s, self.pos):
            self.pos += len(s)
            return True
        return False

    def string(self) -> str:
        self.skip_ws()
        t = self.text
        ch = t[self.pos]
        if ch == "`":  # raw string: no escapes
            end = t.find("`", self.pos + 1)
            s = t[self.pos + 1 : end]
            self.pos = end + 1
            return s
        if ch == '"':  # interpreted string
            out = []
            i = self.pos + 1
            while t[i] != '"':
                if t[i] == "\\":
                    nxt = t[i + 1]
                    if nxt == "u":
                        out.append(chr(int(t[i + 2 : i + 6], 16)))
                        i += 6
                        continue
                    out.append(_ESCAPES.get(nxt, nxt))
                    i += 2
                    continue
                out.append(t[i])
                i += 1
            self.pos = i + 1
            return "".join(out)
        raise SyntaxError(f"not a string at {self.pos}: {t[self.pos:self.pos+40]!r}")

    def ident(self) -> str:
        self.skip_ws()
        start = self.pos
        while self.pos < len(self.text) and (
            self.text[self.pos].isalnum() or self.text[self.pos] == "_"
        ):
            self.pos += 1
        return self.text[start : self.pos]


def parse_cases(text: str) -> dict[str, dict]:
    anchor = "var scanTestCases = map[string]struct {"
    lex = GoLexer(text)
    lex.pos = text.index(anchor) + len(anchor)
    # skip the struct field declarations up to the closing "}{"
    lex.pos = text.index("}{", lex.pos) + 2

    cases: dict[str, dict] = {}
    while True:
        if lex.try_consume("}"):  # end of map literal
            break
        name = lex.string()
        lex.expect(":")
        lex.expect("{")
        case: dict = {"turtle": None, "tokens": [], "triples": []}
        while not lex.try_consume("}"):
            field = lex.ident()
            lex.expect(":")
            if field == "data":
                lex.expect("[]byte(")
                case["turtle"] = lex.string()
                lex.expect(")")
            elif field == "expectedTokens":
                lex.expect("[]string{")
                while not lex.try_consume("}"):
                    case["tokens"].append(lex.string())
                    lex.try_consume(",")
            elif field == "expectedTriples":
                lex.expect("[][3]string{")
                while not lex.try_consume("}"):
                    lex.expect("{")
                    triple = []
                    while not lex.try_consume("}"):
                        triple.append(lex.string())
                        lex.try_consume(",")
                    lex.try_consume(",")
                    case["triples"].append(triple)
            else:
                raise SyntaxError(f"unknown field {field!r}")
            lex.try_consume(",")
        lex.try_consume(",")
        cases[name] = case
    return cases


def main() -> None:
    cases = parse_cases(SRC.read_text())
    assert all(c["turtle"] is not None for c in cases.values())
    DST.parent.mkdir(parents=True, exist_ok=True)
    DST.write_text(json.dumps(cases, indent=1, ensure_ascii=False))
    n_triples = sum(len(c["triples"]) for c in cases.values())
    print(f"wrote {len(cases)} cases / {n_triples} golden triples -> {DST}")


if __name__ == "__main__":
    main()
