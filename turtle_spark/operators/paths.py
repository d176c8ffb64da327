"""SPARQL 1.1 property-path evaluation over the triple table.

The reference is an RDF Turtle parser library (no query layer — see
SURVEY.md §2.2); the natural query surface over the KG this pipeline
materializes is SPARQL, whose path language (§9 of the public SPARQL
1.1 spec) extends basic graph patterns with regular expressions over
predicates.  This module evaluates a path expression to its DISTINCT
``(src, dst)`` pair relation:

* ``P(iri)``        — one forward step: a predicate-filtered scan of
                      the triple table (the constant reaches parquet
                      as a PushedFilter; at 100 TB a predicate slice
                      is a tiny fraction of the table),
* ``Inv(p)``        — ``^p``: column swap, no data movement,
* ``Seq(a, b, …)``  — ``a/b``: equi-join on ``dst = src`` — at scale
                      both sides are slices of the SAME subject-hash
                      bucketed table (sources/storage.py),
* ``Alt(a, b, …)``  — ``a|b``: union + dedup,
* ``OneOrMore(p)``  — ``p+``: path-doubling transitive closure
                      (operators/graph.py::transitive_closure —
                      O(log depth) shuffle barriers, not O(depth)),
* ``ZeroOrMore(p)`` — ``p*``: ``p+`` ∪ the zero-length identity,
* ``ZeroOrOne(p)``  — ``p?``: one step ∪ the identity,
* ``NegatedSet``    — ``!(p|^q|…)``: per-direction predicate
                      DISEQUALITY scans (spec §9.1 split) — no
                      vocabulary enumeration.

Zero-length semantics follow the spec: a zero-length path relates
every term mentioned in the graph (any subject or object) to itself,
so ``rdf:rest*/rdf:first`` — THE canonical collection-membership
path — yields the head cell's own ``first`` as well as the tail
members'.

Set semantics throughout (every combinator dedups): SPARQL requires
distinct pairs for ``+``/``*`` and leaves the rest to the
implementation; uniform set semantics keeps intermediate relations
bounded by |V|² instead of path-count (which is infinite on cycles).

``parse_path`` provides the concrete SPARQL syntax (``^ / | + * ?``
with ``< >``-wrapped IRIs, ``a`` for rdf:type, parentheses) — a
recursive-descent parser in the same spirit as the reference's Turtle
scanner, ~40 lines, fully covered by unit tests.

Closure caveat (same as transitive_closure's): ``+``/``*`` output is
worst-case quadratic in the node count of the predicate slice, so at
web scale you close bounded relation subgraphs (ontology hierarchies,
list spines, social rings), not a dense instance graph.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from turtle_spark.operators.graph import transitive_closure

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@dataclass(frozen=True)
class P:
    """Forward predicate step."""

    iri: str


@dataclass(frozen=True)
class Inv:
    path: "PathExpr"


@dataclass(frozen=True)
class Seq:
    parts: tuple

    def __init__(self, *parts):
        object.__setattr__(self, "parts", tuple(parts))


@dataclass(frozen=True)
class Alt:
    parts: tuple

    def __init__(self, *parts):
        object.__setattr__(self, "parts", tuple(parts))


@dataclass(frozen=True)
class OneOrMore:
    path: "PathExpr"


@dataclass(frozen=True)
class ZeroOrMore:
    path: "PathExpr"


@dataclass(frozen=True)
class ZeroOrOne:
    path: "PathExpr"


@dataclass(frozen=True)
class NegatedSet:
    """``!(p1|…|^q1|…)`` — SPARQL 1.1 §9.1 negated property set.

    Per the spec's algebra translation the set splits by direction:
    a forward step whose predicate is NOT in ``fwd`` (branch present
    only when forward members were written), unioned with an inverse
    step whose predicate is NOT in ``inv`` (ditto).  A single
    predicate-disequality scan per branch — still one pushable filter
    at the storage layer, never an enumeration of the predicate
    vocabulary."""

    fwd: tuple = ()
    inv: tuple = ()


PathExpr = P | Inv | Seq | Alt | OneOrMore | ZeroOrMore | ZeroOrOne | NegatedSet


def graph_terms(triples: DataFrame) -> DataFrame:
    """Every term mentioned in the graph (all subjects + all objects,
    literals included) as one distinct ``term`` column — the identity
    domain of zero-length paths per the SPARQL spec."""
    return (
        triples.select(F.col("subject").alias("term"))
        .union(triples.select(F.col("object").alias("term")))
        .dropDuplicates()
    )


def _identity(triples: DataFrame) -> DataFrame:
    return graph_terms(triples).select(
        F.col("term").alias("src"), F.col("term").alias("dst")
    )


def path_pairs(triples: DataFrame, path: PathExpr) -> DataFrame:
    """Evaluate ``path`` to its distinct (src, dst) pair relation."""
    if isinstance(path, P):
        return (
            triples.where(F.col("predicate") == path.iri)
            .select(F.col("subject").alias("src"), F.col("object").alias("dst"))
            .dropDuplicates()
        )
    if isinstance(path, Inv):
        inner = path_pairs(triples, path.path)
        return inner.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    if isinstance(path, Seq):
        if not path.parts:
            raise ValueError("empty Seq")
        cur = path_pairs(triples, path.parts[0])
        for part in path.parts[1:]:
            nxt = path_pairs(triples, part)
            cur = (
                cur.alias("a")
                .join(nxt.alias("b"), F.col("a.dst") == F.col("b.src"))
                .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
                .dropDuplicates()
            )
        return cur
    if isinstance(path, Alt):
        if not path.parts:
            raise ValueError("empty Alt")
        cur = path_pairs(triples, path.parts[0])
        for part in path.parts[1:]:
            cur = cur.union(path_pairs(triples, part))
        return cur.dropDuplicates()
    if isinstance(path, OneOrMore):
        return transitive_closure(path_pairs(triples, path.path))
    if isinstance(path, ZeroOrMore):
        plus = transitive_closure(path_pairs(triples, path.path))
        return plus.union(_identity(triples)).dropDuplicates()
    if isinstance(path, ZeroOrOne):
        one = path_pairs(triples, path.path)
        return one.union(_identity(triples)).dropDuplicates()
    if isinstance(path, NegatedSet):
        if not path.fwd and not path.inv:
            raise ValueError("empty negated property set")
        parts = []
        if path.fwd:
            parts.append(
                triples.where(~F.col("predicate").isin(*path.fwd)).select(
                    F.col("subject").alias("src"), F.col("object").alias("dst")
                )
            )
        if path.inv:
            parts.append(
                triples.where(~F.col("predicate").isin(*path.inv)).select(
                    F.col("object").alias("src"), F.col("subject").alias("dst")
                )
            )
        cur = parts[0]
        for p in parts[1:]:
            cur = cur.union(p)
        return cur.dropDuplicates()
    raise TypeError(f"not a path expression: {path!r}")


# ---------------------------------------------------------------------------
# concrete syntax:  path := alt ;  alt := seq ('|' seq)* ;
# seq := unary ('/' unary)* ;  unary := '^' unary | primary ('+'|'*'|'?')* ;
# primary := '<iri>' | 'a' | '(' path ')'
# ---------------------------------------------------------------------------


def _tokenize(s: str) -> list[str]:
    toks: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c.isspace():
            i += 1
        elif c == "<":
            j = s.index(">", i)
            toks.append(s[i : j + 1])
            i = j + 1
        elif c in "^/|+*?()!":
            toks.append(c)
            i += 1
        elif c == "a" and (i + 1 == len(s) or not s[i + 1].isalnum()):
            toks.append("a")
            i += 1
        else:
            raise ValueError(f"bad path syntax at {i}: {s[i:]!r}")
    return toks


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def alt(self) -> PathExpr:
        parts = [self.seq()]
        while self.peek() == "|":
            self.take()
            parts.append(self.seq())
        return parts[0] if len(parts) == 1 else Alt(*parts)

    def seq(self) -> PathExpr:
        parts = [self.unary()]
        while self.peek() == "/":
            self.take()
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else Seq(*parts)

    def unary(self) -> PathExpr:
        if self.peek() == "^":
            self.take()
            return Inv(self.unary())
        expr = self.primary()
        while self.peek() in ("+", "*", "?"):
            mod = self.take()
            expr = {"+": OneOrMore, "*": ZeroOrMore, "?": ZeroOrOne}[mod](expr)
        return expr

    def primary(self) -> PathExpr:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of path")
        if tok == "(":
            self.take()
            expr = self.alt()
            if self.peek() != ")":
                raise ValueError("missing ')'")
            self.take()
            return expr
        if tok == "a":
            self.take()
            return P(RDF_TYPE)
        if tok.startswith("<"):
            return P(self.take()[1:-1])
        if tok == "!":
            self.take()
            members = []
            if self.peek() == "(":
                self.take()
                members.append(self._nps_member())
                while self.peek() == "|":
                    self.take()
                    members.append(self._nps_member())
                if self.peek() != ")":
                    raise ValueError("missing ')' in negated property set")
                self.take()
            else:
                members.append(self._nps_member())
            return NegatedSet(
                fwd=tuple(iri for d, iri in members if d == "fwd"),
                inv=tuple(iri for d, iri in members if d == "inv"),
            )
        raise ValueError(f"unexpected token {tok!r}")

    def _nps_member(self) -> tuple[str, str]:
        direction = "fwd"
        if self.peek() == "^":
            self.take()
            direction = "inv"
        tok = self.peek()
        if tok == "a":
            self.take()
            return direction, RDF_TYPE
        if tok is not None and tok.startswith("<"):
            return direction, self.take()[1:-1]
        raise ValueError(
            f"negated property set member must be an IRI or 'a', got {tok!r}"
        )


def parse_path(s: str) -> PathExpr:
    """Parse SPARQL property-path syntax into an expression tree."""
    parser = _Parser(_tokenize(s))
    expr = parser.alt()
    if parser.peek() is not None:
        raise ValueError(f"trailing tokens: {parser.toks[parser.i:]!r}")
    return expr


def path_query(triples: DataFrame, path: str | PathExpr) -> DataFrame:
    """Evaluate a path given either as SPARQL syntax or an expression
    tree; the one-call public surface."""
    expr = parse_path(path) if isinstance(path, str) else path
    return path_pairs(triples, expr)
