"""SPARQL 1.1 SELECT algebra over the triple table.

Extends the conjunctive BGP compiler (``operators/bgp.py``) with the
rest of the SPARQL SELECT core: OPTIONAL (left join), MINUS and
FILTER (NOT) EXISTS (anti/semi joins), FILTER (a safe expression
subset compiled to JVM-side Column expressions), UNION,
VALUES (inline bindings), DISTINCT, GROUP BY aggregates, subselects,
and the ORDER BY / LIMIT / OFFSET solution modifiers — the
query surface a consumer of the materialized KG actually writes.  The
reference implements no query layer (it is a parser library,
`/root/reference/scanner/scanner.go`); this is the Spark-native query
model over the triples it taught us to emit (SURVEY.md §2.2).

Scale notes (the whole point of each choice):

* OPTIONAL compiles to a **left outer equi-join** on the shared
  variables — never a theta-join; at 100 TB both sides are plain
  hash-join relocations on string keys, and an optional group whose
  patterns carry >= 2 constants is broadcast (bounded KG slice), so
  the required side never shuffles for it.
* FILTER compiles to Column predicates evaluated **inside whole-stage
  codegen**; where a filter references only variables of one pattern
  it lands before the first join and reaches the parquet scan as a
  pushed filter (Catalyst does this for free once the predicate is
  declarative — no Python in the filter path, ever).
* MINUS and FILTER (NOT) EXISTS compile to **left anti / semi
  joins** on the shared variables — Spark's two join modes that
  never materialize right-side columns.  The right side is projected
  to the key tuple and deduped first, so a selective negation group
  arrives at the join as a short distinct-key list AQE can broadcast.
* VALUES becomes a literal DataFrame joined with an explicit
  ``broadcast()`` — inline bindings are by construction tiny.
* UNION is ``unionByName(allowMissingColumns=True)`` — SPARQL UNION
  branches may bind different variable sets; absent vars are NULL
  (unbound), exactly the spec's semantics, and the union is a no-
  shuffle narrow op.
* Aggregates are one hash aggregation (map-side partial + one
  shuffle); ``count_distinct`` is the only expand.

Expression grammar (recursive descent, deliberately small and exact;
shared by FILTER, HAVING, and BIND)::

    expr   := or
    or     := and ("||" and)*
    and    := not ("&&" not)*
    not    := "!" not | cmp
    cmp    := add (("="|"!="|"<"|"<="|">"|">=") add)?
    add    := mul (("+"|"-") mul)*
    mul    := unary (("*"|"/") unary)*
    unary  := "-" unary | operand
    operand:= "?var" | "'str'" | '"str"' | number | "(" expr ")"
             | fn "(" args ")"

with fn one of BOUND STRLEN STRSTARTS STRENDS CONTAINS REGEX
CONCAT SUBSTR UCASE LCASE STR REPLACE IF COALESCE ABS FLOOR CEIL
STRBEFORE STRAFTER.  Logical operators require boolean operands
(no effective-boolean-value coercion: in a static query a non-
boolean condition is always a bug).  Arithmetic casts both sides
to DOUBLE — SPARQL's numeric promotion over the stored lexical
forms — and every function compiles to a built-in Column
expression, so the whole grammar stays inside whole-stage codegen.

Comparisons are string-typed unless either side is numeric (a
number literal, arithmetic, STRLEN/ABS/FLOOR/CEIL) — then both
sides cast to DOUBLE (SPARQL's numeric comparison on xsd-numeric
terms; the KG stores lexical forms, so the cast-to-double reading
is the documented engine semantics and the goldens replicate it
independently).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from turtle_spark.operators.bgp import bgp_select

__all__ = [
    "compile_expr",
    "compile_filter",
    "sparql_ask",
    "sparql_construct",
    "sparql_describe",
    "sparql_select",
    "sparql_union",
]


# --------------------------------------------------------------------------
# FILTER expression compiler
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(
        \?[A-Za-z_][A-Za-z0-9_]* |          # variable
        "(?:[^"\\]|\\.)*" | '(?:[^'\\]|\\.)*' |  # string literal
        \d+(?:\.\d+)? |                     # number (unary minus in parser)
        != | <= | >= | && | \|\| |          # two-char operators
        [=<>!(),+\-*/] |                    # single-char
        [A-Za-z][A-Za-z]*                   # function name
    )""",
    re.VERBOSE,
)

# single-?var predicates/accessors (legacy FILTER builtins)
_FUNCS = {"BOUND", "STRLEN", "STRSTARTS", "STRENDS", "CONTAINS", "REGEX"}
# general expression functions (args are full expressions)
_EXPR_FUNCS = {
    "CONCAT", "SUBSTR", "UCASE", "LCASE", "STR", "REPLACE", "IF",
    "COALESCE", "ABS", "FLOOR", "CEIL", "STRBEFORE", "STRAFTER",
}


def _tokenize_filter(s: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"bad FILTER syntax at {s[pos:pos + 20]!r}")
        toks.append(m.group(1))
        pos = m.end()
    return toks


class _Operand:
    """A compiled operand: its Column and whether it is numeric-typed.

    ``lit_str`` carries the decoded text when the operand is a string
    literal — functions whose argument must be static (regex patterns,
    separators) read it at compile time.
    """

    def __init__(
        self,
        col: Column,
        numeric: bool,
        boolean: bool = False,
        lit_str: str | None = None,
    ):
        self.col, self.numeric, self.boolean = col, numeric, boolean
        self.lit_str = lit_str


class _FilterParser:
    def __init__(self, toks: list[str], bound: set[str]):
        self.toks, self.i, self.bound = toks, 0, bound

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, want: str | None = None) -> str:
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of FILTER expression")
        t = self.toks[self.i]
        if want is not None and t != want:
            raise ValueError(f"expected {want!r}, got {t!r}")
        self.i += 1
        return t

    @staticmethod
    def _require_bool(o: "_Operand", ctx: str) -> Column:
        if not o.boolean:
            raise ValueError(f"{ctx} requires a boolean operand")
        return o.col

    # expr := or
    def expr(self) -> _Operand:
        return self.or_()

    def or_(self) -> _Operand:
        o = self.and_()
        while self.peek() == "||":
            self.take()
            r = self.and_()
            o = _Operand(
                self._require_bool(o, "||") | self._require_bool(r, "||"),
                numeric=False, boolean=True,
            )
        return o

    def and_(self) -> _Operand:
        o = self.not_()
        while self.peek() == "&&":
            self.take()
            r = self.not_()
            o = _Operand(
                self._require_bool(o, "&&") & self._require_bool(r, "&&"),
                numeric=False, boolean=True,
            )
        return o

    def not_(self) -> _Operand:
        if self.peek() == "!":
            self.take()
            inner = self.not_()
            return _Operand(
                ~self._require_bool(inner, "!"), numeric=False, boolean=True
            )
        return self.cmp()

    def cmp(self) -> _Operand:
        left = self.add()
        op = self.peek()
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            return left
        self.take()
        right = self.add()
        lc, rc = left.col, right.col
        if left.numeric or right.numeric:
            lc, rc = lc.cast("double"), rc.cast("double")
        return _Operand({
            "=": lc == rc, "!=": lc != rc, "<": lc < rc,
            "<=": lc <= rc, ">": lc > rc, ">=": lc >= rc,
        }[op], numeric=False, boolean=True)

    def add(self) -> _Operand:
        o = self.mul()
        while self.peek() in ("+", "-"):
            op = self.take()
            r = self.mul()
            lc, rc = o.col.cast("double"), r.col.cast("double")
            o = _Operand(lc + rc if op == "+" else lc - rc, numeric=True)
        return o

    def mul(self) -> _Operand:
        o = self.unary()
        while self.peek() in ("*", "/"):
            op = self.take()
            r = self.unary()
            lc, rc = o.col.cast("double"), r.col.cast("double")
            o = _Operand(lc * rc if op == "*" else lc / rc, numeric=True)
        return o

    def unary(self) -> _Operand:
        if self.peek() == "-":
            self.take()
            inner = self.unary()
            return _Operand(-inner.col.cast("double"), numeric=True)
        return self.operand()

    def operand(self) -> _Operand:
        t = self.peek()
        if t == "(":
            self.take()
            o = self.expr()
            self.take(")")
            return o
        if t is None:
            raise ValueError("unexpected end of FILTER expression")
        if t.startswith("?"):
            self.take()
            return _Operand(self._var(t), numeric=False)
        if t[0] in "\"'":
            self.take()
            body = t[1:-1].replace("\\" + t[0], t[0]).replace("\\\\", "\\")
            return _Operand(F.lit(body), numeric=False, lit_str=body)
        if re.fullmatch(r"\d+(?:\.\d+)?", t):
            self.take()
            return _Operand(F.lit(float(t)), numeric=True)
        if t in _FUNCS:
            return self._call(self.take())
        if t in _EXPR_FUNCS:
            return self._expr_call(self.take())
        raise ValueError(f"unexpected token {t!r} in FILTER")

    def _var(self, t: str) -> Column:
        name = t[1:]
        if name not in self.bound:
            raise ValueError(f"FILTER references unbound variable ?{name}")
        return F.col(name)

    def _call(self, fn: str) -> _Operand:
        self.take("(")
        var = self._var(self.take())
        if fn == "BOUND":
            self.take(")")
            return _Operand(var.isNotNull(), numeric=False, boolean=True)
        if fn == "STRLEN":
            self.take(")")
            return _Operand(F.length(var), numeric=True)
        self.take(",")
        arg = self.take()
        if arg[0] not in "\"'":
            raise ValueError(f"{fn} needs a string literal argument")
        body = arg[1:-1].replace("\\" + arg[0], arg[0]).replace("\\\\", "\\")
        self.take(")")
        if fn == "STRSTARTS":
            return _Operand(var.startswith(body), numeric=False, boolean=True)
        if fn == "STRENDS":
            return _Operand(var.endswith(body), numeric=False, boolean=True)
        if fn == "CONTAINS":
            return _Operand(var.contains(body), numeric=False, boolean=True)
        # REGEX: pattern restricted to the Java-regex ∩ RE2 ∩ Python
        # dialect (same restriction as curation.py's PII patterns) so
        # DuckDB/golden mirrors are exact
        return _Operand(var.rlike(body), numeric=False, boolean=True)

    def _expr_args(self, minimum: int, maximum: int) -> list[_Operand]:
        self.take("(")
        args = [self.expr()]
        while self.peek() == ",":
            self.take()
            args.append(self.expr())
        self.take(")")
        if not (minimum <= len(args) <= maximum):
            raise ValueError(
                f"expected {minimum}..{maximum} arguments, got {len(args)}"
            )
        return args

    @staticmethod
    def _str_lit(o: _Operand, fn: str) -> str:
        # compile-time string literal (REPLACE/STRBEFORE/STRAFTER
        # separators must be static so the empty-separator spec cases
        # resolve at plan time, not per row)
        if o.lit_str is None:
            raise ValueError(f"{fn} needs a string literal argument")
        return o.lit_str

    def _expr_call(self, fn: str) -> _Operand:
        if fn == "CONCAT":
            args = self._expr_args(1, 16)
            return _Operand(
                F.concat(*(a.col.cast("string") for a in args)), numeric=False
            )
        if fn == "SUBSTR":
            # SPARQL 1-based start; 2-arg form = through end of string
            args = self._expr_args(2, 3)
            src, start = args[0].col, args[1].col.cast("int")
            length = (
                args[2].col.cast("int")
                if len(args) == 3
                else F.length(src) - start + F.lit(1)
            )
            return _Operand(src.substr(start, length), numeric=False)
        if fn in ("UCASE", "LCASE", "STR", "ABS", "FLOOR", "CEIL"):
            (a,) = self._expr_args(1, 1)
            if fn == "UCASE":
                return _Operand(F.upper(a.col), numeric=False)
            if fn == "LCASE":
                return _Operand(F.lower(a.col), numeric=False)
            if fn == "STR":
                return _Operand(a.col.cast("string"), numeric=False)
            if fn == "ABS":
                return _Operand(F.abs(a.col.cast("double")), numeric=True)
            if fn == "FLOOR":
                return _Operand(
                    F.floor(a.col.cast("double")).cast("double"), numeric=True
                )
            return _Operand(
                F.ceil(a.col.cast("double")).cast("double"), numeric=True
            )
        if fn == "REPLACE":
            args = self._expr_args(3, 3)
            pat = self._str_lit(args[1], fn)
            rep = self._str_lit(args[2], fn)
            # same Java∩RE2∩Python dialect restriction as REGEX
            return _Operand(
                F.regexp_replace(args[0].col, pat, rep), numeric=False
            )
        if fn == "IF":
            args = self._expr_args(3, 3)
            cond = self._require_bool(args[0], "IF condition")
            t, e = args[1], args[2]
            return _Operand(
                F.when(cond, t.col).otherwise(e.col),
                numeric=t.numeric and e.numeric,
                boolean=t.boolean and e.boolean,
            )
        if fn == "COALESCE":
            args = self._expr_args(1, 16)
            return _Operand(
                F.coalesce(*(a.col for a in args)),
                numeric=all(a.numeric for a in args),
                boolean=all(a.boolean for a in args),
            )
        if fn in ("STRBEFORE", "STRAFTER"):
            args = self._expr_args(2, 2)
            src = args[0].col
            sep = self._str_lit(args[1], fn)
            if sep == "":
                # spec: STRBEFORE(s,"") = "", STRAFTER(s,"") = s
                out = F.lit("") if fn == "STRBEFORE" else src
                return _Operand(out, numeric=False)
            pos = F.locate(sep, src)  # 1-based, 0 = absent
            if fn == "STRBEFORE":
                out = F.when(pos > 0, src.substr(F.lit(1), pos - 1))
            else:
                out = F.when(
                    pos > 0, src.substr(pos + len(sep), F.length(src))
                )
            return _Operand(out.otherwise(F.lit("")), numeric=False)
        raise AssertionError(f"unhandled expression function {fn}")


def compile_filter(expr: str, bound: set[str]) -> Column:
    """Compile one FILTER expression to a Column predicate.

    ``bound`` is the set of variable names in scope; referencing an
    unbound variable is an error (SPARQL would give type-error =>
    false, but in a static query that is always a query bug).
    """
    p = _FilterParser(_tokenize_filter(expr), bound)
    o = p.expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens in FILTER: {p.toks[p.i:]}")
    if not o.boolean:
        raise ValueError("non-boolean FILTER expression")
    return o.col


def compile_expr(expr: str, bound: set[str]) -> Column:
    """Compile one value expression (BIND right-hand side) to a Column.

    Same grammar as :func:`compile_filter` but the result may be any
    type — string, numeric (DOUBLE), or boolean.  Everything compiles
    to built-in Column expressions, so a BIND never leaves whole-stage
    codegen and never touches Python at run time.
    """
    p = _FilterParser(_tokenize_filter(expr), bound)
    o = p.expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens in expression: {p.toks[p.i:]}")
    return o.col


# --------------------------------------------------------------------------
# SELECT algebra
# --------------------------------------------------------------------------

def _group_vars(patterns: list[tuple]) -> set[str]:
    vs: set[str] = set()
    for pat in patterns:
        for term in pat[:3]:
            if isinstance(term, str) and term.startswith("?"):
                vs.add(term[1:])
    return vs


def sparql_select(
    triples: DataFrame,
    patterns: list[tuple],
    optionals: list[list[tuple]] | None = None,
    minus: list[list[tuple]] | None = None,
    exists: list[list[tuple]] | None = None,
    not_exists: list[list[tuple]] | None = None,
    filters: list[str] | None = None,
    bind: dict[str, str] | None = None,
    values: dict[str, list[str]] | None = None,
    group_by: list[str] | None = None,
    aggregates: dict[str, tuple] | None = None,
    having: list[str] | None = None,
    distinct: bool = False,
    project: list[str] | None = None,
    subqueries: list[DataFrame] | None = None,
    order_by: list[str] | None = None,
    limit: int | None = None,
    offset: int | None = None,
    graph: str | None = None,
) -> DataFrame:
    """Evaluate a SPARQL SELECT over the triple table.

    ``patterns``: the required BGP (see ``bgp_select``).
    ``optionals``: each entry is a pattern group left-joined on the
    variables it shares with the required part (which must be
    non-empty — a disconnected OPTIONAL would be a cartesian).
    ``minus``: SPARQL 1.1 MINUS groups — solutions compatible with
    any right-side solution on the shared variables are removed.
    Compiles to a **left anti join**: the right side never
    materializes into the result, kept rows keep their bag
    multiplicity, and a NULL (unbound) shared variable never matches
    — exactly the spec's "disjoint domains are compatible-but-
    ignored" rule.  A group sharing NO variable removes nothing per
    the spec, so it is skipped outright (no cartesian).
    ``exists`` / ``not_exists``: FILTER (NOT) EXISTS groups —
    compile to **left semi / left anti joins** on the shared
    variables (required non-empty; a variable-free EXISTS is a
    constant the caller should fold with ``sparql_ask``).  Semi join
    keeps each left row at most once regardless of right-side match
    count: the filter reading of EXISTS, not a join.  Shared
    variables should come from the required BGP (not an OPTIONAL):
    a NULL never equi-matches, which for an unbound var diverges
    from the spec's substitution semantics.
    ``filters``: FILTER expressions over all bound variables (applied
    after optionals, so BOUND() can see unmatched rows).
    ``bind``: SPARQL 1.1 BIND — ``{new_var: expression}`` in insertion
    order, each expression over everything bound so far (including
    earlier binds).  Compiles to ``withColumn`` with a pure Column
    expression: a narrow, shuffle-free projection inside whole-stage
    codegen — at 100 TB a BIND costs exactly one vectorized pass over
    already-resident rows.  Binds are applied BEFORE ``filters`` so a
    FILTER can reference a derived variable (the spec's evaluation
    order within a group graph pattern); rebinding an existing
    variable is refused, as in the spec.
    ``values``: VALUES inline binding — ``{var: [allowed, ...]}``,
    inner-joined (broadcast) with the solution.
    ``aggregates``: ``{out_col: (fn, var)}`` with fn in
    ``count | count_distinct | min | max | sum | avg | sample |
    group_concat``; ``var=None`` = COUNT(*).  Numeric aggregates
    (SUM/AVG) cast the lexical form to DECIMAL(38,10) so partial
    aggregation is EXACT and the result is bit-identical at any
    partitioning — a float sum would drift with shuffle order; a
    non-numeric lexical form casts to NULL (unbound — SPARQL's
    type-error-drops-the-value reading), and AVG divides the exact
    decimal sum by the count of values that cast, once, in DOUBLE.  SAMPLE is spec-implementation-defined; this engine picks
    MIN so the choice is deterministic across cluster sizes.
    GROUP_CONCAT accepts a 3-tuple ``(fn, var, separator)`` (default
    separator a single space) and SORTS the collected values before
    joining — the spec leaves order undefined, and an undefined order
    is exactly what breaks at 100 TB where row order is a function of
    partition count; sorted order is the documented engine semantics
    (matches ``STRING_AGG(... ORDER BY ...)`` oracles).
    ``having``: FILTER expressions over the aggregate output columns
    (same grammar as ``filters``, e.g. ``"?n_rows > 2"``), applied
    after the hash aggregation — requires ``aggregates``.
    ``graph``: SPARQL GRAPH scope over a quad table (a ``graph``
    column).  A constant IRI prunes every scan to one named graph; a
    ``"?g"`` variable binds per solution and scopes the required BGP
    AND every OPTIONAL/MINUS/EXISTS group to the SAME graph (the
    variable is an ordinary equi-join key, so the spec semantics cost
    nothing extra at scale).  ``None`` = the merged union of all
    graphs (this engine's default-graph reading).

    MINUS / EXISTS right sides are projected to the shared variables
    and deduped before the join — a map-side partial aggregate that
    shrinks the probe input to distinct key tuples, which is what
    lets AQE broadcast the anti/semi side for selective groups at
    100 TB.  Their variables never escape into the solution scope.

    ``subqueries``: SPARQL 1.1 subselects — each a DataFrame produced
    by an inner ``sparql_select`` call (bottom-up evaluation, exactly
    the spec), inner-joined on the variables it shares with the outer
    solution (required non-empty — a disconnected subquery would be a
    cartesian).  The inner query's new variables join the outer
    scope.  The canonical use is "top-k by an aggregate, then fetch
    attributes": the subquery collapses to k rows before the join, so
    the outer side sees a broadcastable key list — never a re-
    aggregation of the full graph per outer row.

    ``order_by`` / ``limit`` / ``offset``: solution modifiers over the
    FINAL projected columns; entries are ``"?var"`` (ascending) or
    ``"-?var"`` (descending).  ``limit`` and ``offset`` REQUIRE an
    ``order_by`` that totally orders the result (include a tie-break
    variable) — an unordered LIMIT is nondeterministic across
    partitionings, which this engine refuses by construction.  Plan
    shape: ORDER BY + LIMIT compiles to Spark's TakeOrderedAndProject
    — a per-partition top-k plus a driver-side merge of k-row heaps,
    NO global sort; OFFSET pagination ships offset+limit rows, so it
    is for result-page windows, not deep scans.
    """
    acc = bgp_select(triples, patterns, graph=graph)
    bound = _group_vars(patterns)
    # GRAPH ?g: the variable is bound by every pattern of every group,
    # so it joins into OPTIONAL/MINUS/EXISTS sides below — the spec's
    # same-graph scoping falls out of ordinary equi-join keys
    gvar = graph[1:] if (graph is not None and graph.startswith("?")) else None
    if gvar:
        bound = bound | {gvar}

    for group in optionals or []:
        gvars = _group_vars(group) | ({gvar} if gvar else set())
        shared = sorted(gvars & bound)
        if not shared:
            raise ValueError(
                f"OPTIONAL group shares no variable with the required part: {group!r}"
            )
        right = bgp_select(triples, group, graph=graph)
        acc = acc.join(right, on=shared, how="left")
        bound |= gvars

    for sub in subqueries or []:
        shared = sorted(set(sub.columns) & bound)
        if not shared:
            raise ValueError(
                "subquery shares no variable with the outer solution: "
                f"{sub.columns!r}"
            )
        acc = acc.join(sub, on=shared, how="inner")
        bound |= set(sub.columns)

    def _keyed_group(group: list[tuple], kind: str) -> tuple[DataFrame, list[str]]:
        gvars = _group_vars(group) | ({gvar} if gvar else set())
        shared = sorted(gvars & bound)
        if not shared:
            raise ValueError(
                f"{kind} group shares no variable with the solution: {group!r}"
            )
        keys = (
            bgp_select(triples, group, graph=graph)
            .select(*shared)
            .dropDuplicates()
        )
        return keys, shared

    for group in minus or []:
        if not ((_group_vars(group) | ({gvar} if gvar else set())) & bound):
            # SPARQL spec: MINUS against a disjoint-domain pattern
            # removes nothing — a deliberate no-op, not an error.
            continue
        keys, shared = _keyed_group(group, "MINUS")
        acc = acc.join(keys, on=shared, how="left_anti")

    for group in exists or []:
        keys, shared = _keyed_group(group, "EXISTS")
        acc = acc.join(keys, on=shared, how="left_semi")

    for group in not_exists or []:
        keys, shared = _keyed_group(group, "NOT EXISTS")
        acc = acc.join(keys, on=shared, how="left_anti")

    if values:
        import pandas as pd

        spark = triples.sparkSession
        for var, allowed in values.items():
            if var not in bound:
                raise ValueError(f"VALUES variable ?{var} is never bound")
            vdf = spark.createDataFrame(pd.DataFrame({var: list(allowed)}))
            acc = acc.join(F.broadcast(vdf), on=var, how="inner")

    for var, bexpr in (bind or {}).items():
        if var in bound:
            raise ValueError(f"BIND would rebind already-bound ?{var}")
        acc = acc.withColumn(var, compile_expr(bexpr, bound))
        bound = bound | {var}

    for fexpr in filters or []:
        acc = acc.where(compile_filter(fexpr, bound))

    if aggregates:
        aggs = []
        for out, spec in aggregates.items():
            fn, var = spec[0], spec[1]
            if fn == "count":
                aggs.append(
                    (F.count("*") if var is None else F.count(var)).alias(out)
                )
            elif fn == "count_distinct":
                aggs.append(F.count_distinct(var).alias(out))
            elif fn == "min":
                aggs.append(F.min(var).alias(out))
            elif fn == "max":
                aggs.append(F.max(var).alias(out))
            elif fn == "sum":
                aggs.append(
                    F.sum(F.col(var).try_cast("decimal(38,10)")).alias(out)
                )
            elif fn == "avg":
                # Exact decimal sum, one double division — deterministic
                # at any partitioning (a double SUM would not be).  The
                # denominator counts values that CAST (numeric lexical
                # forms), matching SQL AVG(TRY_CAST(...)).
                cast_col = F.col(var).try_cast("decimal(38,10)")
                aggs.append(
                    (F.sum(cast_col).cast("double") / F.count(cast_col)).alias(out)
                )
            elif fn == "sample":
                aggs.append(F.min(var).alias(out))
            elif fn == "group_concat":
                sep = spec[2] if len(spec) > 2 else " "
                aggs.append(
                    F.array_join(
                        F.array_sort(F.collect_list(var)), sep
                    ).alias(out)
                )
            else:
                raise ValueError(f"unsupported aggregate {fn!r}")
        acc = acc.groupBy(*(group_by or [])).agg(*aggs)
        agg_bound = set(group_by or []) | set(aggregates)
        for hexpr in having or []:
            acc = acc.where(compile_filter(hexpr, agg_bound))
    elif having:
        raise ValueError("HAVING requires aggregates")
    elif distinct:
        acc = acc.dropDuplicates()

    if project is not None:
        acc = acc.select(*project)

    if (limit is not None or offset is not None) and not order_by:
        raise ValueError(
            "LIMIT/OFFSET without ORDER BY is nondeterministic; pass an "
            "order_by that totally orders the result"
        )
    if order_by:
        sort_cols = []
        for spec in order_by:
            desc = spec.startswith("-")
            name = spec.lstrip("-")
            name = name[1:] if name.startswith("?") else name
            col = F.col(name)
            sort_cols.append(col.desc() if desc else col.asc())
        acc = acc.orderBy(*sort_cols)
    if offset is not None:
        acc = acc.offset(int(offset))
    if limit is not None:
        acc = acc.limit(int(limit))
    return acc


def _iri_safe_vars(patterns: list[tuple]) -> set[str]:
    """Variables guaranteed to bind IRIs/blank nodes: bound in subject
    or predicate position anywhere, or in the object slot of a pattern
    whose objecttype is constrained to 'iri'."""
    safe: set[str] = set()
    for pat in patterns:
        s, p, o = pat[0], pat[1], pat[2]
        otype = pat[3] if len(pat) == 4 else None
        for term in (s, p):
            if isinstance(term, str) and term.startswith("?"):
                safe.add(term[1:])
        if otype == "iri" and isinstance(o, str) and o.startswith("?"):
            safe.add(o[1:])
    return safe


def sparql_construct(
    triples: DataFrame,
    patterns: list[tuple],
    template: list[tuple],
    filters: list[str] | None = None,
) -> DataFrame:
    """SPARQL CONSTRUCT: instantiate ``template`` triple patterns once
    per WHERE solution and return the constructed GRAPH (set — CONSTRUCT
    outputs a graph, so duplicates collapse) in the engine's wide
    triple schema.

    Template terms: ``?var`` (must be bound by ``patterns``), a
    constant IRI string, or ``("literal", value)`` for a constant
    literal object.  An object-position template var must be IRI-SAFE
    — bound in a subject/predicate slot or an ``objecttype="iri"``
    pattern — because the solution mapping carries lexical values
    only; constraining the WHERE pattern (add the 4th ``"iri"`` term)
    is the fix the error message suggests.  This keeps every
    constructed term's objecttype static per template row, so the
    output unions K narrow projections — no shuffle beyond the WHERE
    evaluation itself plus the final dedup.
    """
    if not template:
        raise ValueError("empty CONSTRUCT template")
    sol = sparql_select(triples, patterns, filters=filters)
    if len(template) > 1:
        # each template pattern projects the SAME solution set; pin it
        # or Catalyst re-evaluates the WHERE join tree per pattern
        from turtle_spark.operators.skew import pin

        sol = pin(sol)
    return _instantiate_templates(
        sol, _group_vars(patterns), _iri_safe_vars(patterns), template
    )


def _instantiate_templates(
    sol: DataFrame, bound: set, safe: set, template: list[tuple]
) -> DataFrame:
    """Project the solution set through each template pattern and
    union into one graph (set semantics).  Shared by CONSTRUCT and
    the INSERT half of UPDATE — object-position vars must be IRI-safe
    because the output triple's objecttype is static per pattern."""

    def _term(term, position: str) -> tuple[Column, bool]:
        """-> (value column, is_literal)."""
        if isinstance(term, tuple):
            if position != "object":
                raise ValueError("literal terms are only valid in object position")
            return F.lit(term[1]), True
        if term.startswith("?"):
            name = term[1:]
            if name not in bound:
                raise ValueError(f"template variable ?{name} is never bound")
            if position == "object" and name not in safe:
                raise ValueError(
                    f"object-position template var ?{name} is not IRI-safe; "
                    "constrain its WHERE pattern with objecttype 'iri'"
                )
            return F.col(name), False
        return F.lit(term), False

    parts = []
    for tpat in template:
        if len(tpat) != 3:
            raise ValueError(f"template pattern must have 3 terms: {tpat!r}")
        s_col, _ = _term(tpat[0], "subject")
        p_col, _ = _term(tpat[1], "predicate")
        o_col, is_lit = _term(tpat[2], "object")
        parts.append(
            sol.select(
                s_col.alias("subject"),
                p_col.alias("predicate"),
                o_col.alias("object"),
                F.lit("").alias("label"),
                F.lit("").alias("datatype"),
                F.lit("literal" if is_lit else "iri").alias("objecttype"),
            )
        )
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    return acc.dropDuplicates()


def sparql_ask(
    triples: DataFrame,
    patterns: list[tuple],
    filters: list[str] | None = None,
) -> bool:
    """SPARQL ASK: does at least one solution exist?  Evaluates the
    WHERE with a LIMIT-1 short circuit — Spark's CollectLimit stops
    the scan at the first matching row, so an ASK against a 100 TB
    table touches only as much data as it takes to find one match."""
    return (
        sparql_select(triples, patterns, filters=filters).limit(1).count() > 0
    )


def sparql_describe(
    triples: DataFrame,
    resources: DataFrame | list[str],
    max_blank_depth: int = 4,
) -> DataFrame:
    """SPARQL DESCRIBE (Concise Bounded Description): every triple
    whose subject is a requested resource, expanded through blank-node
    objects transitively — the standard "export this entity" form.

    Each expansion level is one semi-join of the triple table against
    the frontier (the previous level's blank objects), bounded by
    ``max_blank_depth`` — blank-node chains in real graphs are
    property-list/collection structures a few levels deep, and the
    engine's own parser emits exactly such chains.  Returns the wide
    triple schema, deduped (a description is a graph)."""
    spark = triples.sparkSession
    if isinstance(resources, list):
        import pandas as pd

        seeds = spark.createDataFrame(pd.DataFrame({"node": resources}))
    else:
        seeds = resources.select(F.col(resources.columns[0]).alias("node"))
    from turtle_spark.operators.skew import pin

    triples = pin(
        triples.dropDuplicates(
            ["subject", "predicate", "object", "label", "datatype", "objecttype"]
        )
    )
    out = None
    frontier = seeds.dropDuplicates()
    for _ in range(max_blank_depth + 1):
        level = triples.join(
            F.broadcast(frontier),
            triples["subject"] == frontier["node"],
            "left_semi",
        )
        out = level if out is None else out.unionByName(level)
        frontier = (
            level.where(
                (F.col("objecttype") == "iri") & F.col("object").startswith("_:")
            )
            .select(F.col("object").alias("node"))
            .dropDuplicates()
        )
        if frontier.isEmpty():
            break
    return out.dropDuplicates()


def sparql_union(branches: list[DataFrame]) -> DataFrame:
    """SPARQL UNION: branches may bind different variable sets; a
    variable absent from a branch is unbound (NULL) in its rows.  A
    narrow no-shuffle op — each branch keeps its own partitioning."""
    if not branches:
        raise ValueError("empty UNION")
    acc = branches[0]
    for b in branches[1:]:
        acc = acc.unionByName(b, allowMissingColumns=True)
    return acc


def sparql_update(
    triples: DataFrame,
    where: list[tuple],
    delete: list[tuple] | None = None,
    insert: list[tuple] | None = None,
    filters: list[str] | None = None,
) -> DataFrame:
    """SPARQL 1.1 Update ``DELETE/INSERT ... WHERE`` as a batch graph
    rewrite: instantiate both template groups once per WHERE solution
    (via ``sparql_construct``), remove the delete set, add the insert
    set, return the new graph.

    Semantics (per the public SPARQL 1.1 Update spec, §3.1.3): the
    store is a *graph* (set), deletes are applied before inserts, and
    a triple both deleted and re-inserted survives.  Deletion matches
    on the lexical ``(subject, predicate, object)`` triple — the
    solution mapping carries lexical values only, so a delete template
    removes every stored triple with that lexical identity regardless
    of label/datatype decoration (documented divergence from strict
    term equality; exact-term deletion would need the WHERE pattern to
    bind the full term, which the wide-schema BGP does not expose).

    Spark shape: ONE evaluation of the WHERE join tree feeds both
    templates (the solution is pinned whenever more than one template
    pattern projects it); the delete applies as a broadcast-able
    **left anti join** against the base graph — the 100 TB side never
    shuffles when the delete set is bounded — and the insert is a
    union + dedup.  No Python in any row path.

    Template rules: INSERT object-position vars must be IRI-safe
    (same rule and reason as ``sparql_construct`` — the inserted
    triple needs a static objecttype).  DELETE templates carry no
    such restriction: deletion matches lexically, so a literal-bound
    var is fine there.
    """
    if not delete and not insert:
        raise ValueError("UPDATE needs at least one of delete/insert")
    sol = sparql_select(triples, where, filters=filters)
    if len(delete or ()) + len(insert or ()) > 1:
        from turtle_spark.operators.skew import pin

        sol = pin(sol)
    bound = _group_vars(where)
    safe = _iri_safe_vars(where)

    def _lex(term) -> Column:
        """Lexical value of a DELETE-template term (no safety check)."""
        if isinstance(term, tuple):
            return F.lit(term[1])
        if term.startswith("?"):
            name = term[1:]
            if name not in bound:
                raise ValueError(f"template variable ?{name} is never bound")
            return F.col(name)
        return F.lit(term)

    base = triples.select(
        "subject", "predicate", "object", "label", "datatype", "objecttype"
    ).dropDuplicates()
    out = base
    if delete:
        parts = [
            sol.select(
                _lex(t[0]).alias("subject"),
                _lex(t[1]).alias("predicate"),
                _lex(t[2]).alias("object"),
            )
            for t in delete
        ]
        del_keys = parts[0]
        for p in parts[1:]:
            del_keys = del_keys.unionByName(p)
        out = out.join(
            F.broadcast(del_keys.dropDuplicates()),
            ["subject", "predicate", "object"],
            "left_anti",
        )
    if insert:
        ins_graph = _instantiate_templates(sol, bound, safe, insert)
        out = out.unionByName(ins_graph).dropDuplicates()
    return out
