"""Basic-graph-pattern (SPARQL-style) query compiler over the triple table.

The KG-construction pipeline materializes one wide triple table
(subject, predicate, object, label, datatype, objecttype); the natural
query language over it is a conjunctive basic graph pattern — the core
of SPARQL SELECT (the reference is an RDF parser library, so its users
live in this query model; no counterpart in `/root/reference`, which
implements no query layer — SURVEY.md §2.2).

``bgp_select`` compiles a list of triple patterns into a join tree of
filtered scans of ONE table:

* every constant term becomes a pushed-down scan predicate — at 100 TB
  a subject constant prunes to one subject-hash bucket of the
  materialized table (sources/storage.py), and predicate/object
  constants reach the parquet reader as PushedFilters;
* every variable shared between two patterns becomes an equi-join key
  (never a theta-join), so each join is a plain shuffle/broadcast hash
  join on string keys;
* join ORDER is selectivity-greedy: start from the most-constrained
  pattern (most constants), then repeatedly join the pattern sharing
  the most already-bound variables (ties broken by constant count,
  then by pattern index — fully deterministic).  This is the textbook
  heuristic a real SPARQL engine seeds its optimizer with; per-pattern
  cardinalities from ``graph.predicate_profile`` can refine it;
* a pattern with two or more constants is a bounded slice of the KG
  (one predicate-object or subject-predicate selection), so its scan
  is broadcast-hinted: the common "anchor" pattern of a BGP then never
  shuffles the big side twice.

Bag semantics (SPARQL default): duplicate bindings survive; callers
add ``dropDuplicates`` for DISTINCT.

Patterns that share no variable with the rest of the query would need
a cartesian product; ``bgp_select`` refuses them (a web-scale cross
join is always a bug, not a query plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIONS = ("subject", "predicate", "object")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _pattern_scan(
    triples: DataFrame, pattern: tuple, graph: str | None = None
) -> tuple[DataFrame, set[str], int]:
    """One pattern -> (scan DataFrame with var-named columns, vars, n_constants)."""
    if len(pattern) == 4:
        s, p, o, otype = pattern
    elif len(pattern) == 3:
        (s, p, o), otype = pattern, None
    else:
        raise ValueError(f"pattern must have 3 terms (+ optional objecttype): {pattern!r}")

    df = triples
    n_const = 0
    if otype is not None:
        df = df.where(F.col("objecttype") == otype)
    var_cols: dict[str, str] = {}  # var name -> first position bound
    positions = list(zip(_POSITIONS, (s, p, o)))
    if graph is not None:
        # GRAPH term: a constant scopes every pattern to one named
        # graph (a pushed-down scan predicate — on a graph-partitioned
        # quad table this is partition pruning); a variable becomes a
        # column every pattern binds, hence an equi-join key shared by
        # the whole BGP — exactly SPARQL's GRAPH ?g { ... } semantics.
        positions.append(("graph", graph))
    for col, term in positions:
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"empty variable name in {pattern!r}")
            if name in var_cols:
                # same var twice in one pattern => intra-pattern equality
                df = df.where(F.col(col) == F.col(var_cols[name]))
            else:
                var_cols[name] = col
        else:
            df = df.where(F.col(col) == term)
            n_const += 1
    scan = df.select(*[F.col(col).alias(name) for name, col in var_cols.items()])
    return scan, set(var_cols), n_const


def bgp_select(
    triples: DataFrame,
    patterns: list[tuple],
    project: list[str] | None = None,
    graph: str | None = None,
) -> DataFrame:
    """Evaluate a conjunctive basic graph pattern.

    ``patterns``: each ``(s, p, o)`` or ``(s, p, o, objecttype)``;
    a term starting with ``?`` is a variable, anything else matches
    the (already-expanded) IRI / lexical value exactly — expansion is
    the parser's job, the materialized KG stores full IRIs.

    ``project``: variable names (without ``?``) to keep; default all.

    ``graph``: SPARQL GRAPH scope over a QUAD table (requires a
    ``graph`` column).  A constant IRI restricts every pattern to one
    named graph; a ``?var`` binds the graph per solution and joins the
    whole BGP on it (all patterns must match within the SAME graph).
    ``None`` queries the union of all graphs — the merged-default-
    graph reading, this engine's documented semantics for triple-level
    queries over quad stores.
    """
    if not patterns:
        raise ValueError("empty basic graph pattern")
    scans = [_pattern_scan(triples, p, graph=graph) for p in patterns]

    remaining = list(range(len(scans)))
    # seed: most constants, deterministic tiebreak by index
    seed = max(remaining, key=lambda i: (scans[i][2], -i))
    remaining.remove(seed)
    acc, bound, seed_const = scans[seed]
    if seed_const >= 2 and remaining:
        # the anchor slice is bounded; let the first join broadcast it
        acc = F.broadcast(acc)

    while remaining:
        scored = [(len(scans[i][1] & bound), scans[i][2], -i, i) for i in remaining]
        shared, _, _, nxt = max(scored)
        if shared == 0:
            raise ValueError(
                "pattern shares no variable with the rest of the BGP "
                f"(cartesian product refused): {patterns[nxt]!r}"
            )
        remaining.remove(nxt)
        scan, vars_, n_const = scans[nxt]
        right = F.broadcast(scan) if n_const >= 2 else scan
        acc = acc.join(right, on=sorted(scans[nxt][1] & bound), how="inner")
        bound |= vars_

    if project is not None:
        missing = [v for v in project if v not in bound]
        if missing:
            raise ValueError(f"projected variables never bound: {missing}")
        acc = acc.select(*project)
    return acc
