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
    stats: "BgpStats | None" = None,
    broadcast_rows: int = 100_000,
) -> DataFrame:
    """Evaluate a conjunctive basic graph pattern.

    ``stats``: optional :class:`BgpStats` — switches join ordering
    from the constant-count greedy to cardinality-driven greedy with
    the characteristic-set star refinement, and bases broadcast
    decisions on estimated rows (``<= broadcast_rows``) instead of
    the two-constants rule.  Join order never changes RESULTS (inner
    equi-joins commute), only the plan.

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

    metas = [
        (
            scans[i][1],
            scans[i][2],
            (
                stats.pattern_card(
                    not _is_var(patterns[i][0]),
                    None if _is_var(patterns[i][1]) else patterns[i][1],
                    not _is_var(patterns[i][2]),
                )
                if stats is not None
                else 0.0
            ),
            patterns[i][0][1:] if _is_var(patterns[i][0]) else None,
            None if _is_var(patterns[i][1]) else patterns[i][1],
        )
        for i in range(len(patterns))
    ]
    order = plan_join_order(metas, stats)
    if order and order[-1] < 0:
        nxt = -1 - order[-1]
        raise ValueError(
            "pattern shares no variable with the rest of the BGP "
            f"(cartesian product refused): {patterns[nxt]!r}"
        )

    def _broadcastable(i: int) -> bool:
        if stats is not None:
            return metas[i][2] <= broadcast_rows
        return scans[i][2] >= 2

    seed = order[0]
    acc, bound, _ = scans[seed]
    bound = set(bound)
    if _broadcastable(seed) and len(order) > 1:
        # the anchor slice is bounded; let the first join broadcast it
        acc = F.broadcast(acc)
    for nxt in order[1:]:
        scan, vars_, _ = scans[nxt]
        right = F.broadcast(scan) if _broadcastable(nxt) else scan
        acc = acc.join(right, on=sorted(vars_ & bound), how="inner")
        bound |= vars_

    if project is not None:
        missing = [v for v in project if v not in bound]
        if missing:
            raise ValueError(f"projected variables never bound: {missing}")
        acc = acc.select(*project)
    return acc


class BgpStats:
    """Cardinality statistics for BGP join ordering — the planner
    sidecar a SPARQL engine keeps next to the triple table.

    Two summaries, both bounded by the graph's STRUCTURE (not its
    size) and therefore safe to hold driver-side like a tokenizer
    config:

    * per-predicate profile (``graph.predicate_profile``): triple /
      distinct-subject / distinct-object counts per predicate — the
      domain is the predicate vocabulary (hundreds in real KGs);
    * characteristic sets (``graph.characteristic_sets``, Neumann &
      Moerkotte ICDE'11): how many subjects exhibit each exact
      predicate set — the domain is the number of distinct structures
      (a few thousand at web scale).  A star pattern over predicates
      P matches exactly the subjects of every characteristic set ⊇ P,
      so star-join cardinality is a SUM over the summary, not a guess
      from independence assumptions (the estimate independence gets
      catastrophically wrong on correlated predicates, §1 of the
      paper).

    Estimates order joins only — results are join-order-independent,
    so a stale or approximate summary can never change answers, just
    speed.  All estimate arithmetic is plain int/float on collected
    summaries; nothing here touches the data path.
    """

    def __init__(
        self,
        pred_stats: dict[str, tuple[int, int, int]],
        char_sets: list[tuple[frozenset, int]],
        total_triples: int,
    ):
        self.pred_stats = pred_stats
        self.char_sets = char_sets
        self.total_triples = total_triples

    @classmethod
    def from_triples(cls, triples: DataFrame, cs_min_support: int = 2) -> "BgpStats":
        from turtle_spark.operators.graph import characteristic_sets, predicate_profile

        prof = {
            r["predicate"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
            for r in predicate_profile(triples).collect()
        }
        cs = [
            (frozenset(r["cs"].split(" ")), r["n_subjects"])
            for r in characteristic_sets(triples, min_support=cs_min_support).collect()
        ]
        total = sum(n for n, _, _ in prof.values())
        return cls(prof, cs, total)

    @classmethod
    def from_triples_sketched(
        cls, triples: DataFrame, cs_min_support: int = 2, with_char_sets: bool = True
    ) -> "BgpStats":
        """The 100 TB stats builder: identical shape to
        :meth:`from_triples`, but the per-predicate distinct-subject /
        distinct-object counts come from HyperLogLog registers
        (operators/sketches.py) instead of exact ``countDistinct``.

        Exact distincts shuffle every (predicate, term) pair once per
        column; the HLL pass shuffles at most 4096 register rows per
        predicate per upstream partition, with map-side max-merge.
        Estimates only ever pick the JOIN ORDER — results are
        join-order-independent (class docstring), so the ±1.6 %
        register error is free speed, never a correctness risk.

        Characteristic sets stay exact (their cost is one subject-level
        aggregation and their domain is bounded by graph structure);
        pass ``with_char_sets=False`` to skip them and fall back to
        per-predicate independence estimates for stars."""
        from turtle_spark.operators.graph import characteristic_sets
        from turtle_spark.operators.sketches import hll_cardinality

        counts = triples.groupBy("predicate").agg(F.count("*").alias("n_t"))
        subj = hll_cardinality(triples, ["predicate"], "subject").withColumnRenamed(
            "hll_est", "n_s"
        )
        obj = hll_cardinality(triples, ["predicate"], "object").withColumnRenamed(
            "hll_est", "n_o"
        )
        prof = {
            r["predicate"]: (
                r["n_t"],
                max(int(round(r["n_s"])), 1),
                max(int(round(r["n_o"])), 1),
            )
            for r in counts.join(subj, "predicate").join(obj, "predicate").collect()
        }
        cs = (
            [
                (frozenset(r["cs"].split(" ")), r["n_subjects"])
                for r in characteristic_sets(
                    triples, min_support=cs_min_support
                ).collect()
            ]
            if with_char_sets
            else []
        )
        total = sum(n for n, _, _ in prof.values())
        return cls(prof, cs, total)

    def star_subjects(self, preds: frozenset) -> int:
        """Subjects whose predicate set contains ALL of ``preds`` =
        sum of the counts of every characteristic set ⊇ preds."""
        return sum(n for cs, n in self.char_sets if preds <= cs)

    def pattern_card(self, s_is_const: bool, pred: str | None, o_is_const: bool) -> float:
        """Estimated rows one triple pattern scans.

        ``pred`` is the constant predicate or None for a variable."""
        if pred is None:
            base = float(self.total_triples)
            if s_is_const:
                base /= max(len(self.pred_stats), 1)
            if o_is_const:
                base /= max(len(self.pred_stats), 1)
            return max(base, 1.0)
        stats = self.pred_stats.get(pred)
        if stats is None:
            return 0.0  # predicate absent: empty scan
        n_t, n_s, n_o = stats
        card = float(n_t)
        if s_is_const:
            card /= max(n_s, 1)
        if o_is_const:
            card /= max(n_o, 1)
        return max(card, 0.0)


def plan_join_order(
    metas: list[tuple[set[str], int, float, str | None, str | None]],
    stats: "BgpStats | None",
) -> list[int]:
    """Pure join-ordering decision, unit-testable without Spark.

    ``metas[i] = (vars, n_const, est_card, subject_var, const_pred)``
    per pattern — ``subject_var``/``const_pred`` feed the
    characteristic-set star refinement: when the next candidate
    extends a star (same subject variable, constant predicate), its
    effective cardinality is the EXACT count of subjects carrying the
    whole predicate set so far, times the candidate predicate's
    average fan-out — the Neumann-Moerkotte estimate, immune to the
    independence-assumption blowup on correlated predicates.

    Without ``stats`` this reproduces the constant-count greedy order
    (seed = most constants; then most shared vars) byte for byte.
    """
    remaining = list(range(len(metas)))
    if stats is None:
        seed = max(remaining, key=lambda i: (metas[i][1], -i))
        order = [seed]
        remaining.remove(seed)
        bound = set(metas[seed][0])
        while remaining:
            scored = [
                (len(metas[i][0] & bound), metas[i][1], -i, i) for i in remaining
            ]
            shared, _, _, nxt = max(scored)
            if shared == 0:
                return order + [-1 - nxt]  # sentinel: disconnected at nxt
            order.append(nxt)
            remaining.remove(nxt)
            bound |= metas[nxt][0]
        return order

    # stats-driven: seed = smallest estimated scan (ties: more
    # constants, lower index), then greedily append the connected
    # pattern with the smallest EFFECTIVE estimate
    seed = min(remaining, key=lambda i: (metas[i][2], -metas[i][1], i))
    order = [seed]
    remaining.remove(seed)
    bound = set(metas[seed][0])
    # per subject-var: constant predicates of already-joined patterns
    star_preds: dict[str, set[str]] = {}
    if metas[seed][3] and metas[seed][4]:
        star_preds.setdefault(metas[seed][3], set()).add(metas[seed][4])
    while remaining:
        best = None
        for i in remaining:
            vars_, n_const, est, s_var, c_pred = metas[i]
            if not (vars_ & bound):
                continue
            eff = est
            if s_var and c_pred and s_var in star_preds:
                nt, ns, _ = stats.pred_stats.get(c_pred, (0, 1, 1)) or (0, 1, 1)
                fanout = nt / max(ns, 1)
                eff = min(
                    eff,
                    stats.star_subjects(
                        frozenset(star_preds[s_var] | {c_pred})
                    )
                    * max(fanout, 1.0),
                )
            key = (eff, -n_const, i)
            if best is None or key < best[0]:
                best = (key, i)
        if best is None:
            return order + [-1 - remaining[0]]  # disconnected
        nxt = best[1]
        order.append(nxt)
        remaining.remove(nxt)
        bound |= metas[nxt][0]
        if metas[nxt][3] and metas[nxt][4]:
            star_preds.setdefault(metas[nxt][3], set()).add(metas[nxt][4])
    return order
