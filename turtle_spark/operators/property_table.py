"""Property-table materialization — the classic columnar RDF layout.

A triple table answers star-shaped BGPs (many predicates of one
subject) with one self-join per predicate.  The property-table layout
(Jena property tables; Sempala; S2RDF's ExtVP family — all public
literature) pivots the FUNCTIONAL predicates into columns of a wide
subject-keyed table, so a star query becomes a single scan with
column predicates — no joins at all.

Scale notes: the pivot is ONE ``groupBy(subject)`` shuffle over the
triples whose predicate made the column set; each aggregate is a
``min(when(...))`` pair, so the whole row assembles map-side-combined
inside whole-stage codegen.  The column set itself comes from the
predicate-profile statistics (``operators/graph.py::
predicate_profile``) — cardinality = vocabulary size, so the driver
only ever sees a bounded list of predicate names, never data rows.
At 10^12 triples the wide table lands bucketed by subject hash next
to the triple table; star-heavy workloads read it instead.

No counterpart in the reference (a parser); layout follows the
public property-table literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def choose_columns(
    profile: DataFrame, max_cols: int = 8, functional_only: bool = True
) -> list[str]:
    """Pick the pivot predicates from a predicate-profile table.

    Deterministic rule: functional predicates (max fan-out 1) ranked
    by (n_triples desc, predicate asc), capped at ``max_cols``.  The
    collect is bounded by the vocabulary, not the data.
    """
    ranked = profile
    if functional_only:
        ranked = ranked.where(F.col("is_functional"))
    rows = (
        ranked.orderBy(F.desc("n_triples"), F.asc("predicate"))
        .select("predicate")
        .limit(max_cols)
        .collect()
    )
    return [r.predicate for r in rows]


def property_table(triples: DataFrame, predicates: list[str]) -> DataFrame:
    """Pivot ``triples`` into (subject, p0..pK) — one row per subject
    that has at least one of ``predicates``.

    ``min`` picks the deterministic representative when a nominally
    functional predicate still carries duplicates (UTF-8 byte order ==
    code-point order, so any engine agrees on the choice).  Missing
    cells are NULL, as in every property-table system.
    """
    if not predicates:
        raise ValueError("property_table needs at least one predicate")
    filtered = triples.where(F.col("predicate").isin(predicates))
    aggs = [
        F.min(F.when(F.col("predicate") == p, F.col("object"))).alias(f"p{i}")
        for i, p in enumerate(predicates)
    ]
    return filtered.groupBy("subject").agg(*aggs)
