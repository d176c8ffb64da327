"""Stage D' — canonical-map construction and application.

Takes CC assignments over term_ids and rewrites the triple stream so
every linked surface form uses its component's canonical term (the
lexicographically smallest term in the component — deterministic and
partitioning-independent).

Join strategy: the canonical map is usually tiny relative to the
triple stream (distinct linked terms << triple occurrences), so it is
broadcast when under the configured row threshold, else it falls back
to a shuffle join on the 8-byte term_id.  Blank nodes are doc-scoped
by the parser; ``globalize_blank_nodes`` uniquifies them across the
corpus by prefixing doc_id — a pure column expression, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_MAP_MAX_ROWS = 5_000_000  # ~8B key + term bytes; well under 8GB limit


def canonical_map(terms: DataFrame, assignments: DataFrame) -> DataFrame:
    """(term_id, term) x (node, component) -> (term_id, term,
    canonical_term).

    Canonical representative = min term string within the component.
    Terms not in any component are identity-mapped out (absent rows).
    The source ``term`` string rides along so the apply step can guard
    the hash join with exact string equality (see apply_canonical_map).
    """
    labeled = terms.join(
        assignments, terms["term_id"] == assignments["node"], "inner"
    ).select("term_id", "term", "component")
    reps = labeled.groupBy("component").agg(F.min("term").alias("canonical_term"))
    return (
        labeled.join(reps, "component")
        .where(F.col("term") != F.col("canonical_term"))
        .select("term_id", "term", "canonical_term")
    )


def apply_canonical_map(
    triples: DataFrame,
    cmap: DataFrame,
    broadcast_threshold: int = BROADCAST_MAP_MAX_ROWS,
) -> DataFrame:
    """Rewrite subject/object through the canonical map.

    Two left joins keyed on xxhash64 of the string, each GUARDED by
    exact string equality on the carried ``term``: the 8-byte hash
    stays the shuffle/broadcast key (cheap at 10^12 terms), but a
    64-bit collision — a certainty at that scale, ~n^2/2^65 expected —
    can then never rewrite an unrelated subject; the collided row
    simply doesn't match and passes through unchanged.  The map side
    is broadcast when small.  Literal objects are never rewritten.
    """
    use_broadcast = cmap.count() <= broadcast_threshold
    m = F.broadcast(cmap) if use_broadcast else cmap

    sub_map = m.select(
        F.col("term_id").alias("_sid"),
        F.col("term").alias("_sterm"),
        F.col("canonical_term").alias("_scanon"),
    )
    obj_map = m.select(
        F.col("term_id").alias("_oid"),
        F.col("term").alias("_oterm"),
        F.col("canonical_term").alias("_ocanon"),
    )

    out = (
        triples.withColumn("_sk", F.xxhash64("subject"))
        .withColumn(
            "_ok",
            F.when(F.col("objecttype") == "iri", F.xxhash64("object")),
        )
        .join(
            sub_map,
            (F.col("_sk") == F.col("_sid")) & (F.col("subject") == F.col("_sterm")),
            "left",
        )
        .join(
            obj_map,
            (F.col("_ok") == F.col("_oid")) & (F.col("object") == F.col("_oterm")),
            "left",
        )
        .withColumn("subject", F.coalesce("_scanon", "subject"))
        .withColumn("object", F.coalesce("_ocanon", "object"))
        .drop("_sk", "_ok", "_sid", "_oid", "_sterm", "_oterm", "_scanon", "_ocanon")
    )
    return out


def globalize_blank_nodes(triples: DataFrame) -> DataFrame:
    """Uniquify doc-scoped blank nodes across the corpus.

    ``_:b0`` in doc A and doc B are different nodes; prefixing with the
    doc_id (``_:doc-000001#b0``) makes the union of all documents a
    well-formed graph.  Pure column expressions — no shuffle, stays in
    whole-stage codegen.
    """

    def fix(col: str) -> F.Column:
        c = F.col(col)
        return F.when(
            c.startswith("_:"),
            F.concat(F.lit("_:"), F.col("doc_id"), F.lit("#"), c.substr(F.lit(3), F.length(c))),
        ).otherwise(c)

    return triples.withColumn("subject", fix("subject")).withColumn(
        "object",
        F.when(F.col("objecttype") == "iri", fix("object")).otherwise(F.col("object")),
    )


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Corpus-level exact dedup (serialization semantics, graph/graph.go:81-96)."""
    return triples.dropDuplicates(
        ["subject", "predicate", "object", "label", "datatype", "objecttype"]
    )
