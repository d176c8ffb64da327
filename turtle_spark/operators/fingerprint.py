"""Blank-node-invariant structural graph fingerprints.

Two Turtle documents that serialize the same graph with different
blank-node labels (``_:b0`` vs ``_:x``, or the parser's own
allocation order — the reference allocates ``_:bN`` from a counter,
``scanner/scanner.go:35`` ``blankNodeCounter``, so the same content
tokenized in a different statement order yields different labels) are
the SAME knowledge — but every byte-level dedup tier sees them as
distinct.  This operator canonicalizes blank nodes
by Weisfeiler-Leman color refinement (the standard isomorphism-
invariant vertex labeling; cf. RDF graph canonicalization à la
Hogan's iso-canonical algorithm) and derives a per-document
fingerprint that is EXACTLY invariant under any bijective blank-node
relabeling:

1. every blank node starts with one shared color; IRIs and literals
   are colored by the xxhash64 of their full term encoding (their
   identity IS their content);
2. each round, a blank's color becomes the hash of the SORTED list of
   ``direction|predicate|neighbor-color`` messages over its incident
   triples — sorting makes the multiset encoding order- and
   partitioning-independent;
3. after a FIXED number of rounds (deterministic; no data-dependent
   convergence), each triple is encoded with colors substituted for
   blank labels, and the document fingerprint is the XOR of the
   encoded-triple hashes — multiset-invariant, so row order never
   matters.

Scale: all state is keyed by (doc_id, term) — refinement shuffles
move one row per blank node per round, never payloads, and degree is
bounded by document size (property lists / collection spines), so no
key is hot.  ``rounds`` is a fixed constant: the shuffle DAG depth is
known at plan time, exactly like the path-doubling closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# every blank node starts from this shared color (round 0)
_INIT_COLOR = 0


def _is_blank(col: str) -> F.Column:
    return F.col(col).startswith("_:")


def blank_colors(triples: DataFrame, rounds: int = 3) -> DataFrame:
    """(doc_id, term, color) for every blank node after ``rounds`` of
    WL refinement within its document's graph."""
    subj_blank = triples.where(_is_blank("subject"))
    obj_blank = triples.where(
        (F.col("objecttype") == "iri") & _is_blank("object")
    )

    lit = F.lit("")
    # incident messages: (doc_id, b, dir|pred, other, static neighbor
    # code when the neighbor is not blank)
    from_subj = subj_blank.select(
        "doc_id",
        F.col("subject").alias("b"),
        F.concat_ws("|", F.lit("s"), "predicate").alias("edge"),
        F.col("object").alias("other"),
        F.when(
            ~_is_blank("object"),
            F.xxhash64(F.concat_ws("|", "object", "label", "datatype", "objecttype")),
        ).alias("static_code"),
    )
    from_obj = obj_blank.select(
        "doc_id",
        F.col("object").alias("b"),
        F.concat_ws("|", F.lit("o"), "predicate").alias("edge"),
        F.col("subject").alias("other"),
        F.when(
            ~_is_blank("subject"),
            F.xxhash64(F.concat_ws("|", "subject", lit, lit, F.lit("iri"))),
        ).alias("static_code"),
    )
    incident = from_subj.unionByName(from_obj)

    colors = (
        incident.select("doc_id", F.col("b").alias("term"))
        .dropDuplicates()
        .withColumn("color", F.lit(_INIT_COLOR).cast("long"))
    )

    for _ in range(rounds):
        nbr = colors.select(
            F.col("doc_id").alias("_d"),
            F.col("term").alias("_t"),
            F.col("color").alias("_ncolor"),
        )
        msgs = incident.join(
            nbr,
            (F.col("doc_id") == F.col("_d")) & (F.col("other") == F.col("_t")),
            "left",
        ).select(
            "doc_id",
            "b",
            F.concat_ws(
                "|",
                "edge",
                F.coalesce(F.col("_ncolor"), F.col("static_code")).cast("string"),
            ).alias("msg"),
        )
        colors = (
            msgs.groupBy("doc_id", F.col("b").alias("term"))
            .agg(
                F.xxhash64(
                    F.concat_ws(",", F.sort_array(F.collect_list("msg")))
                ).alias("color")
            )
        )
    return colors


def graph_fingerprints(triples: DataFrame, rounds: int = 3) -> DataFrame:
    """Per-document structural fingerprint, invariant under blank-node
    relabeling: (doc_id, graph_fp, n_triples, n_blanks)."""
    colors = blank_colors(triples, rounds=rounds)
    scol = colors.select(
        F.col("doc_id").alias("_sd"),
        F.col("term").alias("_st"),
        F.col("color").alias("_scolor"),
    )
    ocol = colors.select(
        F.col("doc_id").alias("_od"),
        F.col("term").alias("_ot"),
        F.col("color").alias("_ocolor"),
    )
    lit = F.lit("")
    # subjects are always IRI-or-blank: their identity code uses the
    # same (term|""|""|iri) encoding as the refinement's neighbor code
    subj_code = F.xxhash64(F.concat_ws("|", "subject", lit, lit, F.lit("iri")))
    obj_code = F.xxhash64(
        F.concat_ws("|", "object", "label", "datatype", "objecttype")
    )
    coded = (
        triples.join(
            scol,
            (F.col("doc_id") == F.col("_sd")) & (F.col("subject") == F.col("_st")),
            "left",
        )
        .join(
            ocol,
            (F.col("doc_id") == F.col("_od"))
            & (F.col("object") == F.col("_ot"))
            # a literal whose text LOOKS like a blank label must never
            # pick up a blank color
            & (F.col("objecttype") == "iri"),
            "left",
        )
        .select(
            "doc_id",
            F.concat_ws(
                "|",
                F.coalesce(F.col("_scolor"), subj_code).cast("string"),
                "predicate",
                F.coalesce(F.col("_ocolor"), obj_code).cast("string"),
                "objecttype",
            ).alias("enc"),
        )
    )
    return (
        coded.groupBy("doc_id")
        .agg(
            F.expr("bit_xor(xxhash64(enc))").alias("graph_fp"),
            F.count("*").alias("n_triples"),
        )
        .join(
            colors.groupBy("doc_id").agg(F.count("*").alias("n_blanks")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "graph_fp",
            "n_triples",
            F.coalesce("n_blanks", F.lit(0)).alias("n_blanks"),
        )
    )
