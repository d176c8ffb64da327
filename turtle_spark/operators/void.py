"""VoID dataset statistics over the materialized triple table.

The W3C VoID vocabulary (public spec, "Describing Linked Datasets
with the VoID Vocabulary") defines the canonical self-description a
published KG ships with: dataset-level totals plus one *property
partition* per predicate and one *class partition* per class.  This
module computes those statistics as a single long-format table —
the publish-gate companion to ``operators/shacl.py`` (shape validity)
and ``operators/graph.py::predicate_profile`` (planner statistics).

Spark shape: three aggregations over one pinned scan —

* dataset totals: a single global agg (``count`` + four
  ``count_distinct``) — one shuffle to 1 row;
* property partitions: ``groupBy(predicate)`` — predicates number in
  the thousands at any corpus scale, so the post-shuffle side is tiny;
* class partitions: filter to ``rdf:type`` rows then
  ``groupBy(object)`` — same cardinality argument.

Every agg is map-side-combinable (counts + HLL-free exact distincts
over already-grouped keys), so the 100 TB scan reduces before the
exchange.  Output rows carry an XOR-of-xxhash64 member fingerprint so
the oracle comparison is content-sensitive, not just count-sensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def void_statistics(triples: DataFrame) -> DataFrame:
    """-> (part, key, n_triples, n_entities, member_fp) long table.

    ``part`` is one of ``dataset`` / ``propertyPartition`` /
    ``classPartition`` (VoID's partition terms).  For the dataset row
    ``n_entities`` is the distinct-subject count; for a property
    partition it is the partition's distinct subjects (VoID
    ``distinctSubjects``); for a class partition it is the class's
    distinct instances (VoID ``entities``).
    """
    from turtle_spark.operators.skew import pin

    g = pin(
        triples.select(
            "subject", "predicate", "object", "label", "datatype", "objecttype"
        ).dropDuplicates()
    )
    out_cols = ("part", "key", "n_triples", "n_entities", "member_fp")

    dataset = g.agg(
        F.count("*").alias("n_triples"),
        F.count_distinct("subject").alias("n_entities"),
        F.expr(
            "bit_xor(xxhash64(concat_ws('|', subject, predicate, object)))"
        ).alias("member_fp"),
    ).select(
        F.lit("dataset").alias("part"),
        F.lit("(all)").alias("key"),
        *[F.col(c) for c in ("n_triples", "n_entities", "member_fp")],
    )

    props = (
        g.groupBy(F.col("predicate").alias("key"))
        .agg(
            F.count("*").alias("n_triples"),
            F.count_distinct("subject").alias("n_entities"),
            F.expr(
                "bit_xor(xxhash64(concat_ws('|', subject, object)))"
            ).alias("member_fp"),
        )
        .select(F.lit("propertyPartition").alias("part"), *out_cols[1:])
    )

    classes = (
        g.where((F.col("predicate") == RDF_TYPE) & (F.col("objecttype") == "iri"))
        .groupBy(F.col("object").alias("key"))
        .agg(
            F.count("*").alias("n_triples"),
            F.count_distinct("subject").alias("n_entities"),
            F.expr("bit_xor(xxhash64(subject))").alias("member_fp"),
        )
        .select(F.lit("classPartition").alias("part"), *out_cols[1:])
    )

    return dataset.unionByName(props).unionByName(classes)
