"""VoID statistics (operators/void.py) and structural blank-node
canonicalization (operators/canonicalize.canonical_blank_labels) on
tiny hand-checkable graphs.  Corpus-level oracle parity is pinned by
test_oracle_parity via q_void_stats / q_bnode_canonical."""

from __future__ import annotations

from turtle_spark.operators.canonicalize import canonical_blank_labels
from turtle_spark.operators.void import RDF_TYPE, void_statistics

_COLS = (
    "subject string, predicate string, object string, "
    "label string, datatype string, objecttype string"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, _COLS)


# --- VoID ------------------------------------------------------------------


def test_void_counts_and_partitions(spark):
    rows = [
        ("e/a", RDF_TYPE, "c/Person", "", "", "iri"),
        ("e/b", RDF_TYPE, "c/Person", "", "", "iri"),
        ("e/a", "p/name", "Alice", "", "", "literal"),
        ("e/a", "p/knows", "e/b", "", "", "iri"),
        # exact duplicate: the dataset is a SET
        ("e/a", "p/knows", "e/b", "", "", "iri"),
    ]
    out = {
        (r["part"], r["key"]): (r["n_triples"], r["n_entities"])
        for r in void_statistics(_df(spark, rows)).collect()
    }
    assert out[("dataset", "(all)")] == (4, 2)
    assert out[("propertyPartition", RDF_TYPE)] == (2, 2)
    assert out[("propertyPartition", "p/name")] == (1, 1)
    assert out[("propertyPartition", "p/knows")] == (1, 1)
    assert out[("classPartition", "c/Person")] == (2, 2)
    assert len(out) == 5


def test_void_literal_typed_object_is_not_a_class(spark):
    rows = [("e/a", RDF_TYPE, "oops", "", "", "literal")]
    parts = {r["part"] for r in void_statistics(_df(spark, rows)).collect()}
    assert "classPartition" not in parts


# --- blank-node canonicalization --------------------------------------------


def _canon(spark, rows):
    return {
        r["bnode"]: r["canon"]
        for r in canonical_blank_labels(_df(spark, rows)).collect()
    }


def test_isomorphic_structures_share_a_label(spark):
    rows = [
        ("_:x", RDF_TYPE, "c/Addr", "", "", "iri"),
        ("_:x", "p/city", "Oslo", "", "", "literal"),
        ("_:y", RDF_TYPE, "c/Addr", "", "", "iri"),
        ("_:y", "p/city", "Oslo", "", "", "literal"),
        # a structurally different one
        ("_:z", RDF_TYPE, "c/Addr", "", "", "iri"),
        ("_:z", "p/city", "Bergen", "", "", "literal"),
    ]
    canon = _canon(spark, rows)
    assert canon["_:x"] == canon["_:y"]
    assert canon["_:x"] != canon["_:z"]


def test_chain_depth_separates_after_refinement(spark):
    # two chains that agree locally but differ two hops away: only the
    # iterated refinement can tell the heads apart
    rows = [
        ("_:h1", "p/next", "_:m1", "", "", "iri"),
        ("_:m1", "p/next", "_:t1", "", "", "iri"),
        ("_:t1", "p/val", "1", "", "", "literal"),
        ("_:h2", "p/next", "_:m2", "", "", "iri"),
        ("_:m2", "p/next", "_:t2", "", "", "iri"),
        ("_:t2", "p/val", "2", "", "", "literal"),
    ]
    canon = _canon(spark, rows)
    assert canon["_:t1"] != canon["_:t2"]  # direct ground difference
    assert canon["_:m1"] != canon["_:m2"]  # 1 hop
    assert canon["_:h1"] != canon["_:h2"]  # 2 hops — needs refinement


def test_edge_multiplicity_is_visible(spark):
    rows = [
        ("_:one", "p/tag", "t", "", "", "literal"),
        ("_:two", "p/tag", "t", "", "", "literal"),
        ("_:two", "p/tag", "t", "", "", "literal"),  # same edge twice
    ]
    canon = _canon(spark, rows)
    assert canon["_:one"] != canon["_:two"]


def test_incoming_edges_participate(spark):
    rows = [
        ("e/a", "p/owns", "_:p", "", "", "iri"),
        ("e/b", "p/owns", "_:q", "", "", "iri"),
    ]
    canon = _canon(spark, rows)
    # identical except for WHO points at them — the in-edge subject is
    # a ground term, so it separates the two
    assert canon["_:p"] != canon["_:q"]


def test_parallelism_independence(spark):
    rows = [
        ("_:a", "p/next", "_:b", "", "", "iri"),
        ("_:b", "p/next", "_:a", "", "", "iri"),
        ("_:a", "p/val", "x", "", "", "literal"),
    ]
    one = canonical_blank_labels(_df(spark, rows).coalesce(1))
    many = canonical_blank_labels(_df(spark, rows).repartition(7))
    assert {tuple(r) for r in one.collect()} == {tuple(r) for r in many.collect()}
