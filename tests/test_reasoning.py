"""RDFS entailment (operators/reasoning.py).

Ground truths: hand-checkable micro-KGs per rule, plus an independent
semi-naive Python fixpoint (apply ALL rules to saturation, no
stratification) — if the engine's stratified one-pass-per-stratum
evaluation were incomplete, the differential would catch it.
"""

from __future__ import annotations

from turtle_spark.operators.reasoning import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    alignment_schema,
    rdfs_entail,
)

COLS = ("subject", "predicate", "object", "label", "datatype", "objecttype")
SCHEMA_DDL = (
    "subject string, predicate string, object string, "
    "label string, datatype string, objecttype string"
)


def _df(spark, rows):
    data = [
        (s, p, o, "", "", "literal" if o.startswith('"') else "iri")
        for s, p, o in rows
    ]
    return spark.createDataFrame(data, SCHEMA_DDL)


def _set(df):
    return {tuple(r[c] for c in COLS) for r in df.collect()}


def test_rdfs7_subproperty_statement_inheritance(spark):
    triples = _df(spark, [("x", "hasDog", "y"), ("x", "name", '"rex"')])
    schema = _df(
        spark,
        [("hasDog", RDFS_SUBPROP, "hasPet"), ("hasPet", RDFS_SUBPROP, "owns")],
    )
    got = _set(rdfs_entail(triples, schema))
    # transitivity (rdfs5) carries hasDog all the way to owns
    assert got == {
        ("x", "hasPet", "y", "", "", "iri"),
        ("x", "owns", "y", "", "", "iri"),
    }


def test_rdfs7_preserves_literal_annotations(spark):
    triples = spark.createDataFrame(
        [("x", "label_fr", "chien", "fr", "", "literal")], SCHEMA_DDL
    )
    schema = _df(spark, [("label_fr", RDFS_SUBPROP, "label")])
    got = _set(rdfs_entail(triples, schema))
    assert got == {("x", "label", "chien", "fr", "", "literal")}


def test_rdfs9_class_inheritance_and_rdfs11_transitivity(spark):
    triples = _df(spark, [("rex", RDF_TYPE, "Dog")])
    schema = _df(
        spark,
        [("Dog", RDFS_SUBCLASS, "Mammal"), ("Mammal", RDFS_SUBCLASS, "Animal")],
    )
    got = _set(rdfs_entail(triples, schema))
    assert got == {
        ("rex", RDF_TYPE, "Mammal", "", "", "iri"),
        ("rex", RDF_TYPE, "Animal", "", "", "iri"),
    }


def test_rdfs2_rdfs3_domain_range(spark):
    triples = _df(spark, [("x", "employs", "y"), ("x", "ceo", '"ann"')])
    schema = _df(
        spark,
        [
            ("employs", RDFS_DOMAIN, "Company"),
            ("employs", RDFS_RANGE, "Person"),
            ("ceo", RDFS_RANGE, "Person"),  # literal object: no range typing
        ],
    )
    got = _set(rdfs_entail(triples, schema))
    assert got == {
        ("x", RDF_TYPE, "Company", "", "", "iri"),
        ("y", RDF_TYPE, "Person", "", "", "iri"),
    }


def test_strata_chain_7_then_2_then_9(spark):
    """A statement only reaches its domain typing through rdfs7, and
    the typing only reaches the superclass through rdfs9 — the full
    stratified chain."""
    triples = _df(spark, [("x", "hasDog", "y")])
    schema = _df(
        spark,
        [
            ("hasDog", RDFS_SUBPROP, "hasPet"),
            ("hasPet", RDFS_DOMAIN, "PetOwner"),
            ("PetOwner", RDFS_SUBCLASS, "Person"),
        ],
    )
    got = _set(rdfs_entail(triples, schema))
    assert got == {
        ("x", "hasPet", "y", "", "", "iri"),
        ("x", RDF_TYPE, "PetOwner", "", "", "iri"),
        ("x", RDF_TYPE, "Person", "", "", "iri"),
    }


def test_asserted_triples_never_in_delta(spark):
    triples = _df(
        spark, [("rex", RDF_TYPE, "Dog"), ("rex", RDF_TYPE, "Mammal")]
    )
    schema = _df(spark, [("Dog", RDFS_SUBCLASS, "Mammal")])
    assert _set(rdfs_entail(triples, schema)) == set()


def test_alignment_schema_groups_by_local_name(spark):
    triples = _df(
        spark,
        [
            ("a", "http://x.org/ns#note", '"n1"'),
            ("b", "http://y.org/v1/note", '"n2"'),
            ("c", "http://z.org/other", '"n3"'),
            ("s", RDF_TYPE, "http://x.org/ns#Entity"),
            ("t", RDF_TYPE, "http://y.org/v1/Entity"),
        ],
    )
    got = _set(alignment_schema(triples))
    assert got == {
        # min("http://x.org/ns#note", "http://y.org/v1/note") is x.org
        ("http://y.org/v1/note", RDFS_SUBPROP, "http://x.org/ns#note", "", "", "iri"),
        ("http://y.org/v1/Entity", RDFS_SUBCLASS, "http://x.org/ns#Entity", "", "", "iri"),
    }


def test_alignment_excludes_rdf_machinery(spark):
    rdf_first = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
    triples = _df(
        spark,
        [("a", rdf_first, "b"), ("c", "http://x.org/first", "d")],
    )
    # only one non-rdf predicate named 'first' -> no group of 2 -> empty
    assert _set(alignment_schema(triples)) == set()


def test_semi_naive_differential(spark):
    """Deterministic pseudo-random KG + schema: stratified engine
    output == brute-force apply-until-fixpoint over Python sets."""
    rows, schema_rows = [], []
    for i in range(40):
        rows.append((f"e{i}", f"p{i % 7}", f"e{(i * 3 + 1) % 40}"))
        if i % 5 == 0:
            rows.append((f"e{i}", RDF_TYPE, f"C{i % 4}"))
    for i in range(6):
        schema_rows.append((f"p{i}", RDFS_SUBPROP, f"p{i + 1}"))
    schema_rows += [
        ("C0", RDFS_SUBCLASS, "C1"),
        ("C1", RDFS_SUBCLASS, "C2"),
        ("p3", RDFS_DOMAIN, "C0"),
        ("p5", RDFS_RANGE, "C3"),
        ("C3", RDFS_SUBCLASS, "C2"),
    ]
    triples, schema = _df(spark, rows), _df(spark, schema_rows)
    got = _set(rdfs_entail(triples, schema))

    # independent: semi-naive saturation, all rules every round
    sub_prop = {(s, o) for s, p, o in schema_rows if p == RDFS_SUBPROP}
    sub_cls = {(s, o) for s, p, o in schema_rows if p == RDFS_SUBCLASS}
    dom = {(s, o) for s, p, o in schema_rows if p == RDFS_DOMAIN}
    rng = {(s, o) for s, p, o in schema_rows if p == RDFS_RANGE}
    facts = {(s, p, o) for s, p, o in rows}
    while True:
        new = set()
        # transitive closures, naive
        for a, b in list(sub_prop):
            for c, d in list(sub_prop):
                if b == c:
                    sub_prop = sub_prop | {(a, d)}
        for a, b in list(sub_cls):
            for c, d in list(sub_cls):
                if b == c:
                    sub_cls = sub_cls | {(a, d)}
        for s, p, o in facts:
            for a, b in sub_prop:
                if p == a:
                    new.add((s, b, o))
            for a, b in dom:
                if p == a:
                    new.add((s, RDF_TYPE, b))
            for a, b in rng:
                if p == a:
                    new.add((o, RDF_TYPE, b))
            if p == RDF_TYPE:
                for a, b in sub_cls:
                    if o == a:
                        new.add((s, RDF_TYPE, b))
        if new <= facts:
            break
        facts |= new
    expect = {
        (s, p, o, "", "", "iri")
        for s, p, o in facts - {(s, p, o) for s, p, o in rows}
    }
    assert got == expect


# --- OWL 2 RL property rules (owl_property_entail) --------------------------


def _owl():
    from turtle_spark.operators.reasoning import (
        OWL_INVERSE,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
        owl_property_entail,
    )

    return OWL_INVERSE, OWL_SYMMETRIC, OWL_TRANSITIVE, owl_property_entail


def _owl_set(df):
    return {
        (r["rule"], r["subject"], r["predicate"], r["object"]) for r in df.collect()
    }


def test_owl_inverse_both_directions(spark):
    OWL_INVERSE, _, _, owl_property_entail = _owl()
    triples = _df(spark, [("x", "hasPart", "y"), ("a", "partOf", "b")])
    schema = _df(spark, [("hasPart", OWL_INVERSE, "partOf")])
    got = _owl_set(owl_property_entail(triples, schema))
    assert got == {
        ("prp-inv1", "y", "partOf", "x"),
        ("prp-inv2", "b", "hasPart", "a"),
    }


def test_owl_symmetric_flip(spark):
    _, OWL_SYMMETRIC, _, owl_property_entail = _owl()
    triples = _df(spark, [("x", "marriedTo", "y")])
    schema = _df(spark, [("marriedTo", RDF_TYPE, OWL_SYMMETRIC)])
    got = _owl_set(owl_property_entail(triples, schema))
    assert got == {("prp-symp", "y", "marriedTo", "x")}


def test_owl_transitive_chain(spark):
    _, _, OWL_TRANSITIVE, owl_property_entail = _owl()
    triples = _df(
        spark,
        [("a", "within", "b"), ("b", "within", "c"), ("c", "within", "d")],
    )
    schema = _df(spark, [("within", RDF_TYPE, OWL_TRANSITIVE)])
    got = _owl_set(owl_property_entail(triples, schema))
    # closure minus the asserted chain edges
    assert got == {
        ("prp-trp", "a", "within", "c"),
        ("prp-trp", "a", "within", "d"),
        ("prp-trp", "b", "within", "d"),
    }


def test_owl_asserted_triples_subtracted(spark):
    _, OWL_SYMMETRIC, _, owl_property_entail = _owl()
    triples = _df(spark, [("x", "knows", "y"), ("y", "knows", "x")])
    schema = _df(spark, [("knows", RDF_TYPE, OWL_SYMMETRIC)])
    assert _owl_set(owl_property_entail(triples, schema)) == set()


def test_owl_literal_objects_never_flip(spark):
    _, OWL_SYMMETRIC, _, owl_property_entail = _owl()
    triples = _df(spark, [("x", "note", '"hello"')])
    schema = _df(spark, [("note", RDF_TYPE, OWL_SYMMETRIC)])
    assert _owl_set(owl_property_entail(triples, schema)) == set()


def test_owl_chain_entail_grandparent(spark):
    from turtle_spark.operators.reasoning import owl_chain_entail

    rows = [
        ("a", "urn:parent", "b", "", "", "iri"),
        ("b", "urn:parent", "c", "", "", "iri"),
        ("b", "urn:parent", "d", "", "", "iri"),
        ("x", "urn:parent", "y", "", "", "iri"),
        # already asserted: must NOT reappear in the delta
        ("a", "urn:grandparent", "c", "", "", "iri"),
    ]
    t = spark.createDataFrame(
        rows,
        "subject string, predicate string, object string, label string,"
        " datatype string, objecttype string",
    )
    out = {
        (r["subject"], r["predicate"], r["object"])
        for r in owl_chain_entail(
            t, [("urn:grandparent", "urn:parent", "urn:parent")]
        ).collect()
    }
    assert out == {("a", "urn:grandparent", "d")}


def test_owl_chain_entail_two_chains_and_literals_ignored(spark):
    from turtle_spark.operators.reasoning import owl_chain_entail

    rows = [
        ("a", "urn:p", "b", "", "", "iri"),
        ("b", "urn:q", "c", "", "", "iri"),
        ("b", "urn:q", "lit", "x", "", "literal"),  # literal mid/object ignored
    ]
    t = spark.createDataFrame(
        rows,
        "subject string, predicate string, object string, label string,"
        " datatype string, objecttype string",
    )
    out = sorted(
        (r["predicate"], r["subject"], r["object"])
        for r in owl_chain_entail(
            t,
            [("urn:pq", "urn:p", "urn:q"), ("urn:qp", "urn:q", "urn:p")],
        ).collect()
    )
    assert out == [("urn:pq", "a", "c")]
    assert all(r[0] != "urn:qp" for r in out)
