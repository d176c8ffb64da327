"""Direct mapping (operators/rdb2rdf.py) unit tests.

Full-value cross-engine parity for ``q_direct_map`` is covered by
tests/test_oracle_parity.py (plain-SQL oracle, DuckDB recomputes every
lexical form); these tests pin the mapping semantics the W3C rec
specifies — NULL suppression, FK-column literal exclusion, per-row
triple counts — and the plan shape (no shuffle before the sink).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def mapped(spark):
    from turtle_spark.operators.rdb2rdf import Ref, direct_map

    df = spark.createDataFrame(
        [
            (1, "alpha", 10, 3.5),
            (2, None, 20, None),
            (3, "gamma", None, 1.25),
        ],
        "id bigint, name string, fk int, score double",
    )
    out = direct_map(
        df,
        table="t",
        base="http://ex.dev/",
        pk="id",
        literals=[
            ("id", "integer", None),
            ("name", "string", None),
            ("score", "decimal", F.col("score").cast("decimal(10,2)").cast("string")),
        ],
        refs=[Ref("fk", "u", "u_id")],
    )
    return out, sorted(
        (r.subject, r.predicate, r.object, r.objecttype, r.datatype)
        for r in out.collect()
    )


def test_row_node_and_class_triples(mapped):
    _, rows = mapped
    types = [r for r in rows if r[1].endswith("#type")]
    assert len(types) == 3
    assert types[0][0] == "http://ex.dev/t/id=1"
    assert all(r[2] == "http://ex.dev/t" and r[3] == "iri" for r in types)


def test_null_columns_emit_no_triple(mapped):
    _, rows = mapped
    by_subj = {}
    for r in rows:
        by_subj.setdefault(r[0], []).append(r)
    # row 1: type + id + name + score + ref = 5
    assert len(by_subj["http://ex.dev/t/id=1"]) == 5
    # row 2: name/score NULL -> type + id + ref = 3
    assert len(by_subj["http://ex.dev/t/id=2"]) == 3
    # row 3: fk NULL -> type + id + name + score = 4
    assert len(by_subj["http://ex.dev/t/id=3"]) == 4


def test_ref_triple_targets_referenced_row_node(mapped):
    _, rows = mapped
    refs = [r for r in rows if r[1] == "http://ex.dev/t#ref-fk"]
    assert [(r[0], r[2]) for r in refs] == [
        ("http://ex.dev/t/id=1", "http://ex.dev/u/u_id=10"),
        ("http://ex.dev/t/id=2", "http://ex.dev/u/u_id=20"),
    ]
    assert all(r[3] == "iri" and r[4] is None for r in refs)


def test_literal_lexical_forms_and_datatypes(mapped):
    _, rows = mapped
    lits = {(r[0], r[1]): (r[2], r[4]) for r in rows if r[3] == "literal"}
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert lits[("http://ex.dev/t/id=1", "http://ex.dev/t#score")] == (
        "3.50",
        xsd + "decimal",
    )
    assert lits[("http://ex.dev/t/id=1", "http://ex.dev/t#id")] == (
        "1",
        xsd + "integer",
    )
    assert lits[("http://ex.dev/t/id=3", "http://ex.dev/t#name")] == (
        "gamma",
        xsd + "string",
    )


def test_mapping_is_shuffle_free(mapped):
    out, _ = mapped
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
