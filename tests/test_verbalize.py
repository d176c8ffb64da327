"""KG verbalization (operators/verbalize.py): exact text assembly,
fact ordering, set semantics, and the max_facts cap."""

from __future__ import annotations

from turtle_spark.operators.verbalize import verbalize_entities

_COLS = "subject string, predicate string, object string, label string, datatype string, objecttype string"


def test_sentence_assembly_and_cap(spark):
    rows = [
        ("http://x/Ada_Lovelace", "http://x/ns#field", "http://x/Computer_science", "", "", "iri"),
        ("http://x/Ada_Lovelace", "http://x/ns#born", "1815", "", "", "literal"),
        ("http://x/Ada_Lovelace", "http://x/ns#born", "1815", "", "", "literal"),  # dup: set view
        ("http://x/Ada_Lovelace", "http://x/ns#award", "a prize", "", "", "literal"),
    ]
    df = spark.createDataFrame(rows, _COLS)
    out = {r.subject: r for r in verbalize_entities(df).collect()}
    r = out["http://x/Ada_Lovelace"]
    # facts sorted by (predicate, object): award < born < field
    assert r.text == (
        'Ada Lovelace award "a prize". '
        'Ada Lovelace born "1815". '
        "Ada Lovelace field Computer science."
    )
    assert (r.n_facts, r.n_total_facts, r.n_tokens) == (3, 3, 14)

    capped = {
        r.subject: r for r in verbalize_entities(df, max_facts=1).collect()
    }["http://x/Ada_Lovelace"]
    assert capped.n_facts == 1 and capped.n_total_facts == 3
    assert capped.text == 'Ada Lovelace award "a prize".'


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(
        [("s", "p", "o", "", "", "iri")], _COLS
    )
    plan = (
        verbalize_entities(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan
