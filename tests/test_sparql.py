"""SPARQL SELECT algebra (operators/sparql.py): filter compiler
semantics, OPTIONAL null preservation, UNION variable typing, VALUES
restriction, and the error surface.  The three driver queries are
pinned against independent goldens by test_oracle_parity; these tests
pin the algebra on a tiny hand-written graph where every expected row
is enumerable by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turtle_spark.operators.sparql import (
    compile_filter,
    sparql_construct,
    sparql_select,
    sparql_union,
)

_COLS = "subject string, predicate string, object string, label string, datatype string, objecttype string"


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        ("e/a", "p/name", "Alice", "", "", "literal"),
        ("e/a", "p/mbox", "mailto:a@x", "", "", "iri"),
        ("e/a", "p/knows", "e/b", "", "", "iri"),
        ("e/b", "p/name", "Bo", "", "", "literal"),
        ("e/b", "p/knows", "e/c", "", "", "iri"),
        ("e/c", "p/name", "Carol", "", "", "literal"),
        ("e/c", "p/age", "33", "", "", "literal"),
        # duplicate triple: bag semantics must keep it
        ("e/a", "p/knows", "e/b", "", "", "iri"),
    ]
    return spark.createDataFrame(rows, _COLS)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_optional_preserves_unmatched(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?n")],
        optionals=[[("?s", "p/mbox", "?m")]],
    )
    got = _rows(out)
    assert ("e/a", "Alice", "mailto:a@x") in got
    assert ("e/b", "Bo", None) in got  # left join kept the row
    assert ("e/c", "Carol", None) in got


def test_optional_disconnected_refused(tiny):
    with pytest.raises(ValueError, match="shares no variable"):
        sparql_select(
            tiny,
            patterns=[("?s", "p/name", "?n")],
            optionals=[[("?x", "p/age", "?v")]],
        )


def test_filter_bound_after_optional(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?n")],
        optionals=[[("?s", "p/mbox", "?m")]],
        filters=["BOUND(?m) || STRLEN(?n) >= 5"],
    )
    got = _rows(out)
    assert ("e/a", "Alice", "mailto:a@x") in got
    assert ("e/c", "Carol", None) in got
    assert all(r[0] != "e/b" for r in got)  # "Bo" unbound + short


def test_filter_operators(tiny):
    names = sparql_select(tiny, [("?s", "p/name", "?n")])
    keep = names.where(compile_filter('?n != "Bo" && !CONTAINS(?n, "ol")', {"s", "n"}))
    assert _rows(keep.select("n")) == [("Alice",)]
    # numeric comparison casts both sides to double
    ages = sparql_select(tiny, [("?s", "p/age", "?v")])
    assert ages.where(compile_filter("?v > 32.5", {"s", "v"})).count() == 1
    assert ages.where(compile_filter("?v > 33", {"s", "v"})).count() == 0
    # string functions
    assert names.where(
        compile_filter('STRSTARTS(?n, "Al") || STRENDS(?n, "rol")', {"n"})
    ).count() == 2
    assert names.where(compile_filter('REGEX(?n, "^[A-C]o")', {"n"})).count() == 1


def test_filter_errors():
    with pytest.raises(ValueError, match="unbound variable"):
        compile_filter("?nope = 'x'", {"n"})
    with pytest.raises(ValueError, match="bad FILTER syntax"):
        compile_filter("?n = @", {"n"})
    with pytest.raises(ValueError, match="non-boolean"):
        compile_filter("?n", {"n"})
    with pytest.raises(ValueError, match="string literal"):
        compile_filter("CONTAINS(?n, ?n)", {"n"})


def test_values_restricts(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?a", "p/knows", "?b")],
        values={"a": ["e/a", "e/zzz"]},
    )
    # bag semantics: the duplicated knows triple stays duplicated
    assert _rows(out) == [("e/a", "e/b"), ("e/a", "e/b")]
    with pytest.raises(ValueError, match="never bound"):
        sparql_select(tiny, [("?a", "p/knows", "?b")], values={"z": ["x"]})


def test_union_nulls_missing_vars(tiny):
    a = sparql_select(tiny, [("?x", "p/mbox", "?m")])
    b = sparql_select(tiny, [("?x", "p/age", "?age")])
    u = sparql_union([a, b])
    got = _rows(u.select("x", "m", "age"))
    assert ("e/a", "mailto:a@x", None) in got
    assert ("e/c", None, "33") in got
    assert len(got) == 2


def test_group_by_aggregates(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?a", "p/knows", "?b")],
        group_by=["a"],
        aggregates={
            "n": ("count", None),
            "nd": ("count_distinct", "b"),
            "first_b": ("min", "b"),
        },
    )
    got = {r["a"]: (r["n"], r["nd"], r["first_b"]) for r in out.collect()}
    assert got == {"e/a": (2, 1, "e/b"), "e/b": (1, 1, "e/c")}


def test_sum_avg_group_concat_sample(tiny):
    # name lengths per subject prefix: numeric aggregates over the
    # lexical form, decimal-exact sum, deterministic avg.
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?n")],
        aggregates={
            "total_age": ("sum", "n"),  # non-numeric → NULL sum
            "names": ("group_concat", "n", "|"),
            "one": ("sample", "n"),
        },
    )
    row = out.collect()[0]
    assert row["total_age"] is None  # lexical non-numerics cast to NULL
    assert row["names"] == "Alice|Bo|Carol"  # sorted, engine-deterministic
    assert row["one"] == "Alice"  # SAMPLE = MIN, deterministic

    ages = sparql_select(
        tiny,
        patterns=[("?s", "p/age", "?v")],
        aggregates={"s": ("sum", "v"), "m": ("avg", "v")},
    ).collect()[0]
    assert float(ages["s"]) == 33.0
    assert ages["m"] == 33.0


def test_having_filters_aggregate_output(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?a", "p/knows", "?b")],
        group_by=["a"],
        aggregates={"n": ("count", None)},
        having=["?n > 1"],
    )
    got = {r["a"]: r["n"] for r in out.collect()}
    assert got == {"e/a": 2}  # bag semantics: duplicate triple counts


def test_having_without_aggregates_refused(tiny):
    with pytest.raises(ValueError, match="HAVING requires aggregates"):
        sparql_select(tiny, [("?a", "p/knows", "?b")], having=["?a > 1"])


def test_arithmetic_in_filter(tiny):
    # 33 * 2 - 6 = 60; precedence: mul binds tighter than add
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/age", "?v")],
        filters=["?v * 2 - 6 = 60", "?v / 2 > 16", "-?v < 0"],
    )
    assert _rows(out) == [("e/c", "33")]
    none = sparql_select(
        tiny, [("?s", "p/age", "?v")], filters=["(?v + 1) * 2 = 60"]
    )
    assert none.count() == 0


def test_bind_expressions(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?n")],
        bind={
            "nlen": "STRLEN(?n)",
            "shout": "CONCAT(UCASE(?n), '!')",
            "size": "IF(?nlen >= 5, 'long', 'short')",
            "initial": "SUBSTR(?n, 1, 1)",
            "local": "STRAFTER(?s, 'e/')",
            "rest": "SUBSTR(?n, 2)",
        },
        project=["n", "nlen", "shout", "size", "initial", "local", "rest"],
    )
    got = {r["n"]: r for r in out.collect()}
    assert got["Alice"]["nlen"] == 5.0 or got["Alice"]["nlen"] == 5
    assert got["Alice"]["shout"] == "ALICE!"
    assert got["Alice"]["size"] == "long"
    assert got["Bo"]["size"] == "short"
    assert got["Carol"]["initial"] == "C"
    assert got["Bo"]["local"] == "b"
    assert got["Carol"]["rest"] == "arol"


def test_bind_feeds_filter_and_groupby(tiny):
    # FILTER sees the bound variable; GROUP BY groups on it
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?n")],
        bind={"size": "IF(STRLEN(?n) >= 5, 'long', 'short')"},
        filters=["?size = 'long'"],
        group_by=["size"],
        aggregates={"cnt": ("count", None)},
    )
    assert [(r["size"], r["cnt"]) for r in out.collect()] == [("long", 2)]


def test_coalesce_over_optional(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?n")],
        optionals=[[("?s", "p/mbox", "?m")]],
        bind={"contact": "COALESCE(?m, 'none')"},
        project=["s", "contact"],
    )
    got = dict(_rows(out))
    assert got == {"e/a": "mailto:a@x", "e/b": "none", "e/c": "none"}


def test_strbefore_strafter_replace(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/mbox", "?m")],
        bind={
            "scheme": "STRBEFORE(?m, ':')",
            "addr": "STRAFTER(?m, ':')",
            "masked": "REPLACE(?m, '[a-z]@', '*@')",
            "missing": "STRBEFORE(?m, 'zzz')",  # absent -> ''
            "empty_sep": "STRAFTER(?m, '')",  # spec: identity
        },
    )
    r = out.collect()[0]
    assert (r["scheme"], r["addr"]) == ("mailto", "a@x")
    assert r["masked"] == "mailto:*@x"
    assert r["missing"] == ""
    assert r["empty_sep"] == "mailto:a@x"


def test_numeric_functions(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/age", "?v")],
        bind={
            "half_up": "CEIL(?v / 2)",
            "half_down": "FLOOR(?v / 2)",
            "dist": "ABS(30 - ?v)",
        },
    )
    r = out.collect()[0]
    assert (r["half_up"], r["half_down"], r["dist"]) == (17.0, 16.0, 3.0)


def test_bind_rebind_refused(tiny):
    with pytest.raises(ValueError, match="rebind"):
        sparql_select(
            tiny, [("?s", "p/name", "?n")], bind={"n": "UCASE(?n)"}
        )


def test_non_boolean_filter_refused(tiny):
    with pytest.raises(ValueError, match="non-boolean"):
        sparql_select(tiny, [("?s", "p/name", "?n")], filters=["?n + 1"])


def test_replace_dynamic_pattern_refused(tiny):
    with pytest.raises(ValueError, match="string literal"):
        sparql_select(
            tiny,
            [("?s", "p/name", "?n")],
            bind={"x": "REPLACE(?n, ?n, 'y')"},
        )


def test_distinct(tiny):
    out = sparql_select(tiny, [("?a", "p/knows", "?b")], distinct=True)
    assert _rows(out) == [("e/a", "e/b"), ("e/b", "e/c")]


def test_construct_template(tiny):
    out = sparql_construct(
        tiny,
        patterns=[("?a", "p/knows", "?b", "iri")],
        template=[
            ("?b", "p/knownBy", "?a"),
            ("?a", "p/status", ("literal", "social")),
        ],
    )
    got = _rows(out)
    # set semantics: the duplicated knows triple constructs once
    assert got == sorted(
        [
            ("e/b", "p/knownBy", "e/a", "", "", "iri"),
            ("e/c", "p/knownBy", "e/b", "", "", "iri"),
            ("e/a", "p/status", "social", "", "", "literal"),
            ("e/b", "p/status", "social", "", "", "literal"),
        ]
    )


def test_construct_errors(tiny):
    with pytest.raises(ValueError, match="not IRI-safe"):
        sparql_construct(
            tiny,
            patterns=[("?s", "p/name", "?n")],  # ?n may bind literals
            template=[("?s", "p/alias", "?n")],
        )
    with pytest.raises(ValueError, match="never bound"):
        sparql_construct(
            tiny, patterns=[("?s", "p/name", "?n")], template=[("?z", "p/x", "?s")]
        )
    with pytest.raises(ValueError, match="only valid in object"):
        sparql_construct(
            tiny,
            patterns=[("?s", "p/name", "?n")],
            template=[(("literal", "x"), "p/x", "?s")],
        )


def test_ask(tiny):
    from turtle_spark.operators.sparql import sparql_ask

    assert sparql_ask(tiny, [("?s", "p/knows", "e/b")])
    assert not sparql_ask(tiny, [("?s", "p/knows", "e/nobody")])
    assert sparql_ask(
        tiny, [("?s", "p/name", "?n")], filters=['STRSTARTS(?n, "Car")']
    )


def test_describe_expands_blank_chain(spark):
    from turtle_spark.operators.sparql import sparql_describe

    rows = [
        ("e/x", "p/a", "_:b0", "", "", "iri"),
        ("e/x", "p/n", "seed lit", "", "", "literal"),
        ("_:b0", "p/first", "one", "", "", "literal"),
        ("_:b0", "p/rest", "_:b1", "", "", "iri"),
        ("_:b1", "p/first", "two", "", "", "literal"),
        ("e/y", "p/n", "other", "", "", "literal"),  # not described
        ("e/x", "p/a", "_:b0", "", "", "iri"),  # duplicate: set view
    ]
    df = spark.createDataFrame(rows, _COLS)
    desc = sparql_describe(df, ["e/x"])
    got = _rows(desc)
    assert ("e/y", "p/n", "other", "", "", "literal") not in got
    assert len(got) == 5  # 2 seed triples + 2 b0 + 1 b1, deduped
    assert ("_:b1", "p/first", "two", "", "", "literal") in got

    # depth cap: 0 blank levels = only the seed's own triples
    shallow = _rows(sparql_describe(df, ["e/x"], max_blank_depth=0))
    assert len(shallow) == 2


def test_optional_plan_is_left_hash_join(tiny):
    plan = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?n")],
        optionals=[[("?s", "p/mbox", "?m")]],
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftOuter" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_minus_removes_compatible(tiny):
    # a and b have knows-edges; only Carol's name survives MINUS
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?name")],
        minus=[[("?s", "p/knows", "?o")]],
    )
    assert _rows(out.select("s", "name")) == [("e/c", "Carol")]


def test_minus_disjoint_domain_is_noop(tiny):
    # SPARQL spec: MINUS sharing no variable removes nothing
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?name")],
        minus=[[("?x", "p/age", "?y")]],
    )
    assert len(_rows(out)) == 3


def test_minus_null_shared_var_never_matches(tiny):
    # OPTIONAL leaves ?m NULL for Bo/Carol; MINUS on ?m must remove
    # only Alice (whose bound mbox equi-matches), never the NULLs
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?name")],
        optionals=[[("?s", "p/mbox", "?m")]],
        minus=[[("?x", "p/mbox", "?m")]],
    )
    assert _rows(out.select("s", "name")) == [("e/b", "Bo"), ("e/c", "Carol")]


def test_exists_keeps_bag_multiplicity_once_per_row(tiny):
    # base bag: (a,b) twice (duplicate triple), (b,c) once; EXISTS on
    # mbox keeps only ?s=e/a rows — each left row once, duplicates
    # preserved as left-side multiplicity, never multiplied by matches
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/knows", "?o")],
        exists=[[("?s", "p/mbox", "?m")]],
    )
    assert _rows(out.select("s", "o")) == [("e/a", "e/b"), ("e/a", "e/b")]


def test_not_exists_filters(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?name")],
        not_exists=[[("?s", "p/knows", "?o")]],
    )
    assert _rows(out.select("s", "name")) == [("e/c", "Carol")]


def test_exists_disconnected_refused(tiny):
    with pytest.raises(ValueError, match="EXISTS group shares no variable"):
        sparql_select(
            tiny,
            patterns=[("?s", "p/name", "?name")],
            exists=[[("?x", "p/age", "?y")]],
        ).collect()


def test_negation_plans_are_anti_semi_joins(tiny):
    plan = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?name")],
        minus=[[("?s", "p/knows", "?o")]],
        exists=[[("?s", "p/mbox", "?m")]],
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_subquery_topk_joins_back(tiny):
    # subselect: knows out-degree per subject (bag: e/a has 2 via the
    # duplicate triple, e/b has 1), ORDER BY deg DESC, s ASC LIMIT 1
    # -> {e/a: 2}; outer joins every knows occurrence of e/a back
    top = sparql_select(
        tiny,
        patterns=[("?s", "p/knows", "?x")],
        group_by=["s"],
        aggregates={"deg": ("count", None)},
        order_by=["-?deg", "?s"],
        limit=1,
    )
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/knows", "?o")],
        subqueries=[top],
        project=["s", "o", "deg"],
    )
    assert _rows(out) == [("e/a", "e/b", 2), ("e/a", "e/b", 2)]


def test_subquery_disconnected_refused(tiny):
    sub = sparql_select(
        tiny, patterns=[("?x", "p/age", "?v")], project=["v"]
    )
    with pytest.raises(ValueError, match="subquery shares no variable"):
        sparql_select(
            tiny, patterns=[("?s", "p/name", "?n")], subqueries=[sub]
        )


def test_order_limit_offset_page(tiny):
    out = sparql_select(
        tiny,
        patterns=[("?s", "p/name", "?n")],
        order_by=["?n"],
        offset=1,
        limit=1,
    )
    assert _rows(out) == [("e/b", "Bo")]


def test_order_by_desc(tiny):
    out = sparql_select(
        tiny, patterns=[("?s", "p/name", "?n")], order_by=["-?n"], limit=1
    )
    assert _rows(out) == [("e/c", "Carol")]


def test_limit_without_order_refused(tiny):
    with pytest.raises(ValueError, match="nondeterministic"):
        sparql_select(tiny, patterns=[("?s", "p/name", "?n")], limit=2)


def test_order_limit_is_take_ordered_not_global_sort(tiny):
    plan = (
        sparql_select(
            tiny,
            patterns=[("?s", "p/name", "?n")],
            order_by=["?n"],
            limit=2,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# --- SPARQL 1.1 UPDATE (DELETE/INSERT WHERE) --------------------------------


def _graph(df):
    return {tuple(r) for r in df.collect()}


def test_update_delete_insert_rewrites_edge(tiny):
    from turtle_spark.operators.sparql import sparql_update

    out = sparql_update(
        tiny,
        where=[("?a", "p/knows", "?b", "iri")],
        delete=[("?a", "p/knows", "?b")],
        insert=[("?b", "p/knownBy", "?a")],
    )
    got = _graph(out)
    assert ("e/a", "p/knows", "e/b", "", "", "iri") not in got
    assert ("e/b", "p/knows", "e/c", "", "", "iri") not in got
    assert ("e/b", "p/knownBy", "e/a", "", "", "iri") in got
    assert ("e/c", "p/knownBy", "e/b", "", "", "iri") in got
    # untouched triples survive; output is a SET (dup knows collapsed
    # into the deleted edge anyway)
    assert ("e/a", "p/name", "Alice", "", "", "literal") in got


def test_update_delete_only(tiny):
    from turtle_spark.operators.sparql import sparql_update

    out = sparql_update(
        tiny,
        where=[("?s", "p/age", "?v")],
        delete=[("?s", "p/age", "?v")],
    )
    got = _graph(out)
    assert not any(t[1] == "p/age" for t in got)
    # set semantics: base had 8 rows incl. one duplicate -> 7 distinct,
    # minus the one deleted
    assert len(got) == 6


def test_update_insert_only_is_union(tiny):
    from turtle_spark.operators.sparql import sparql_update

    out = sparql_update(
        tiny,
        where=[("?s", "p/mbox", "?m", "iri")],
        insert=[("?s", "rdf/type", "ex/Contactable")],
    )
    got = _graph(out)
    assert ("e/a", "rdf/type", "ex/Contactable", "", "", "iri") in got
    assert len(got) == 8  # 7 distinct base + 1 inserted


def test_update_delete_then_reinsert_survives(tiny):
    """Spec §3.1.3: deletes apply before inserts, so a triple both
    deleted and re-inserted stays in the store."""
    from turtle_spark.operators.sparql import sparql_update

    out = sparql_update(
        tiny,
        where=[("?a", "p/knows", "?b", "iri")],
        delete=[("?a", "p/knows", "?b")],
        insert=[("?a", "p/knows", "?b")],
    )
    assert ("e/a", "p/knows", "e/b", "", "", "iri") in _graph(out)


def test_update_requires_a_template(tiny):
    from turtle_spark.operators.sparql import sparql_update

    with pytest.raises(ValueError, match="at least one"):
        sparql_update(tiny, where=[("?s", "p/name", "?n")])
