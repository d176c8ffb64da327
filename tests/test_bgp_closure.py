"""Unit tests for the BGP query compiler (operators/bgp.py) and the
path-doubling transitive closure (operators/graph.py); driver-level
oracle parity is covered by test_oracle_parity.py via corpus goldens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turtle_spark.operators.bgp import bgp_select
from turtle_spark.operators.graph import transitive_closure

TRIPLE_SCHEMA = (
    "subject string, predicate string, object string, "
    "label string, datatype string, objecttype string"
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, "", "", t) for s, p, o, t in rows], TRIPLE_SCHEMA
    )


@pytest.fixture()
def kg(spark):
    return _triples(
        spark,
        [
            ("a", RDF_TYPE, "Person", "iri"),
            ("b", RDF_TYPE, "Person", "iri"),
            ("c", RDF_TYPE, "Robot", "iri"),
            ("a", "knows", "b", "iri"),
            ("b", "knows", "c", "iri"),
            ("a", "name", "Alice", "literal"),
            ("b", "name", "Bob", "literal"),
            ("c", "name", "C3PO", "literal"),
        ],
    )


class TestBgpSelect:
    def test_chain_join(self, kg):
        # ?x knows ?y . ?y name ?n  — bindings for (x, n)
        out = bgp_select(
            kg,
            [("?x", "knows", "?y"), ("?y", "name", "?n", "literal")],
            project=["x", "n"],
        )
        assert sorted(map(tuple, out.collect())) == [("a", "Bob"), ("b", "C3PO")]

    def test_constant_object_and_type_pattern(self, kg):
        # ?p a Person . ?p name ?n
        out = bgp_select(
            kg,
            [("?p", RDF_TYPE, "Person"), ("?p", "name", "?n")],
            project=["p", "n"],
        )
        assert sorted(map(tuple, out.collect())) == [("a", "Alice"), ("b", "Bob")]

    def test_bag_semantics_keeps_duplicates(self, spark):
        t = _triples(
            spark,
            [
                ("a", "p", "x", "iri"),
                ("a", "p", "x", "iri"),  # duplicate triple
                ("x", "q", "v", "literal"),
            ],
        )
        out = bgp_select(t, [("?s", "p", "?o"), ("?o", "q", "?v")])
        assert out.count() == 2  # SPARQL bag semantics

    def test_same_var_twice_in_one_pattern(self, spark):
        t = _triples(
            spark,
            [("n1", "self", "n1", "iri"), ("n1", "self", "n2", "iri")],
        )
        out = bgp_select(t, [("?x", "self", "?x")], project=["x"])
        assert [r["x"] for r in out.collect()] == ["n1"]

    def test_cartesian_refused(self, kg):
        with pytest.raises(ValueError, match="cartesian"):
            bgp_select(kg, [("?a", "knows", "?b"), ("?c", "name", "?d")])

    def test_unbound_projection_refused(self, kg):
        with pytest.raises(ValueError, match="never bound"):
            bgp_select(kg, [("?x", "knows", "?y")], project=["z"])

    def test_anchor_pattern_broadcast_no_bnlj(self, kg):
        # 2-constant pattern must broadcast; plan stays equi-join-only
        out = bgp_select(
            kg,
            [("?p", RDF_TYPE, "Person"), ("?p", "name", "?n")],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Broadcast" in plan


class TestTransitiveClosure:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_chain(self, spark):
        e = self._edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        out = sorted(map(tuple, transitive_closure(e).collect()))
        assert out == [
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d"),
        ]

    def test_cycle_yields_self_pairs(self, spark):
        e = self._edges(spark, [("a", "b"), ("b", "a")])
        out = sorted(map(tuple, transitive_closure(e).collect()))
        assert out == [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]

    def test_deep_chain_logarithmic_rounds(self, spark):
        # depth 40 closes within 16 doubling rounds (would need 40 BFS rounds)
        e = self._edges(spark, [(f"n{i}", f"n{i+1}") for i in range(40)])
        out = transitive_closure(e, max_rounds=7)
        assert out.count() == 40 * 41 // 2

    def test_duplicate_edges_collapse(self, spark):
        e = self._edges(spark, [("a", "b"), ("a", "b"), ("b", "c")])
        assert transitive_closure(e).count() == 3

    def test_max_rounds_guard(self, spark):
        e = self._edges(spark, [(f"n{i}", f"n{i+1}") for i in range(10)])
        with pytest.raises(RuntimeError, match="fixpoint"):
            transitive_closure(e, max_rounds=2)


class TestBgpStatsPlanner:
    def _stats(self):
        from turtle_spark.operators.bgp import BgpStats

        # type: 1000 triples / 1000 subjects; email: 500/500;
        # but only 3 subjects carry BOTH (correlated predicates —
        # independence would estimate 1000*500/N)
        return BgpStats(
            pred_stats={
                "type": (1000, 1000, 5),
                "email": (500, 500, 500),
                "knows": (8000, 400, 900),
            },
            char_sets=[
                (frozenset({"type"}), 997),
                (frozenset({"email"}), 497),
                (frozenset({"type", "email"}), 3),
                (frozenset({"type", "email", "knows"}), 1),
            ],
            total_triples=9500,
        )

    def test_star_subjects_sums_supersets(self):
        s = self._stats()
        assert s.star_subjects(frozenset({"type", "email"})) == 4  # 3 + 1
        assert s.star_subjects(frozenset({"email"})) == 501
        assert s.star_subjects(frozenset({"missing"})) == 0

    def test_pattern_card(self):
        s = self._stats()
        assert s.pattern_card(False, "knows", False) == 8000
        assert s.pattern_card(True, "knows", False) == 8000 / 400
        assert s.pattern_card(False, "knows", True) == 8000 / 900
        assert s.pattern_card(False, "absent", False) == 0.0

    def test_stats_order_prefers_small_scan_and_star(self):
        from turtle_spark.operators.bgp import plan_join_order

        metas = [
            ({"s", "o"}, 1, 8000.0, "s", "knows"),   # big scan
            ({"s"}, 2, 1000.0 / 5, "s", "type"),      # type=Person slice
            ({"s", "e"}, 1, 500.0, "s", "email"),     # email scan
        ]
        order = plan_join_order(metas, self._stats())
        # seed = the bounded type slice (est 200); email joins next
        # because the {type,email} star collapses to 4 subjects;
        # the 8000-row knows scan goes last
        assert order == [1, 2, 0]

    def test_no_stats_reproduces_constant_greedy(self):
        from turtle_spark.operators.bgp import plan_join_order

        metas = [
            ({"s", "o"}, 1, 0.0, "s", "knows"),
            ({"s"}, 2, 0.0, "s", "type"),
            ({"s", "e"}, 1, 0.0, "s", "email"),
        ]
        # seed = most constants (pattern 1), then shared-var greedy
        # with constant-count tiebreak -> original order semantics
        assert plan_join_order(metas, None) == [1, 0, 2]

    def test_disconnected_sentinel(self):
        from turtle_spark.operators.bgp import plan_join_order

        metas = [
            ({"a"}, 2, 1.0, None, None),
            ({"b"}, 1, 2.0, None, None),
        ]
        out = plan_join_order(metas, self._stats())
        assert out[-1] < 0

    def test_stats_results_identical_and_broadcast(self, kg):
        from turtle_spark.operators.bgp import BgpStats, bgp_select

        pats = [
            ("?s", "http://x/type", "http://x/Person"),
            ("?s", "http://x/knows", "?o"),
        ]
        plain = bgp_select(kg, pats).collect()
        stats = BgpStats.from_triples(kg)
        with_stats = bgp_select(kg, pats, stats=stats)
        assert sorted(map(tuple, with_stats.collect())) == sorted(map(tuple, plain))
        # everything in the tiny KG is under the broadcast estimate
        assert "BroadcastHashJoin" in with_stats._jdf.queryExecution().executedPlan().toString()

    def test_sketched_stats_match_exact_on_small_graphs(self, kg):
        """HLL-backed stats must agree with exact stats wherever
        cardinalities are far below the sketch's error floor — i.e.
        the whole pred_stats dict on a tiny KG — and must plan the
        same join order (results are order-independent anyway; this
        pins that the 100 TB stats path changes nothing visible)."""
        from turtle_spark.operators.bgp import BgpStats, bgp_select

        exact = BgpStats.from_triples(kg)
        sketched = BgpStats.from_triples_sketched(kg)
        assert sketched.pred_stats == exact.pred_stats
        assert sorted(sketched.char_sets) == sorted(exact.char_sets)
        assert sketched.total_triples == exact.total_triples
        pats = [
            ("?s", RDF_TYPE, "Person"),
            ("?s", "knows", "?o"),
            ("?o", "name", "?n"),
        ]
        a = bgp_select(kg, pats, stats=exact).collect()
        b = bgp_select(kg, pats, stats=sketched).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_sketched_stats_within_envelope_on_wide_graph(self, spark):
        """On a graph with per-predicate cardinality ~2000, HLL
        estimates must land within 5 sigma of exact (1.04/sqrt(4096)
        std error) so the greedy planner sees the right magnitudes."""
        import math

        from turtle_spark.operators.bgp import BgpStats

        n = 2000
        tri = spark.range(0, n).selectExpr(
            "concat('s', id) as subject",
            "'p' as predicate",
            "concat('o', id % 500) as object",
            "'' as label",
            "'' as datatype",
            "'iri' as objecttype",
        )
        st = BgpStats.from_triples_sketched(tri, with_char_sets=False)
        n_t, n_s, n_o = st.pred_stats["p"]
        assert n_t == n
        assert abs(n_s - n) / n < 5 * 1.04 / math.sqrt(4096)
        assert abs(n_o - 500) / 500 < 5 * 1.04 / math.sqrt(4096)
