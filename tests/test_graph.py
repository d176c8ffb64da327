"""Unit tests for the KG graph-analytics operators
(turtle_spark.operators.graph); oracle parity is covered by
test_oracle_parity.py via the corpus goldens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turtle_spark.operators.graph import (
    _SCALE,
    dense_entity_ids,
    entity_edges,
    kg_entities,
    negative_samples,
    pagerank,
    predicate_profile,
)

TRIPLE_SCHEMA = (
    "subject string, predicate string, object string, "
    "label string, datatype string, objecttype string"
)


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, "", "", t) for s, p, o, t in rows], TRIPLE_SCHEMA
    )


class TestPredicateProfile:
    def test_hand_kg(self, spark):
        t = _triples(
            spark,
            [
                ("a", "type", "T", "iri"),
                ("b", "type", "T", "iri"),
                ("a", "knows", "b", "iri"),
                ("a", "knows", "c", "iri"),
                ("a", "knows", "b", "iri"),  # duplicate triple kept in count
                ("b", "name", "Bob", "literal"),
            ],
        )
        out = {r["predicate"]: r for r in predicate_profile(t).collect()}
        assert out["type"]["n_triples"] == 2
        assert out["type"]["n_subjects"] == 2
        assert out["type"]["n_objects"] == 1
        assert out["type"]["is_functional"] is True
        assert out["knows"]["n_triples"] == 3
        assert out["knows"]["max_fanout"] == 2
        assert out["knows"]["is_functional"] is False
        assert out["name"]["is_functional"] is True


class TestDenseEntityIds:
    def test_dense_and_deterministic(self, spark):
        ents = spark.createDataFrame(
            [(f"e{i:03d}",) for i in range(257)], "entity string"
        )
        ids = {r["entity"]: r["entity_id"] for r in dense_entity_ids(ents).collect()}
        assert sorted(ids.values()) == list(range(257))
        again = {
            r["entity"]: r["entity_id"]
            for r in dense_entity_ids(ents.repartition(7)).collect()
        }
        assert ids == again  # partitioning-independent

    def test_null_and_dup_entities_ignored(self, spark):
        ents = spark.createDataFrame(
            [("a",), ("a",), (None,), ("b",)], "entity string"
        )
        ids = {r["entity"]: r["entity_id"] for r in dense_entity_ids(ents).collect()}
        assert sorted(ids.values()) == [0, 1]


class TestPagerank:
    def test_cycle_is_uniform(self, spark):
        # a->b->c->a: perfect symmetry, every node keeps rank 1.0
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
        )
        out = {r["node"]: r["rank_fp"] for r in pagerank(edges, iterations=5).collect()}
        assert set(out) == {"a", "b", "c"}
        assert len(set(out.values())) == 1
        # mass conserved on a cycle: rank stays at the initial unit
        assert abs(out["a"] - _SCALE) <= 5  # floor-div rounding only

    def test_hub_and_its_target_outrank_leaves(self, spark):
        # b, c are dangling sources: they keep only the base rank.
        # hub aggregates three in-edges; a receives hub's entire mass.
        edges = spark.createDataFrame(
            [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
            "src string, dst string",
        )
        out = {r["node"]: r["rank_fp"] for r in pagerank(edges, iterations=10).collect()}
        base = 15 * _SCALE // 100
        assert out["b"] == out["c"] == base
        assert out["hub"] > 5 * base
        assert out["a"] > 5 * base

    def test_parallelism_independent(self, spark):
        edges = spark.createDataFrame(
            [(f"n{i}", f"n{(i * 7 + 3) % 50}") for i in range(200)],
            "src string, dst string",
        ).where("src != dst")
        r1 = {r["node"]: r["rank_fp"] for r in pagerank(edges, iterations=6).collect()}
        r2 = {
            r["node"]: r["rank_fp"]
            for r in pagerank(edges.repartition(13), iterations=6).collect()
        }
        assert r1 == r2  # exact int equality, not approx


class TestNegativeSamples:
    def _kg(self, spark):
        return _triples(
            spark,
            [(f"s{i}", "p", f"o{i % 7}", "iri") for i in range(30)]
            + [("s0", "lit", "text", "literal")],
        )

    def test_negatives_never_equal_truth(self, spark):
        t = self._kg(spark)
        ids = dense_entity_ids(kg_entities(t))
        out = negative_samples(t, ids, per_triple=2).collect()
        assert len(out) == 60  # literals excluded, 2 per entity triple
        for r in out:
            assert r["neg_object"] != r["true_object"]

    def test_deterministic_across_partitionings(self, spark):
        t = self._kg(spark)
        ids = dense_entity_ids(kg_entities(t))
        a = sorted(map(tuple, negative_samples(t, ids).collect()))
        b = sorted(map(tuple, negative_samples(t.repartition(5), ids).collect()))
        assert a == b

    def test_tiny_dictionary_rejected(self, spark):
        t = _triples(spark, [("a", "p", "a", "iri")])
        ids = dense_entity_ids(kg_entities(t))
        with pytest.raises(ValueError):
            negative_samples(t, ids)


class TestEntityEdges:
    def test_filters_literals_selfloops_dups(self, spark):
        t = _triples(
            spark,
            [
                ("a", "p", "b", "iri"),
                ("a", "p", "b", "iri"),
                ("a", "q", "a", "iri"),
                ("a", "r", "x", "literal"),
            ],
        )
        assert entity_edges(t).collect() == [("a", "b")] or [
            tuple(r) for r in entity_edges(t).collect()
        ] == [("a", "b")]


# --------------------------------------------------------------------------
# triangle counting (degree-ordered wedge joins)
# --------------------------------------------------------------------------

from turtle_spark.operators.graph import triangle_count  # noqa: E402


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.n_triangles for r in triangle_count(df).collect()}


def test_triangle_single(spark):
    # one triangle, regardless of edge direction / duplicates
    got = _tri(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a")])
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_star_has_none(spark):
    got = _tri(spark, [("hub", x) for x in ("a", "b", "c", "d")])
    assert got == {}


def test_triangle_book_graph(spark):
    # two triangles sharing edge (a, b): a and b sit on 2 each
    got = _tri(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")])
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_triangle_k4(spark):
    # K4: C(3,2) = 3 triangles per node, 4 triangles total
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    got = _tri(spark, edges)
    assert got == {n: 3 for n in "abcd"}
    assert sum(got.values()) == 3 * 4  # each triangle credits 3 corners


def test_triangle_partitioning_independent(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e"), ("c", "e")]
    df1 = spark.createDataFrame(edges, "src string, dst string")
    df2 = df1.repartition(7)
    r1 = {(r.node, r.n_triangles) for r in triangle_count(df1).collect()}
    r2 = {(r.node, r.n_triangles) for r in triangle_count(df2).collect()}
    assert r1 == r2 == {("a", 1), ("b", 1), ("c", 2), ("d", 1), ("e", 1)}


class TestKCore:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_k4_is_its_own_3_core(self, spark):
        from turtle_spark.operators.graph import k_core
        import itertools

        nodes = ["a", "b", "c", "d"]
        e = self._edges(spark, list(itertools.combinations(nodes, 2)))
        got = {(r["node"], r["degree"]) for r in k_core(e, 3).collect()}
        assert got == {(n, 3) for n in nodes}

    def test_pendant_chain_peels_off(self, spark):
        from turtle_spark.operators.graph import k_core

        # triangle with a 2-node tail: 2-core = the triangle only
        e = self._edges(
            spark,
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        )
        got = {(r["node"], r["degree"]) for r in k_core(e, 2).collect()}
        assert got == {("a", 2), ("b", 2), ("c", 2)}

    def test_cascading_removal(self, spark):
        from turtle_spark.operators.graph import k_core

        # star: center has degree 4 but every leaf has 1 -> 2-core empty
        e = self._edges(spark, [("hub", f"l{i}") for i in range(4)])
        assert k_core(e, 2).count() == 0

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        from turtle_spark.operators.graph import k_core

        e = self._edges(
            spark,
            [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a")],
        )
        got = {(r["node"], r["degree"]) for r in k_core(e, 2).collect()}
        assert got == {("a", 2), ("b", 2), ("c", 2)}

    def test_parallelism_independence(self, spark):
        from turtle_spark.operators.graph import k_core

        pairs = [
            (f"n{i}", f"n{(i * 5 + 3) % 23}")
            for i in range(60)
            if i != (i * 5 + 3) % 23
        ]
        a = sorted(map(tuple, k_core(self._edges(spark, pairs).repartition(9), 3).collect()))
        b = sorted(map(tuple, k_core(self._edges(spark, pairs).coalesce(1), 3).collect()))
        assert a == b

    def test_matches_sequential_peeling(self, spark):
        from turtle_spark.operators.graph import k_core

        pairs = [
            (f"n{i}", f"n{(i * 7 + 1) % 31}")
            for i in range(80)
            if i != (i * 7 + 1) % 31
        ]
        got = {(r["node"], r["degree"]) for r in k_core(self._edges(spark, pairs), 3).collect()}

        # independent: ONE-node-at-a-time peeling (different order than
        # the engine's all-at-once sweeps; k-core fixpoint is unique)
        adj: dict[str, set] = {}
        for s, d in pairs:
            a, b = min(s, d), max(s, d)
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for n in sorted(adj):
                if len(adj[n]) < 3:
                    for m in adj.pop(n):
                        adj[m].discard(n)
                    changed = True
                    break
        assert got == {(n, len(ns)) for n, ns in adj.items()}


class TestBfsLevels:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_levels_and_early_stop(self, spark):
        from turtle_spark.operators.graph import bfs_levels

        # chain a-b-c-d plus isolated pair x-y
        edges = self._edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")])
        seeds = spark.createDataFrame([("a",)], "node string")
        got = {(r.node, r.level) for r in bfs_levels(edges, seeds, max_depth=6).collect()}
        assert got == {("a", 0), ("b", 1), ("c", 2), ("d", 3)}  # x,y unreached

    def test_min_level_semantics(self, spark):
        from turtle_spark.operators.graph import bfs_levels

        # two paths to d: a-d (1 hop) and a-b-c-d (3 hops) -> level 1
        edges = self._edges(
            spark, [("a", "d"), ("a", "b"), ("b", "c"), ("c", "d")]
        )
        seeds = spark.createDataFrame([("a",)], "node string")
        levels = {r.node: r.level for r in bfs_levels(edges, seeds, max_depth=4).collect()}
        assert levels["d"] == 1

    def test_directed_and_depth_cap(self, spark):
        from turtle_spark.operators.graph import bfs_levels

        edges = self._edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("z", "a")])
        seeds = spark.createDataFrame([("a",)], "node string")
        got = {
            (r.node, r.level)
            for r in bfs_levels(edges, seeds, max_depth=1, undirected=False).collect()
        }
        # directed: z unreachable from a; depth cap stops at level 1
        assert got == {("a", 0), ("b", 1)}


class TestCharacteristicSets:
    def test_groups_by_exact_predicate_set(self, spark):
        from turtle_spark.operators.graph import characteristic_sets

        t = _triples(
            spark,
            [
                # two subjects with {name, type}; one with {name}
                ("e/a", "p/name", "A", "literal"),
                ("e/a", "p/type", "T", "iri"),
                ("e/b", "p/name", "B", "literal"),
                ("e/b", "p/type", "T", "iri"),
                ("e/b", "p/type", "U", "iri"),  # extra triple, same set
                ("e/c", "p/name", "C", "literal"),
                # duplicate assertion collapses in the SET view
                ("e/c", "p/name", "C", "literal"),
            ],
        )
        got = {
            r["cs"]: (r["n_preds"], r["n_subjects"], r["n_triples"])
            for r in characteristic_sets(t).collect()
        }
        assert got["p/name p/type"] == (2, 2, 5)
        assert got["p/name"] == (1, 1, 1)

    def test_min_support_prunes_singletons(self, spark):
        from turtle_spark.operators.graph import characteristic_sets

        t = _triples(
            spark,
            [
                ("e/a", "p/x", "1", "literal"),
                ("e/b", "p/x", "2", "literal"),
                ("e/c", "p/y", "3", "literal"),
            ],
        )
        got = [r["cs"] for r in characteristic_sets(t, min_support=2).collect()]
        assert got == ["p/x"]

    def test_plan_has_no_join(self, spark):
        from turtle_spark.operators.graph import characteristic_sets

        t = _triples(spark, [("e/a", "p/x", "1", "literal")])
        plan = (
            characteristic_sets(t)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan


# --------------------------------------------------------------------------
# ordered collection recovery (collection_arrays)
# --------------------------------------------------------------------------

_TCOLS = (
    "subject string, predicate string, object string, label string, "
    "datatype string, objecttype string"
)
_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _list_triples(head: str, items: list[str], start: int = 0):
    rows, cells = [], [f"{head}" if i == 0 else f"{head}~{i}" for i in range(len(items))]
    for i, (cell, item) in enumerate(zip(cells, items)):
        rows.append((cell, _RDF + "first", item, "", "", "iri"))
        nxt = cells[i + 1] if i + 1 < len(cells) else _RDF + "nil"
        rows.append((cell, _RDF + "rest", nxt, "", "", "iri"))
    return rows


def test_collection_arrays_order_and_heads(spark):
    from turtle_spark.operators.graph import collection_arrays

    rows = (
        _list_triples("_:l1", ["e/c", "e/a", "e/b"])  # order != sorted
        + _list_triples("_:l2", ["e/x"])
        + [("e/a", "p/knows", "e/b", "", "", "iri")]  # noise
    )
    out = {
        r["head"]: (r["n_items"], r["items"])
        for r in collection_arrays(spark.createDataFrame(rows, _TCOLS)).collect()
    }
    assert out == {
        "_:l1": (3, ["e/c", "e/a", "e/b"]),  # ORDER preserved, not sorted
        "_:l2": (1, ["e/x"]),
    }


def test_collection_arrays_nested_list_is_item_and_head(spark):
    from turtle_spark.operators.graph import collection_arrays

    rows = _list_triples("_:outer", ["e/a", "_:inner"]) + _list_triples(
        "_:inner", ["e/b", "e/c"]
    )
    out = {
        r["head"]: r["items"]
        for r in collection_arrays(spark.createDataFrame(rows, _TCOLS)).collect()
    }
    assert out["_:outer"] == ["e/a", "_:inner"]
    assert out["_:inner"] == ["e/b", "e/c"]


def test_collection_arrays_long_list_log_rounds(spark):
    from turtle_spark.operators.graph import collection_arrays

    items = [f"e/i{k}" for k in range(40)]
    out = collection_arrays(
        spark.createDataFrame(_list_triples("_:long", items), _TCOLS),
        max_rounds=7,  # ceil(log2 40) = 6 doubling rounds suffice
    ).collect()
    assert out[0]["items"] == items


def test_collection_arrays_partitioning_independent(spark):
    from turtle_spark.operators.graph import collection_arrays

    rows = _list_triples("_:l1", ["e/c", "e/a", "e/b"]) + _list_triples(
        "_:l2", [f"e/{k}" for k in range(9)]
    )
    df = spark.createDataFrame(rows, _TCOLS)
    a = sorted((r["head"], tuple(r["items"])) for r in collection_arrays(df.repartition(7)).collect())
    b = sorted((r["head"], tuple(r["items"])) for r in collection_arrays(df.coalesce(1)).collect())
    assert a == b


def _hits_mirror(edges, iterations=8, scale=1_000_000):
    """Plain dict-loop HITS with the same integer arithmetic."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}

    def norm(scores):
        total = sum(scores.values())
        if total == 0:
            return scores
        return {n: v * scale // total for n, v in scores.items()}

    for _ in range(iterations):
        auth = norm({n: sum(hub[s] for s, d in edges if d == n) for n in nodes})
        hub = norm({n: sum(auth[d] for s, d in edges if s == n) for n in nodes})
    return {n: (hub[n], auth[n]) for n in nodes}


class TestHits:
    EDGES = [
        ("hub1", "page_a"), ("hub1", "page_b"), ("hub1", "page_c"),
        ("hub2", "page_a"), ("hub2", "page_b"),
        ("page_a", "page_b"),
        ("loner", "page_c"),
    ]

    def _edges_df(self, spark, edges):
        return spark.createDataFrame(edges, "src string, dst string")

    def test_matches_dict_mirror(self, spark):
        from turtle_spark.operators.graph import hits

        got = {
            r["node"]: (r["hub_fp"], r["auth_fp"])
            for r in hits(self._edges_df(spark, self.EDGES), iterations=8).collect()
        }
        assert got == _hits_mirror(self.EDGES)

    def test_hub_and_authority_ordering(self, spark):
        from turtle_spark.operators.graph import hits

        got = {
            r["node"]: (r["hub_fp"], r["auth_fp"])
            for r in hits(self._edges_df(spark, self.EDGES), iterations=8).collect()
        }
        # hub1 links to all three authorities -> strongest hub;
        # page_b has the most/strongest in-links -> top authority
        assert got["hub1"][0] == max(v[0] for v in got.values())
        assert got["page_b"][1] == max(v[1] for v in got.values())
        # pure-sink pages hub 0; pure-source hubs authority 0
        assert got["page_c"][0] == 0 and got["hub1"][1] == 0

    def test_partitioning_independence(self, spark):
        from turtle_spark.operators.graph import hits

        df = self._edges_df(spark, self.EDGES)
        a = sorted(map(tuple, hits(df.repartition(1), iterations=5).collect()))
        b = sorted(map(tuple, hits(df.repartition(17), iterations=5).collect()))
        assert a == b

    def test_mass_conserved(self, spark):
        from turtle_spark.operators.graph import hits

        res = hits(self._edges_df(spark, self.EDGES), iterations=3)
        sums = res.agg(F.sum("hub_fp"), F.sum("auth_fp")).collect()[0]
        # sum-normalized to <= SCALE (floor division loses < 1 unit/node)
        assert 0 < sums[0] <= 1_000_000 and 0 < sums[1] <= 1_000_000


def _aa_mirror(edges, neighbor_cap=64, scale=1_000_000):
    """Loops mirror of link_prediction (same cap + integer weights)."""
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    scored: dict[tuple[str, str], list[int]] = {}
    for z, nbrs in adj.items():
        deg = len(nbrs)
        if deg < 2:
            continue
        w = scale // (deg.bit_length() - 1)
        capped = sorted(nbrs)[:neighbor_cap]
        for i, a in enumerate(capped):
            for b in capped[i + 1:]:
                cell = scored.setdefault((a, b), [0, 0])
                cell[0] += 1
                cell[1] += w
    return {
        (a, b): (n, s)
        for (a, b), (n, s) in scored.items()
        if b not in adj.get(a, set())
    }


class TestLinkPrediction:
    EDGES = [
        ("a", "z1"), ("b", "z1"),            # a-b share z1 (deg 2 -> w = SCALE)
        ("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"),  # hub deg 4
        ("c", "d"),                           # existing edge -> excluded
    ]

    def _run(self, spark, edges, **kw):
        from turtle_spark.operators.graph import link_prediction

        df = spark.createDataFrame(edges, "src string, dst string")
        return {
            (r["a"], r["b"]): (r["n_common"], r["aa_fp"])
            for r in link_prediction(df, **kw).collect()
        }

    def test_matches_loops_mirror(self, spark):
        assert self._run(spark, self.EDGES) == _aa_mirror(self.EDGES)

    def test_low_degree_neighbor_outweighs_hub(self, spark):
        got = self._run(spark, self.EDGES)
        # (a,b) share z1 (deg 2, w=SCALE) AND hub (deg 4, w=SCALE/2);
        # (a,c) share only the hub
        assert got[("a", "b")] == (2, 1_500_000)
        assert got[("a", "c")] == (1, 500_000)

    def test_existing_edges_never_predicted(self, spark):
        got = self._run(spark, self.EDGES)
        assert ("c", "d") not in got and ("d", "c") not in got

    def test_neighbor_cap_bounds_wedges(self, spark):
        edges = [("hub", f"n{i:02d}") for i in range(10)]
        got = self._run(spark, edges, neighbor_cap=4)
        assert got == _aa_mirror(edges, neighbor_cap=4)
        assert len(got) == 6  # C(4,2), not C(10,2)

    def test_direction_insensitive(self, spark):
        rev = [(d, s) for s, d in self.EDGES]
        assert self._run(spark, rev) == self._run(spark, self.EDGES)


class TestFunctionalConflicts:
    def _report(self, spark, rows, **kw):
        from turtle_spark.operators.graph import functional_conflicts

        df = _triples(spark, rows)
        return {
            r["predicate"]: (r["n_subjects"], r["n_multi"], r["max_objects"])
            for r in functional_conflicts(df, **kw).collect()
        }

    def test_flags_rare_violator_only(self, spark):
        rows = [(f"s{i}", "born", f"d{i}", "literal") for i in range(40)]
        rows += [("s0", "born", "d-other", "literal")]        # 1/40 = 2.5%
        rows += [("a", "knows", "b", "iri"), ("a", "knows", "c", "iri"),
                 ("d", "knows", "e", "iri")]                  # 1/2 = 50%
        got = self._report(spark, rows)
        assert got == {"born": (40, 1, 2)}

    def test_clean_functional_predicate_not_reported(self, spark):
        rows = [(f"s{i}", "born", f"d{i}", "literal") for i in range(10)]
        assert self._report(spark, rows) == {}

    def test_object_identity_includes_annotations(self, spark):
        from turtle_spark.operators.graph import functional_conflicts

        df = spark.createDataFrame(
            [("s", "p", "v", "en", "", "literal"), ("s", "p", "v", "fr", "", "literal")]
            + [(f"s{i}", "p", "v", "en", "", "literal") for i in range(40)],
            TRIPLE_SCHEMA,
        )
        got = functional_conflicts(df).collect()
        assert len(got) == 1 and got[0]["n_multi"] == 1  # lang makes them distinct

    def test_threshold_is_exact_integer_math(self, spark):
        rows = [(f"s{i}", "p", f"v{i}", "literal") for i in range(20)]
        rows += [("s0", "p", "vx", "literal")]  # exactly 5% of 20
        got = self._report(spark, rows, max_violation_pct=5)
        assert "p" in got
        got4 = self._report(spark, rows, max_violation_pct=4)
        assert "p" not in got4


def _ppr_mirror(edges, seeds, iterations=10, scale=1_000_000_000_000):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    seed_mass = 15 * scale // 100
    base = {n: (seed_mass if n in seeds else 0) for n in nodes}
    rank = dict(base)
    for _ in range(iterations):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // deg[s]
        rank = {n: base[n] + 85 * inflow[n] // 100 for n in nodes}
    return rank


class TestPersonalizedPagerank:
    EDGES = [
        ("seed", "a"), ("a", "b"), ("b", "c"),
        ("far", "x"), ("x", "far"),
    ]

    def _run(self, spark, edges, seeds, **kw):
        from turtle_spark.operators.graph import personalized_pagerank

        e = spark.createDataFrame(edges, "src string, dst string")
        s = spark.createDataFrame([(n,) for n in seeds], "node string")
        return {
            r["node"]: r["rank_fp"]
            for r in personalized_pagerank(e, s, **kw).collect()
        }

    def test_matches_dict_mirror(self, spark):
        got = self._run(spark, self.EDGES, {"seed"})
        assert got == _ppr_mirror(self.EDGES, {"seed"})

    def test_mass_decays_with_distance_and_skips_unreachable(self, spark):
        got = self._run(spark, self.EDGES, {"seed"})
        assert got["seed"] > got["a"] > got["b"] > got["c"] > 0
        # the far/x cycle is unreachable from the seed: zero mass
        assert got["far"] == 0 and got["x"] == 0

    def test_partitioning_independence(self, spark):
        e = self.EDGES * 1
        a = self._run(spark, e, {"seed"}, iterations=6)
        from turtle_spark.operators.graph import personalized_pagerank
        df = (
            personalized_pagerank(
                spark.createDataFrame(e, "src string, dst string").repartition(13),
                spark.createDataFrame([("seed",)], "node string"),
                iterations=6,
            )
        )
        assert {r["node"]: r["rank_fp"] for r in df.collect()} == a

    def test_multiple_seeds_sum(self, spark):
        got = self._run(spark, self.EDGES, {"seed", "far"})
        assert got == _ppr_mirror(self.EDGES, {"seed", "far"})
        assert got["x"] > 0  # now reachable


class TestContainerArrays:
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    def _recover(self, spark, rows):
        from turtle_spark.operators.graph import container_arrays

        df = _triples(spark, rows)
        return {
            r["head"]: (r["n_items"], tuple(r["items"]))
            for r in container_arrays(df).collect()
        }

    def test_order_comes_from_index_not_value(self, spark):
        rows = [
            ("seq1", self.RDF + "_2", "bbb", "iri"),
            ("seq1", self.RDF + "_1", "zzz", "iri"),
            ("seq1", self.RDF + "_10", "aaa", "iri"),
        ]
        got = self._recover(spark, rows)
        # numeric index order: 1, 2, 10 (a string sort would give 1, 10, 2)
        assert got == {"seq1": (3, ("zzz", "bbb", "aaa"))}

    def test_non_member_predicates_ignored(self, spark):
        rows = [
            ("seq1", self.RDF + "_1", "a", "iri"),
            ("seq1", self.RDF + "type", "Seq", "iri"),
            ("seq1", self.RDF + "_x", "bad", "iri"),
            ("other", "http://x/p", "v", "literal"),
        ]
        assert self._recover(spark, rows) == {"seq1": (1, ("a",))}

    def test_duplicates_collapse_but_alternatives_kept(self, spark):
        rows = [
            ("s", self.RDF + "_1", "a", "iri"),
            ("s", self.RDF + "_1", "a", "iri"),
            ("s", self.RDF + "_1", "b", "iri"),
            ("s", self.RDF + "_2", "c", "iri"),
        ]
        assert self._recover(spark, rows) == {"s": (3, ("a", "b", "c"))}

    def test_partitioning_independent(self, spark):
        from turtle_spark.operators.graph import container_arrays

        rows = [(f"s{i%7}", self.RDF + f"_{i}", f"v{i}", "iri") for i in range(50)]
        df = _triples(spark, rows)
        a = sorted(map(tuple, container_arrays(df.repartition(11)).collect()))
        b = sorted(map(tuple, container_arrays(df.coalesce(1)).collect()))
        assert a == b


def test_clustering_coefficient_ground_truth(spark):
    """Triangle a-b-c with pendant d on a: lcc(a) = 2·1/(3·2),
    lcc(b) = lcc(c) = 1.0, d (degree 1) omitted."""
    from turtle_spark.operators.graph import clustering_coefficient

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("b", "a")],  # dup dir
        "src string, dst string",
    )
    got = {r["node"]: (r["deg"], r["n_triangles"], r["lcc"])
           for r in clustering_coefficient(edges).collect()}
    assert got == {
        "a": (3, 1, 0.333333),
        "b": (2, 1, 1.0),
        "c": (2, 1, 1.0),
    }


def test_pagerank_resume_equals_uninterrupted_run(spark):
    from turtle_spark.operators.graph import pagerank, pagerank_resume

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    )
    full = {r["node"]: r["rank_fp"] for r in pagerank(edges, iterations=10).collect()}
    resumed = {
        r["node"]: r["rank_fp"]
        for r in pagerank_resume(
            edges, pagerank(edges, iterations=6), iterations=4
        ).collect()
    }
    assert resumed == full  # bit-exact continuation


def test_pagerank_resume_warm_beats_cold_after_delta(spark):
    from turtle_spark.operators.graph import pagerank, pagerank_resume

    old = [(f"n{i}", f"n{(i * 7 + 1) % 40}") for i in range(200)]
    old_edges = spark.createDataFrame(
        [e for e in old if e[0] != e[1]], "src string, dst string"
    )
    # delta: a handful of new edges
    new = [e for e in old if e[0] != e[1]] + [("n1", "n39"), ("n2", "n38"), ("x", "n1")]
    new_edges = spark.createDataFrame(new, "src string, dst string")

    target = {
        r["node"]: r["rank_fp"] for r in pagerank(new_edges, iterations=10).collect()
    }
    prev = pagerank(old_edges, iterations=10)
    warm = {
        r["node"]: r["rank_fp"]
        for r in pagerank_resume(new_edges, prev, iterations=3).collect()
    }
    cold = {
        r["node"]: r["rank_fp"] for r in pagerank(new_edges, iterations=3).collect()
    }
    warm_err = max(abs(warm[n] - target[n]) for n in target)
    cold_err = max(abs(cold[n] - target[n]) for n in target)
    assert warm_err < cold_err, (warm_err, cold_err)


def test_pagerank_resume_new_nodes_start_uniform(spark):
    from turtle_spark.operators.graph import pagerank_resume

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    prev = spark.createDataFrame([("a", 777)], "node string, rank_fp long")
    # 0 iterations: pure re-init — 'a' keeps its previous rank, 'b'
    # (absent from prev) starts at the uniform fixed-point scale
    out = {
        r["node"]: r["rank_fp"]
        for r in pagerank_resume(edges, prev, iterations=0).collect()
    }
    assert out["a"] == 777
    assert out["b"] == 10**12


def test_shortest_paths_hand_graph(spark):
    from turtle_spark.operators.graph import shortest_paths

    # cheap long way round beats the expensive direct edge
    edges = spark.createDataFrame(
        [
            ("a", "b", 10),
            ("a", "c", 1),
            ("c", "d", 1),
            ("d", "b", 1),
            ("b", "e", 2),
            ("x", "y", 5),  # disconnected from a
        ],
        "src string, dst string, w long",
    )
    lm = spark.createDataFrame([("a",)], "node string")
    out = {
        r["node"]: r["dist"] for r in shortest_paths(edges, lm).collect()
    }
    assert out == {"a": 0, "c": 1, "d": 2, "b": 3, "e": 5}


def test_shortest_paths_multi_landmark_independent(spark):
    from turtle_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)],
        "src string, dst string, w long",
    )
    lm = spark.createDataFrame([("a",), ("b",)], "node string")
    out = {
        (r["landmark"], r["node"]): r["dist"]
        for r in shortest_paths(edges, lm).collect()
    }
    assert out[("a", "b")] == 1 and out[("a", "c")] == 2
    assert out[("b", "c")] == 1 and out[("b", "a")] == 2


def test_shortest_paths_converges_before_cap(spark):
    from turtle_spark.operators.graph import shortest_paths

    # a 3-hop path: distances settle after 3 rounds even with a high cap
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)],
        "src string, dst string, w long",
    )
    lm = spark.createDataFrame([("a",)], "node string")
    out = {
        r["node"]: r["dist"]
        for r in shortest_paths(edges, lm, max_iterations=50).collect()
    }
    assert out["d"] == 3 and len(out) == 4


def test_shortest_paths_partition_invariance(spark):
    from turtle_spark.operators.graph import shortest_paths

    rows = [
        (f"n{i}", f"n{(i * 7 + 3) % 50}", 1 + (i * 13) % 9) for i in range(300)
    ]
    edges = spark.createDataFrame(
        [r for r in rows if r[0] != r[1]], "src string, dst string, w long"
    )
    lm = spark.createDataFrame([("n0",), ("n17",)], "node string")
    key = lambda df: sorted(
        (r["landmark"], r["node"], r["dist"]) for r in df.collect()
    )
    one = key(shortest_paths(edges.coalesce(1), lm))
    many = key(shortest_paths(edges.repartition(8), lm))
    assert one == many
