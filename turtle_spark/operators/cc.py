"""Stage D — connected components over similarity edges.

Alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond") expressed as DataFrame rounds:
converges in O(log n) rounds regardless of component diameter — the
property that matters at web scale, where min-label flooding over a
long chain would need O(diameter) shuffles.

Each round is two groupBy-min + join stages over ``(src, dst)`` long
pairs.  Lineage is truncated with ``localCheckpoint`` every round so
the plan doesn't grow unboundedly across iterations (at cluster scale
this would be a checkpoint to the manifest store instead — see
``turtle_spark.plans.manifest``).

Output: ``assignments(node, component)`` where component is the
minimum node id of the component — deterministic, partitioning-
independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's min neighborhood label."""
    nbrs = _symmetrize(edges)
    mins = nbrs.groupBy("src").agg(F.min("dst").alias("m"))
    mins = mins.select(
        "src", F.least(F.col("m"), F.col("src")).alias("m")
    )
    return (
        nbrs.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .dropDuplicates()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high->low, connect all small neighbors to the min."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    relinked = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    selfs = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        relinked.union(selfs)
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )


def _local_union_find(edge_rows):
    """Exact min-label components for a driver-sized edge list.

    Vectorized min-hooking + pointer doubling (numpy), not a per-edge
    Python loop: the tail runs single-threaded on the driver, so at the
    ``local_cutoff`` ceiling (2M edges) a dict-based union-find held the
    driver for multiple seconds — a serial term that caps pipeline
    scaling (and whose wall time swings 2-3x with host noise).  Each
    pass here is O(edges) numpy work and the pass count is O(log n);
    measured ~20x on 1.4M edges.

    Min-hooking converges to min-label roots: ``parent[hi] = lo`` only
    ever points a larger root at a smaller one, and the component's
    minimum node can never be the ``hi`` side, so it stays a fixed
    point and everything else compresses onto it.

    Two serial-tail costs were measured dominating this function at
    the 2M-edge ceiling and are engineered out (every second here is
    Amdahl serial time that caps the PIPELINE's scaling efficiency):

    * dictionary encoding — ``np.unique(return_inverse=True)`` is a
      full sort of 2·edges values (2-5 s measured); a hash-based
      ``pd.factorize`` + an argsort of only the DISTINCT nodes
      produces the identical sorted-rank encoding ~2-4x faster;
    * result materialization — ``list(zip(...))`` boxed 424k Python
      tuples for the caller to re-vectorize; returning the numpy
      columns directly is ~100x cheaper and feeds Arrow untouched.

    Returns ``(nodes, components)`` — two aligned int64 ndarrays.
    """
    import numpy as np
    import pandas as pd

    if len(edge_rows) == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty
    arr = np.asarray(edge_rows, dtype=np.int64)
    codes, uniques = pd.factorize(arr.ravel())
    order = np.argsort(uniques, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    nodes = uniques[order]
    idx = rank[codes].reshape(arr.shape)
    s, d = idx[:, 0], idx[:, 1]
    parent = np.arange(len(nodes), dtype=np.int64)
    while True:
        # full path compression by pointer doubling
        while True:
            gp = parent[parent]
            if np.array_equal(gp, parent):
                break
            parent = gp
        rs, rd = parent[s], parent[d]
        lo = np.minimum(rs, rd)
        hi = np.maximum(rs, rd)
        live = lo != hi
        if not live.any():
            break
        # hook each larger root to the smallest root any edge offers it
        np.minimum.at(parent, hi[live], lo[live])
    return nodes, nodes[parent]


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    local_cutoff: int = 2_000_000,
    assume_distinct: bool = False,
) -> DataFrame:
    """edges(src, dst) -> assignments(node, component).

    Isolated nodes (absent from ``edges``) are their own component and
    simply don't appear; callers outer-join and coalesce to self.

    ``assume_distinct=True`` skips the defensive input dedup — a full
    shuffle plus an eager checkpoint that is a NO-OP when the caller's
    edges are already distinct pairs (the pipeline's
    ``candidate_pairs`` contract: one row per distinct (src, dst),
    src < dst).  Star rounds and the union-find tail are insensitive
    to residual duplicates in any case (min/groupBy semantics); the
    flag only trades the guarantee that the convergence fingerprint
    counts distinct edges, which the contract already supplies.
    Measured: the skipped exchange + checkpoint was ~5-6 s of the
    components stage at the 2.8M-edge pipeline size — fixed cost that
    does not amortize with cores.

    Adaptive tail: star rounds CONTRACT the edge set, so late rounds
    shuffle a few thousand rows while paying full scheduling + 4
    exchanges each.  Once the remaining edges fit in ``local_cutoff``
    (a bounded ≤ ~32 MB Arrow transfer of long pairs at the default —
    the same order as a broadcast-join threshold), the components are
    finished with an exact driver-side union-find — identical output,
    and the O(log n) distributed prefix is untouched for web-scale
    inputs: at 10^12 documents the first rounds run distributed and
    the tail only fires once contraction has collapsed the graph to
    near-component size.  The tail moves rows via Arrow (``toPandas``
    / pandas ``createDataFrame``), never py4j row pickling — measured
    ~10x on the collect at 10^6 edges.  ``local_cutoff=0`` disables
    the tail entirely.
    """
    spark = edges.sparkSession
    cur = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).where(F.col("src") != F.col("dst"))
    if not assume_distinct:
        cur = cur.dropDuplicates().localCheckpoint()
    if cur.isEmpty():
        return spark.createDataFrame([], "node long, component long")

    prev_fingerprint = None
    for _ in range(max_iterations):
        # convergence probe doubles as the tail-size gate
        fp_row = cur.select(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        if 0 < fp_row["n"] <= local_cutoff:
            import numpy as np
            import pandas as pd

            pdf = cur.toPandas()  # Arrow path, not py4j row pickling
            nodes, comps = _local_union_find(
                np.column_stack(
                    [pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64)]
                )
            )
            out = pd.DataFrame({"node": nodes, "component": comps})
            return spark.createDataFrame(out)
        fingerprint = (fp_row["n"], fp_row["h"])
        if fingerprint == prev_fingerprint:
            break
        prev_fingerprint = fingerprint
        cur = _small_star(_large_star(cur)).localCheckpoint()

    # at convergence every edge is (node, component_min)
    assignments = cur.select(
        F.col("src").alias("node"), F.col("dst").alias("component")
    )
    roots = assignments.select(
        F.col("component").alias("node"), F.col("component")
    ).dropDuplicates()
    return assignments.union(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def incremental_components(
    assignments: DataFrame,
    new_edges: DataFrame,
    **cc_kwargs,
) -> DataFrame:
    """O(delta) maintenance of a connected-components assignment when
    a batch of NEW edges arrives — the canonicalization companion to
    the triple-level ``snapshot_delta``: a re-crawl must not re-run
    CC over 10^12 documents' mention graph to absorb one day's edges.

    The delta batch is CONTRACTED through the existing assignment
    first: each endpoint maps to its current component (itself when
    previously unseen), edges already internal to one component drop
    out, and full ``connected_components`` runs only on the contracted
    remainder — a graph bounded by the components the delta actually
    touches, not the corpus.  Component ids stay on the same
    convention (min member id), so the maintained table is
    BIT-IDENTICAL to a from-scratch recompute over old ∪ new edges
    (pinned by test against random graphs).

    Returns the DELTA rows only — (node, component) for existing
    nodes whose component changed plus first-seen nodes — ready to
    MERGE into the stored assignment (``apply_component_delta``).
    """
    a_src = assignments.select(F.col("node").alias("src"), F.col("component").alias("_cs"))
    a_dst = assignments.select(F.col("node").alias("dst"), F.col("component").alias("_cd"))
    contracted = (
        new_edges.join(a_src, "src", "left")
        .join(a_dst, "dst", "left")
        .select(
            F.coalesce("_cs", F.col("src")).alias("a"),
            F.coalesce("_cd", F.col("dst")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
        .distinct()
    )
    merged = connected_components(contracted, assume_distinct=True, **cc_kwargs)
    # existing members of re-canonicalized clusters
    upd = (
        assignments.join(
            merged.select(
                F.col("node").alias("component"), F.col("component").alias("_new")
            ),
            "component",
        )
        .where(F.col("_new") != F.col("component"))
        .select("node", F.col("_new").alias("component"))
    )
    # first-seen nodes (in the delta's edges, absent from the table)
    fresh = merged.join(
        assignments.select("node"), "node", "left_anti"
    ).select("node", "component")
    return upd.unionByName(fresh)


def apply_component_delta(assignments: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge an ``incremental_components`` delta into the stored
    assignment: delta rows win, untouched rows pass through."""
    d = delta.select(F.col("node"), F.col("component").alias("_dc"))
    return (
        assignments.join(d, "node", "left")
        .select("node", F.coalesce("_dc", F.col("component")).alias("component"))
        .unionByName(delta.join(assignments.select("node"), "node", "left_anti"))
    )
