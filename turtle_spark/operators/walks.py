"""Deterministic random-walk corpus generation over the KG.

DeepWalk/node2vec-style training data: sequences of entities sampled
by walking the entity graph.  A graph-embedding pipeline feeds these
walks to a skip-gram trainer exactly like sentences; generating them
is a *data-engineering* job that must be reproducible — the same
corpus snapshot must yield the same walk corpus on any cluster size,
or downstream training is unreproducible and incremental runs can't
be diffed.  (No counterpart in `/root/reference`, which is a parser
library — SURVEY.md §2.2; this is pipeline-side derived training
data, like `operators/chunking.py`'s packed sequences.)

Determinism: there is NO RNG.  The step-``i`` choice of walk ``w``
standing at node ``v`` is ``neighbors(v)[xxhash64(w|i|v) mod deg(v)]``
over the *sorted* neighbor list — a pure function of (walk_id, step,
node), so the result is bit-identical at any parallelism, any retry,
any partitioning.  This is the same seeded-hash-instead-of-RNG device
the engine uses for sampling (`operators/sampling.py`) and negative
sampling (`operators/graph.py::negative_samples`).

Scale shape (the reason for each choice):

* the adjacency is an **indexed edge table** ``(src, idx, dst)`` with
  ``idx`` = row_number within src ordered by dst — NOT per-node
  collected arrays, so a celebrity node never materializes its whole
  neighbor list in one task;
* each step is two equi-joins: state ⋈ degree on the node key (skew
  from hub nodes handled by AQE), then state ⋈ indexed edges on the
  COMPOSITE key (src, idx) — unique per edge row, so the hot-node
  fan-out spreads across partitions by construction;
* per-step state is O(walks); lineage is truncated with
  ``localCheckpoint`` every few steps exactly like
  ``graph.pagerank`` — without it the plan doubles per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from turtle_spark.operators.skew import pin

__all__ = ["random_walks"]


def random_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_node: int = 1,
    starts: DataFrame | None = None,
    undirected: bool = True,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Deterministic unbiased random walks over ``edges(src, dst)``.

    Returns ``(walk_id, start, pos, node)`` — one row per visited
    position, ``pos`` 0-based with ``pos=0`` the start node.  A walk
    that reaches a node with no outgoing edge stops early (cannot
    happen with ``undirected=True``, where every edge endpoint has
    degree >= 1).

    ``starts``: optional one-column DataFrame of start nodes; default
    every node with at least one outgoing edge.  ``walks_per_node``
    walks per start, ``walk_id = start + "#w" + k``.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    edges = edges.select("src", "dst")
    if undirected:
        edges = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates()

    w = Window.partitionBy("src").orderBy("dst")
    indexed = pin(
        edges.withColumn("idx", F.row_number().over(w) - F.lit(1))
    )
    degree = pin(indexed.groupBy("src").agg(F.count("*").alias("deg")))

    if starts is None:
        starts = degree.select(F.col("src").alias("start"))
    else:
        start_col = starts.columns[0]
        starts = starts.select(F.col(start_col).alias("start"))

    walk_ids = starts.select(
        "start",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(walks_per_node - 1)),
                lambda k: F.concat(F.col("start"), F.lit("#w"), k.cast("string")),
            )
        ).alias("walk_id"),
    )
    state = walk_ids.select(
        "walk_id", "start", F.lit(0).alias("pos"), F.col("start").alias("node")
    )
    out = state
    for step in range(1, walk_length):
        # choice = sorted-neighbors[ xxhash64(walk_id|step|node) mod deg ]
        picked = (
            state.join(degree, state["node"] == degree["src"])
            .select(
                "walk_id",
                "start",
                F.col("node").alias("cur"),
                F.pmod(
                    F.xxhash64(
                        F.concat_ws(
                            "|", "walk_id", F.lit(str(step)), "node"
                        )
                    ),
                    F.col("deg"),
                ).cast("int").alias("idx"),
            )
        )
        state = (
            picked.join(
                indexed,
                (picked["cur"] == indexed["src"]) & (picked["idx"] == indexed["idx"]),
            )
            .select(
                "walk_id",
                "start",
                F.lit(step).alias("pos"),
                F.col("dst").alias("node"),
            )
        )
        if step % checkpoint_every == 0 and step + 1 < walk_length:
            state = state.localCheckpoint(eager=True)
        out = out.unionByName(state)
    return out
