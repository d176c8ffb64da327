"""Deterministic label-propagation community detection.

GraphFrames ships label propagation as its community-detection
primitive; for a KG pipeline it is the curation signal that groups
densely inter-linked entities (near-duplicate entity clusters, topic
hubs) more finely than connected components (`operators/cc.py`),
which merge everything reachable.  (No counterpart in
`/root/reference`; pipeline-side graph curation — SURVEY.md §2.2.)

Classic LPA is randomized (random visit order, random tie-breaks), so
two runs disagree — useless for a reproducible pipeline.  This
variant is fully deterministic:

* SYNCHRONOUS rounds: every node updates simultaneously from the
  previous round's labels (no visit order to depend on);
* the new label is the most frequent label among neighbors, ties
  broken by the LEXICOGRAPHICALLY SMALLEST label (a pure function of
  the multiset, not of partitioning);
* a FIXED round count: synchronous LPA has no unique fixpoint (it can
  2-cycle on bipartite structures), so the operator's contract is
  "labels after exactly R rounds" — deterministic at any parallelism,
  which is what the golden pins.

Scale shape: each round is one equi-join (edges x labels on dst) and
one two-level aggregation (count per (node, label), then argmax per
node via a min-struct — single shuffle, no window sort), both plain
hash exchanges on the node key; hub-node skew rides AQE exactly like
`graph.pagerank`.  Labels/edges are pinned across rounds and lineage
is truncated periodically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from turtle_spark.operators.skew import pin

__all__ = ["label_propagation"]


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    undirected: bool = True,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Run ``rounds`` synchronous LPA rounds over ``edges(src, dst)``.

    Returns ``(node, label)`` — the label is some member node's id;
    equal labels = same community.  Isolated endpoints cannot occur
    (every node comes from the edge list); a node whose neighbors all
    keep distinct labels adopts the smallest, so singleton "labels"
    may still name multi-node communities after merging rounds.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    edges = edges.select("src", "dst")
    if undirected:
        edges = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    edges = pin(edges.dropDuplicates())
    labels = pin(
        edges.select(F.col("src").alias("node")).dropDuplicates()
        .withColumn("label", F.col("node"))
    )
    for r in range(rounds):
        # most-frequent neighbor label, ties -> smallest label:
        # max(struct(cnt, negated-order label)) is wrong for strings,
        # so pick via min(struct(-cnt, label)) — one aggregation, no
        # per-node window sort
        nbr = edges.join(labels, edges["dst"] == labels["node"]).select(
            "src", "label"
        )
        counted = nbr.groupBy("src", "label").agg(F.count("*").alias("cnt"))
        new_labels = (
            counted.select(
                "src",
                F.struct((-F.col("cnt")).alias("neg"), F.col("label")).alias("sl"),
            )
            .groupBy("src")
            .agg(F.min("sl").alias("best"))
            .select(F.col("src").alias("node"), F.col("best.label").alias("label"))
        )
        labels = new_labels
        if (r + 1) % checkpoint_every == 0 and r + 1 < rounds:
            labels = labels.localCheckpoint(eager=True)
    return labels
