"""Quality metrics: triple-set precision/recall against golden sets.

The engine's headline correctness metric (BASELINE.json) is P/R >= 0.95
of emitted triples versus the reference's goldens.  This operator
computes it distributed — ``exceptAll``-based so duplicate triples
count with multiplicity, exactly like comparing ordered golden arrays
corpus-wide.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PrecisionRecall:
    true_positives: int
    false_positives: int
    false_negatives: int

    @property
    def precision(self) -> float:
        d = self.true_positives + self.false_positives
        return self.true_positives / d if d else 1.0

    @property
    def recall(self) -> float:
        d = self.true_positives + self.false_negatives
        return self.true_positives / d if d else 1.0


def triple_set_pr(
    actual: DataFrame,
    expected: DataFrame,
    keys: list[str] | None = None,
) -> PrecisionRecall:
    """Multiset precision/recall of ``actual`` vs ``expected`` triples.

    Both frames are projected to ``keys`` (default: doc-scoped ordered
    triple identity) before the multiset difference, so extra columns
    don't perturb the score.
    """
    if keys is None:
        keys = ["doc_id", "seq", "subject", "predicate", "object"]
    a = actual.select(*keys)
    e = expected.select(*keys)
    fp = a.exceptAll(e).count()
    fn = e.exceptAll(a).count()
    tp = a.count() - fp
    return PrecisionRecall(true_positives=tp, false_positives=fp, false_negatives=fn)


def exact_jaccard_pairs_sampled(
    profiles: DataFrame,
    threshold: float,
    max_docs: int = 65536,
    id_col: str = "term_id",
) -> DataFrame:
    """EXACT all-pairs shingle-Jaccard >= threshold over a BOUNDED
    evaluation sample — the ground-truth side of ``sketch_recall``.

    Same answer as the naive cross-join + ``array_intersect`` (the
    previous form), restructured as an inverted-index kernel: the
    sample's profiles are collected once (bounded by contract —
    raises above ``max_docs``; this operator only ever runs on an
    evaluation sample, never the corpus), a dense posting index is
    built driver-side (~Σ nw longs, a few MB), and each Arrow batch
    computes its documents' intersection counts against ALL sample
    documents with one posting gather + ``np.bincount`` — Σ df²
    integer adds total, distributed across executors, instead of
    materializing N²/2 row pairs each dragging two multi-KB arrays
    through the join.  Measured at sf0.1 (5000 docs): 62 s -> ~2 s
    for identical output.

    Returns (t1, t2) with t1 < t2 — the profile ids of qualifying
    pairs.  Pairs of two EMPTY shingle sets count as Jaccard 1.0
    (union is empty), matching the join form's ``union == 0`` case.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    rows = profiles.select(id_col, "shs", "nw").collect()
    if len(rows) > max_docs:
        raise ValueError(
            f"exact_jaccard_pairs_sampled is an evaluation operator bounded "
            f"by contract at {max_docs} documents; got {len(rows)} — "
            f"hash-sample the input first"
        )
    n = len(rows)
    doc_ids = np.array([r[0] for r in rows], dtype=np.int64)
    doc_nw = np.array([r[2] for r in rows], dtype=np.int64)
    # unsigned order everywhere, matching the profile arrays' np.unique order
    sets = [np.asarray(r[1], dtype=np.int64).view(np.uint64) for r in rows]
    vocab = np.unique(np.concatenate([s for s in sets if s.size] or [np.array([], dtype=np.uint64)]))
    # postings[off[v]:off[v+1]] = sorted doc indices containing vocab[v]
    tok_idx = np.concatenate([np.searchsorted(vocab, s) for s in sets]) if vocab.size else np.array([], dtype=np.int64)
    owner = np.concatenate([np.full(s.size, i, dtype=np.int64) for i, s in enumerate(sets)]) if vocab.size else np.array([], dtype=np.int64)
    order = np.argsort(tok_idx, kind="stable")
    postings = owner[order]
    off = np.zeros(vocab.size + 1, dtype=np.int64)
    np.add.at(off, tok_idx + 1, 1)
    off = np.cumsum(off)
    id_of = {int(d): i for i, d in enumerate(doc_ids)}
    spark = profiles.sparkSession

    def gen(batches):
        for pdf in batches:
            out_t1, out_t2 = [], []
            for tid, shs, nw in zip(pdf[id_col], pdf["shs"], pdf["nw"]):
                i = id_of[int(tid)]
                if nw == 0:
                    # empty-vs-empty pairs: union empty -> Jaccard 1.0
                    others = np.flatnonzero((doc_nw == 0) & (doc_ids > tid))
                    for j in others:
                        out_t1.append(tid)
                        out_t2.append(doc_ids[j])
                    continue
                s = np.asarray(shs, dtype=np.int64).view(np.uint64)
                vi = np.searchsorted(vocab, s)
                gathered = np.concatenate(
                    [postings[off[v] : off[v + 1]] for v in vi]
                ) if vi.size else np.array([], dtype=np.int64)
                inter = np.bincount(gathered, minlength=n).astype(np.float64)
                union = (nw + doc_nw - inter).astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    jac = np.where(union > 0, inter / union, 1.0)
                hits = np.flatnonzero((jac >= threshold) & (doc_ids > tid))
                out_t1.extend([tid] * hits.size)
                out_t2.extend(doc_ids[hits].tolist())
            yield pd.DataFrame({"t1": out_t1, "t2": out_t2})

    # re-ordered to (least, greatest) on the raw ids: doc_ids > tid
    # above already guarantees t1 < t2
    from turtle_spark.operators.skew import spread

    return spread(profiles.select(id_col, "shs", "nw"), id_col).mapInPandas(
        gen, "t1 long, t2 long"
    )


def sketch_recall(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Recall evaluation of the MinHash-LSH near-dup tier against
    exact ground truth — 'measure, don't guess' for the sketch stack.

    Ground truth is the EXACT all-pairs shingle-Jaccard >= threshold
    (the same distinct-shingle-set Jaccard the LSH verify stage
    computes, so the two sides disagree only where LSH banding/caps
    lose a candidate).  The exact side runs through
    ``exact_jaccard_pairs_sampled`` — an inverted-index bincount
    kernel with identical output to the naive cross-join: this
    operator evaluates ON A BOUNDED SAMPLE by contract (here the
    documents table; at web scale a hash-sample of it) — the
    production dedup path never runs it.

    Output: ONE row — n_true, n_lsh, n_tp, n_missed (true pairs the
    sketch lost to banding probability or bucket/degree caps),
    n_extra (must be 0: verification is exact), recall.
    """
    from pyspark.sql import functions as F

    from turtle_spark.operators.dedup import minhash_near_duplicates
    from turtle_spark.operators.linking import shingle_profiles
    from turtle_spark.operators.skew import pin

    base = pin(
        docs.select(
            F.col(id_col).alias("_doc"),
            F.xxhash64(F.col(id_col).cast("string")).alias("term_id"),
            F.col(text_col).alias("term"),
        )
    )
    profiles = pin(shingle_profiles(base, shingle_k))
    ids = base.select("term_id", "_doc")
    exact = (
        exact_jaccard_pairs_sampled(profiles, threshold)
        .join(ids.withColumnRenamed("term_id", "t1").withColumnRenamed("_doc", "d1"), "t1")
        .join(ids.withColumnRenamed("term_id", "t2").withColumnRenamed("_doc", "d2"), "t2")
        .select(
            F.least("d1", "d2").alias("src"), F.greatest("d1", "d2").alias("dst")
        )
    )
    lsh = minhash_near_duplicates(
        docs, threshold=threshold, shingle_k=shingle_k,
        id_col=id_col, text_col=text_col,
    ).select("src", "dst")
    both = exact.withColumn("_t", F.lit(1)).join(
        lsh.withColumn("_l", F.lit(1)), ["src", "dst"], "full_outer"
    )
    return both.agg(
        F.sum(F.coalesce("_t", F.lit(0))).alias("n_true"),
        F.sum(F.coalesce("_l", F.lit(0))).alias("n_lsh"),
        F.sum(F.when(F.col("_t").isNotNull() & F.col("_l").isNotNull(), 1).otherwise(0)).alias("n_tp"),
        F.sum(F.when(F.col("_t").isNotNull() & F.col("_l").isNull(), 1).otherwise(0)).alias("n_missed"),
        F.sum(F.when(F.col("_t").isNull() & F.col("_l").isNotNull(), 1).otherwise(0)).alias("n_extra"),
    ).select(
        "n_true", "n_lsh", "n_tp", "n_missed", "n_extra",
        (F.col("n_tp").cast("double") / F.col("n_true").cast("double")).alias("recall"),
    )
