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
    lose a candidate).  The all-pairs join is a deliberate
    brute-force: this operator evaluates ON A BOUNDED SAMPLE by
    contract (here the documents table; at web scale a hash-sample of
    it) — the production dedup path never runs it.

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
    a = profiles.select(
        F.col("term_id").alias("t1"), F.col("shs").alias("s1"), F.col("nw").alias("n1")
    )
    b = profiles.select(
        F.col("term_id").alias("t2"), F.col("shs").alias("s2"), F.col("nw").alias("n2")
    )
    inter = F.size(F.array_intersect("s1", "s2"))
    union = F.col("n1") + F.col("n2") - inter
    jac = F.when(union == 0, F.lit(1.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )
    exact = (
        a.join(b, F.col("t1") < F.col("t2"))  # sample-eval brute force
        .withColumn("_j", jac)
        .where(F.col("_j") >= threshold)
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
