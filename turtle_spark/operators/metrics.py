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
