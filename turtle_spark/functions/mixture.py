"""Water-filling mixture allocation — Spark-free arithmetic.

Shared by the distributed sampler (``operators/sampling.py::
mixture_sample``) and the DuckDB golden reference
(``tools/golden_ref.py``): both sides derive per-bucket sampling
fractions from the same pure function, so the oracle comparison pins
the distributed side (count aggregation, CASE-cutoff filter) rather
than re-deriving allocation arithmetic twice.
"""

from __future__ import annotations

# the q_mixture_sample query/oracle spec — shared verbatim by
# __spark_entry__ (Spark side) and tools/golden_ref.py (DuckDB golden)
# so the two sides can never drift
MIXTURE_WEIGHTS = {"src0": 0.5, "src1": 0.25, "src2": 0.15, "src3": 0.1}
MIXTURE_BUDGET = 60


def mixture_fractions(
    counts: dict[str, int], weights: dict[str, float], budget: int
) -> dict[str, float]:
    """Per-bucket sampling fractions hitting a target mixture.

    Training corpora are composed to target proportions ("40% web,
    30% code, ..."), but a bucket may not HAVE its share of rows.
    Water-filling: allocate ``budget * weight`` per bucket; buckets
    without enough rows are clamped to everything they have and their
    unused budget is redistributed across the unclamped buckets in
    weight proportion (at most ``len(buckets)`` rounds).  Never
    upsamples: fractions are in [0, 1] — duplicated rows would defeat
    the dedup stages upstream.

    Deterministic: largest-remainder rounding with bucket-name
    tiebreak, so the same (counts, weights, budget) always yields the
    same allocation on any machine.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to > 0")
    alloc = {b: 0 for b in weights if counts.get(b, 0) > 0}
    remaining = budget
    active = set(alloc)
    while remaining > 0 and active:
        w_active = sum(weights[b] for b in active)
        # largest-remainder rounding keeps the round's total == share
        shares = {b: remaining * weights[b] / w_active for b in active}
        grant = {b: int(shares[b]) for b in active}
        leftover = remaining - sum(grant.values())
        for b in sorted(active, key=lambda b: (shares[b] - grant[b], b), reverse=True):
            if leftover <= 0:
                break
            grant[b] += 1
            leftover -= 1
        progressed = False
        for b in sorted(active):
            take = min(alloc[b] + grant[b], counts[b]) - alloc[b]
            if take > 0:
                alloc[b] += take
                remaining -= take
                progressed = True
        active = {b for b in active if alloc[b] < counts[b]}
        if not progressed:
            break
    return {b: alloc[b] / counts[b] for b in alloc}
