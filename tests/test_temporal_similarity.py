"""Ground-truth tests for the temporal joins (as-of / interval) and the
IVF approximate-nearest-neighbor path.

Temporal semantics pinned here:
* as-of picks the LATEST right row with right_ts <= left_ts per key,
  including equality ties (right row visible at its own timestamp);
* left rows with no preceding right row survive with nulls;
* interval join is inclusive on both endpoints and correct across
  coarse-bucket boundaries.
IVF: probing every cell must equal brute force exactly; probing a
subset must keep recall high on clustered data.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from turtle_spark.operators.similarity import cosine_topk, ivf_topk
from turtle_spark.operators.temporal import asof_join, interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1),
            ("A", _ts("2024-01-01 10:05:00"), 2),
            ("A", _ts("2024-01-01 09:00:00"), 3),  # before any quote
            ("B", _ts("2024-01-01 10:00:00"), 4),
            ("C", _ts("2024-01-01 10:00:00"), 5),  # key with no quotes
        ],
        "sym string, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:00"), 100.0),
            ("A", _ts("2024-01-01 10:05:00"), 101.0),  # equality tie
            ("B", _ts("2024-01-01 09:00:00"), 200.0),
            ("B", _ts("2024-01-01 09:30:00"), 201.0),
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_join_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], left_ts="ts", right_ts="ts")
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {
        1: 100.0,  # latest quote before 10:00
        2: 101.0,  # tie at 10:05 is visible
        3: None,   # no quote before 09:00
        4: 201.0,  # latest of two earlier quotes
        5: None,   # key never quoted
    }
    assert out.count() == trades.count()  # left join: no row loss


def test_asof_join_suffix_and_cols(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        right_cols=["px"], suffix="_q",
    )
    assert set(out.columns) == {"sym", "ts", "trade_id", "px_q"}


def test_interval_join_bucket_boundaries(spark):
    points = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 00:30:00"), 1),
            ("u", _ts("2024-01-01 02:00:00"), 2),   # exactly at end
            ("u", _ts("2024-01-01 02:00:01"), 3),   # just past end
            ("u", _ts("2024-01-02 00:00:00"), 4),   # other interval
            ("v", _ts("2024-01-01 00:30:00"), 5),   # wrong key
        ],
        "user string, ts timestamp, point_id int",
    )
    intervals = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00"), 10),
            ("u", _ts("2024-01-01 23:00:00"), _ts("2024-01-02 01:00:00"), 11),
        ],
        "user string, ts_start timestamp, ts_end timestamp, iv_id int",
    )
    # bucket width much smaller than the interval: spans many buckets
    out = interval_join(
        points, intervals, on=["user"], point_ts="ts",
        start_col="ts_start", end_col="ts_end", bucket_width_s=600,
    )
    pairs = {(r["point_id"], r["iv_id"]) for r in out.collect()}
    assert pairs == {(1, 10), (2, 10), (4, 11)}


def _clustered_embeddings(spark, n_clusters=4, per_cluster=30, dim=16, seed=3):
    rs = np.random.RandomState(seed)
    centers = rs.standard_normal((n_clusters, dim)) * 3
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + rs.standard_normal(dim) * 0.3
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_full_probe_equals_brute_force(spark):
    e = _clustered_embeddings(spark)
    q = e.where(F.col("vec_id") % 40 == 0)
    exact = cosine_topk(e, q, k=5).collect()
    ivf = ivf_topk(e, q, k=5, n_centroids=4, n_probe=4).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in rows)
    assert key(ivf) == key(exact)


def test_ivf_partial_probe_recall(spark):
    e = _clustered_embeddings(spark)
    q = e.where(F.col("vec_id") % 40 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(e, q, k=5, n_centroids=4, n_probe=1).collect()
    }
    recall = len(exact & approx) / len(exact)
    # clustered data: the single nearest cell holds the true neighbors
    assert recall >= 0.8, recall


def test_quality_score_ground_truth(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "ALLCAPS SHOUTING!!!"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    from turtle_spark.operators.textstats import quality_score

    rows = {r["doc_id"]: r for r in quality_score(docs).collect()}
    # doc 1: lowercase english text -> high score
    assert rows[1]["upper_ratio"] == 0.0
    assert rows[1]["score"] > 0.7
    # doc 2: all caps -> upper_ratio 1, shouting penalty applies
    assert rows[2]["upper_ratio"] == 1.0
    assert rows[2]["score"] < rows[1]["score"]
    # doc 3: empty text -> defined (no division blowups)
    assert rows[3]["score"] is not None


def test_asof_join_null_fields_not_mixed(spark):
    """The matched right row travels whole: a NULL column in the most
    recent right row must stay NULL in the output, never backfilled
    from an older right row (which would fabricate a row that never
    existed)."""
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:10:00"), 1)],
        "sym string, ts timestamp, trade_id int",
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 10:00:00"), 1, 2),
            ("k", _ts("2024-01-01 10:05:00"), None, 3),
        ],
        "sym string, ts timestamp, a int, b int",
    )
    out = asof_join(left, right, on=["sym"], left_ts="ts", right_ts="ts",
                    right_cols=["a", "b"]).collect()
    assert len(out) == 1
    assert out[0]["a"] is None and out[0]["b"] == 3


def test_cosine_pairs_lsh_equals_brute_force(spark):
    """The LSH-gated exact-pair path must reproduce the brute-force
    all-pairs join row-for-row at the query's (2 bits, 32 tables)
    settings, and its plan must be an equi-join (no
    BroadcastNestedLoopJoin)."""
    from turtle_spark.operators.similarity import cosine_pairs, cosine_pairs_lsh

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    dim = len(e.select("embedding").first()[0])
    gated = cosine_pairs_lsh(e, dim=dim, threshold=0.35, n_bits=2, n_tables=32)
    brute = cosine_pairs(e, threshold=0.35)
    got = {(r.id1, r.id2): r.cosine for r in gated.collect()}
    want = {(r.id1, r.id2): r.cosine for r in brute.collect()}
    assert got == want
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_cluster_label_purity_ground_truth(spark):
    """On well-separated clusters with labels == true cluster index,
    k-means topic purity must recover ~1.0 purity per cluster, sizes
    must sum to the corpus, and the report must be bit-identical at
    1 vs 16 partitions (seeded fixed-order centroid sample + argmax
    assignment make it parallelism-independent by construction)."""
    from turtle_spark.operators.similarity import cluster_label_purity

    e = _clustered_embeddings(spark).withColumn(
        "label", (F.col("vec_id") / 30).cast("int")
    )
    rep = cluster_label_purity(e, n_centroids=4)
    rows = rep.collect()
    assert sum(r["size"] for r in rows) == 120
    # every populated cluster should be dominated by one true label
    assert all(r["purity"] >= 0.9 for r in rows), rows
    assert {r["top_label"] for r in rows} == {0, 1, 2, 3}
    again = cluster_label_purity(e.repartition(16), n_centroids=4).collect()
    key = lambda rs: sorted(tuple(r) for r in rs)
    assert key(again) == key(rows)


def test_hard_negatives_ground_truth(spark):
    """Full-probe hard-negative mining must equal brute-force
    different-label top-k exactly; no mined negative may share its
    anchor's label."""
    from turtle_spark.operators.similarity import hard_negatives

    e = _clustered_embeddings(spark).withColumn(
        "label", (F.col("vec_id") / 30).cast("int")
    )
    anchors = e.where(F.col("vec_id") % 40 == 0)
    mined = hard_negatives(e, anchors, k=3, n_centroids=4, n_probe=4).collect()
    labels = {r["vec_id"]: r["label"] for r in e.select("vec_id", "label").collect()}
    assert all(r["neg_label"] != labels[r["anchor_id"]] for r in mined)
    # brute force: cosine against every different-label vector
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in e.collect()}
    for a in [r["vec_id"] for r in anchors.collect()]:
        scored = sorted(
            (
                (-float(vecs[n] @ vecs[a] / (np.linalg.norm(vecs[n]) * np.linalg.norm(vecs[a]))), n)
                for n in vecs
                if n != a and labels[n] != labels[a]
            )
        )[:3]
        want = [n for _, n in scored]
        got = [r["neg_id"] for r in sorted(mined, key=lambda r: r["rank"]) if r["anchor_id"] == a]
        assert got == want, (a, got, want)


def test_pq_topk_retrieves_from_the_right_cluster(spark):
    from turtle_spark.operators.similarity import pq_topk

    # PQ collapses near-identical vectors to the same codes, so WITHIN
    # a tight cluster the fine order is quantization-limited by design;
    # the property PQ promises is cluster-level retrieval: every
    # neighbor must come from the query's own cluster (inter-cluster
    # scores are far apart).  vec_id // 30 is the generating cluster.
    e = _clustered_embeddings(spark)
    q = e.where(F.col("vec_id") % 40 == 0)
    out = pq_topk(e, q, k=5, m=4, n_codes=16).collect()
    assert len(out) == len({r["query_id"] for r in out}) * 5
    for r in out:
        assert r["neighbor_id"] // 30 == r["query_id"] // 30, (
            r["query_id"], r["neighbor_id"])


def test_pq_encode_shape_and_range(spark):
    from turtle_spark.operators.similarity import pq_encode, train_pq_codebooks

    e = _clustered_embeddings(spark)
    books = train_pq_codebooks(e, m=4, n_codes=8)
    assert books.shape == (4, 8, 4)
    codes = pq_encode(e, books).select("codes").collect()
    assert all(len(r["codes"]) == 4 for r in codes)
    assert all(0 <= c < 8 for r in codes for c in r["codes"])


def test_pq_topk_partition_invariance(spark):
    from turtle_spark.operators.similarity import pq_topk

    e = _clustered_embeddings(spark)
    q = e.where(F.col("vec_id") % 40 == 0)
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in rows
    )
    one = key(pq_topk(e.coalesce(1), q, k=5, m=4, n_codes=16).collect())
    many = key(pq_topk(e.repartition(8), q, k=5, m=4, n_codes=16).collect())
    assert one == many


def test_pq_rejects_indivisible_dim(spark):
    from turtle_spark.operators.similarity import train_pq_codebooks

    e = _clustered_embeddings(spark, dim=10)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(e, m=4, n_codes=8)


def test_sq_topk_tracks_exact_cosine(spark):
    from turtle_spark.operators.similarity import sq_topk

    e = _clustered_embeddings(spark)
    q = e.where(F.col("vec_id") % 40 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in sq_topk(e, q, k=5).collect()
    }
    # int8 quantization preserves ordering far better than PQ —
    # near-full agreement with brute force on clustered data
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_sq_topk_partition_invariance(spark):
    from turtle_spark.operators.similarity import sq_topk

    e = _clustered_embeddings(spark)
    q = e.where(F.col("vec_id") % 40 == 0)
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in rows
    )
    assert key(sq_topk(e.coalesce(1), q, k=5).collect()) == key(
        sq_topk(e.repartition(8), q, k=5).collect()
    )
