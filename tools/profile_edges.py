"""Profile the pipeline `edges` stage substages at a given core count.

Reproduces the pipeline's exact input shape: terms read back from a
checkpoint parquet (like StageManifest does), then times each link
substage separately:

  band_keys   - lsh_band_keys UDF + posexplode (Python compute)
  cand_pairs  - window cap + groupBy + in-array expand + dedup + degree cap
  profiles    - shingle_profiles UDF (Python compute)
  verify      - the two id-joins + jaccard filter

Usage: python tools/profile_edges.py <cores> [n_docs]
"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 96000
    from turtle_spark.session import get_spark
    from turtle_spark.operators import linking
    from turtle_spark.operators.extract import extract_triples, media_triples
    from turtle_spark.operators.canonicalize import globalize_blank_nodes

    spark = get_spark(app_name=f"profile-edges-{cores}", cores=cores)
    corpus = f"/tmp/turtle_spark_bench/corpus_{n_docs}_42"
    docs = spark.read.parquet(corpus).repartition(cores * 4).persist()
    docs.count()

    wd = f"/tmp/turtle_spark_bench/profile_terms_{n_docs}"
    terms_path = f"{wd}/terms.parquet"
    import os

    if not os.path.exists(os.path.join(terms_path, "_SUCCESS")):
        triples = globalize_blank_nodes(
            extract_triples(docs).unionByName(media_triples(docs))
        )
        linking.distinct_terms(linking.extract_mentions(triples)).write.mode(
            "overwrite"
        ).parquet(terms_path)

    terms = spark.read.parquet(terms_path)
    n_terms = terms.count()
    print(f"cores={cores} n_docs={n_docs} n_terms={n_terms}")

    def timed(name, df):
        t0 = time.time()
        n = df.count()
        dt = time.time() - t0
        print(f"  {name:<12} {dt:8.2f}s  rows={n}")
        return dt

    # stage 1: band keys (fused UDF)
    buckets = linking.lsh_band_keys(terms)
    timed("band_keys", buckets)

    # stage 2: candidate pairs (uses pipeline knobs)
    pairs = linking.candidate_pairs(
        buckets, src_degree_cap=8, neighbor_window=8, salt_cap_order=True
    )
    timed("cand_pairs", pairs)

    # stage 3: shingle profiles
    profiles = linking.shingle_profiles(terms)
    timed("profiles", profiles)

    # stage 4: full verify (includes pairs+profiles recompute; measures
    # the join/filter tail on top)
    edges = linking.verify_pairs(pairs, terms)
    timed("verify_full", edges)

    # whole stage as the pipeline runs it
    t0 = time.time()
    n = linking.link_terms(
        terms,
        src_degree_cap=8,
        neighbor_window=8,
        salt_cap_order=True,
    ).count()
    print(f"  {'whole_stage':<12} {time.time() - t0:8.2f}s  rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
